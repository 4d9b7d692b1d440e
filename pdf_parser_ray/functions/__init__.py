"""Pure computational kernels. No Ray imports here: every function in this
package is deterministic, picklable, and safe to call from any worker."""
