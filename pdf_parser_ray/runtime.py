"""Ray Data runtime configuration shared by all pipelines.

Called at pipeline-build time (never at import, never ray.init) so the
driver owns the Ray session while the engine owns execution tuning.
"""

from __future__ import annotations

import ray


def ensure_data_context() -> None:
    """Engine-wide execution tuning.

    * progress bars off: keeps driver output clean for bench/driver runs.

    Note on shuffle strategy: Ray 2.49's HASH_SHUFFLE was evaluated for the
    groupby consolidations (they are pure hash-partition merges; the sort
    order the default strategy computes is never read — within-group order
    is always re-established by explicit page_number/ts sorts inside the
    group fn). It was reverted: with it active, groupby().map_groups
    produced wrong results for the sessionization pipeline and deadlocked
    small clusters (aggregator actors starving a fixed actor pool). The
    default sort-based shuffle is correct and its extra cost is bounded by
    extracted-text volume, not crawl bytes.
    """
    from ray.data.context import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False


def cluster_cpus(default: int = 8) -> int:
    try:
        if ray.is_initialized():
            return int(ray.cluster_resources().get("CPU", default))
    except Exception:
        pass
    return default
