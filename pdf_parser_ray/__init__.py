"""pdf_parser_ray — a Ray-Data-native main-content extraction engine.

Brand-new implementation (not a port) with the query/data-processing
capabilities of the reference PDF layout parser (karanvora2599/PDF_Parser,
surveyed in SURVEY.md).  Everything is expressed over ``ray.data.Dataset``
pipelines: zero-copy Arrow batches through stateless ``map_batches`` tasks
and actor pools for the warm-state layout parse stage.

Layout:
    functions/   pure per-page / per-document kernels (no Ray imports)
    stages/      Ray map_batches callables (tasks + actor classes)
    sources/     synthetic corpus generation + read helpers
    pipelines/   end-to-end Dataset assemblies
    state/       checkpoint manifests / resume logic
"""

__version__ = "0.1.0"
