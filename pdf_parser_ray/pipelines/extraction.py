"""End-to-end extraction pipeline assembly.

    read_parquet(shards, columns=["url", "html"])       # prune at the read
      -> map_batches(route_and_explode)                 # stateless tasks
      -> map_batches(ParseDocuments, concurrency=N)     # actor pool
      -> [assembly of exploded giant docs]              # only in explode mode
      -> write_parquet / downstream

Two modes:

* ``explode_threshold=None`` (default, pure map): no shuffle anywhere;
  every document parses inside its task. Streaming, measured 0.85 scaling
  efficiency 8->32 CPUs. Right whenever no document exceeds the straggler
  threshold (~1000 pages / ~4 MB: a 2 s task among 0.7 s tasks).
* ``explode_threshold=<bytes>`` (the skew path): documents above the
  threshold are split to per-page rows before parsing and reassembled by
  ``groupby("url")`` over ONLY the exploded chunk rows. The parsed dataset
  (extracted text — the html payload never leaves the route stage) is
  pinned with a single ``materialize()`` barrier, then branched: final
  rows stream straight to the sink, chunk rows — giant docs only — are
  repartitioned and take the groupby. Measured 5x faster than shuffling
  every row through the groupby, because the shuffle volume is bounded by
  giant-doc text, not corpus text; the price is the materialize barrier
  (~+60% on a giant-free corpus), which is why it is opt-in.

Scale notes (100 TB / 256 nodes): the parse stage is an actor pool sized by
``concurrency``; blocks stream with backpressure; nothing materialises the
raw corpus. The groupby key ``url`` is unique per document -> high
cardinality, no hot keys.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from pdf_parser_ray.runtime import cluster_cpus, ensure_data_context
from pdf_parser_ray.stages.extract import (
    OUTPUT_COLUMNS,
    ParseDocuments,
    assemble_group,
    make_router,
)

# Defaults tuned on the 32-CPU sandbox; see BENCH notes in BASELINE.md.
DEFAULT_PARSE_BATCH = 64
# Default: explode OFF. Straggler math: a task's batch is ~64 docs x ~11 ms
# = ~0.7 s; a document only becomes a straggler well past ~1000 pages
# (~4 MB bundle, ~2 s). Corpora with such documents should enable the
# explode path with this threshold; below it, the explode machinery's
# materialize barrier costs more than the skew it removes (measured:
# +12 s on a 40k-doc corpus at 32 CPUs with zero giant docs).
DEFAULT_EXPLODE_THRESHOLD = None
RECOMMENDED_EXPLODE_THRESHOLD = 4 * 1024 * 1024


def read_pages(paths, columns=("url", "html")) -> ray.data.Dataset:
    """Input reader: only the columns the pipeline needs leave storage."""
    return ray.data.read_parquet(list(paths) if isinstance(paths, (list, tuple)) else paths,
                                 columns=list(columns))


def extract_dataset(
    ds: ray.data.Dataset,
    *,
    explode_threshold: int | None = None,
    want_markdown: bool = True,
    want_json: bool = False,
    start_page: int = 1,
    end_page: int | None = None,
    json_coordinates: bool = False,
    want_structured: bool = False,
    parse_mode: str = "tasks",
    parse_concurrency=None,
    parse_batch_size: int = DEFAULT_PARSE_BATCH,
    detect_lang: bool = False,
    quality_signals: bool = False,
) -> ray.data.Dataset:
    """Wire the extraction stages onto ``ds`` (columns: url, html).

    ``parse_mode``:
    * "tasks" (default): the parse callable runs in Ray's reusable task
      workers. This engine's warm parser state (compiled regexes, config)
      lives at module scope, so reused task workers already hold it — and
      measured fresh-session runs are ~2.5x faster because no actor pool
      has to cold-start (30 actors x Python import cost).
    * "actors": fixed actor pool holding the parser state per actor
      (``ParseDocuments.__init__``). The right mode when the stage carries
      genuinely heavy state (ML models, external parser handles — the
      reference's pdfplumber handle cache, detector.py:77,165-181); on
      multi-hour production runs the startup cost amortizes to zero.

    Returns a streaming Dataset with columns
    (url, text, markdown, json, n_pages, n_blocks, n_tables, error).
    """
    ensure_data_context()
    if parse_mode not in ("tasks", "actors"):
        from pdf_parser_ray.functions.errors import ConfigurationError

        raise ConfigurationError(
            f"parse_mode must be 'tasks' or 'actors', got {parse_mode!r}",
            parameter="parse_mode")
    if start_page != 1 or end_page is not None:
        # a page-range gate implies whole-document handling (the range is
        # relative to each document; slicing exploded chunks would need the
        # route stage to re-number) — force the pure-map path
        explode_threshold = None
    routed = ds.map_batches(
        make_router(explode_threshold),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    ctor_kwargs = {
        "want_markdown": want_markdown,
        "want_json": want_json,
        "start_page": start_page,
        "end_page": end_page,
        "json_coordinates": json_coordinates,
        "want_structured": want_structured,
    }
    parse_kwargs = dict(
        batch_format="pyarrow",
        batch_size=parse_batch_size,
        zero_copy_batch=True,
    )
    if parse_mode == "actors":
        parsed = routed.map_batches(
            ParseDocuments,
            fn_constructor_kwargs=ctor_kwargs,
            # fixed-size actor pool: the parse stage dominates compute, so
            # claim the cores upfront instead of waiting on autoscaler
            # ramp-up — but leave two cores for the read/route tasks
            # feeding the pool, or the pipeline starves itself
            concurrency=parse_concurrency if parse_concurrency is not None
            else max(2, cluster_cpus() - 2),
            num_cpus=1,
            **parse_kwargs,
        )
    else:
        worker = ParseDocuments(**ctor_kwargs)
        parsed = routed.map_batches(worker, **parse_kwargs)

    def finish(out: ray.data.Dataset) -> ray.data.Dataset:
        if not (detect_lang or quality_signals):
            return out
        # crawl-pipeline annotations at extraction time: ONE extra
        # vectorized pass over the EXTRACTED text appends the opt-in
        # columns (pred_lang via the n-gram cascade; n_tokens /
        # alpha_ratio / stop_ratio via the quality kernel) — streaming,
        # shuffle-free; the default output schema is unchanged
        from pdf_parser_ray.stages.text import (
            lang_pred_array, quality_signal_columns)

        def annotate(batch: pa.Table) -> pa.Table:
            col = batch.column("text")
            if detect_lang:
                batch = batch.append_column("pred_lang",
                                            lang_pred_array(col))
            if quality_signals:
                for name, arr in quality_signal_columns(col):
                    batch = batch.append_column(name, arr)
            return batch

        return out.map_batches(annotate, batch_format="pyarrow",
                               zero_copy_batch=True)

    if explode_threshold is None:
        return finish(parsed.select_columns(OUTPUT_COLUMNS))

    # explode mode: pin the parsed rows once, then branch — finals stream
    # through untouched, only giant-doc page chunks pay the groupby.
    parsed = parsed.materialize()

    def only(flag: bool):
        def fn(batch: pa.Table) -> pa.Table:
            return batch.filter(pc.equal(batch.column("final"),
                                         pa.scalar(flag)))
        return fn

    finals = parsed.map_batches(only(True), batch_format="pyarrow",
                                zero_copy_batch=True).select_columns(OUTPUT_COLUMNS)
    # explicit repartition: the chunk stream inherits one near-empty block
    # per parse task; compacting before the groupby halves assembly time
    chunks = parsed.map_batches(only(False), batch_format="pyarrow",
                                zero_copy_batch=True).repartition(cluster_cpus())
    # url is corpus-cardinality: exchange on a hashed partition id and
    # replay per-url assembly inside each partition instead of paying a
    # key-sorted shuffle (relational.salted_map_groups; byte-equality vs
    # the sequential oracle is pinned by the explode parity tests)
    from pdf_parser_ray.pipelines.relational import salted_map_groups

    assembled = salted_map_groups(chunks, ["url"], assemble_group,
                                  "pyarrow")
    return finish(finals.union(assembled))


def extract_paths(paths, *, pdf_column: str | None = None,
                  password: str | None = None, **kwargs) -> ray.data.Dataset:
    """``pdf_column``: treat that column as raw PDF bytes and decode it
    through the PyMuPDF seam (sources/pdfbytes.py) into the native bundle
    payload before extraction; ``password`` unlocks encrypted PDFs
    (reference core/document.py:104-119). Without it, the column layout
    is the native (url, html) bundle corpus.

    Source sniffing: paths ending in ``.warc`` / ``.warc.gz`` read
    through the native WARC parser (sources/warc.py — Common Crawl's
    container) instead of parquet; the downstream stages are identical,
    so CLI parse + checkpoint/resume work unchanged on WARC shards."""
    from pdf_parser_ray.sources.warc import is_warc_path, read_warc

    plist = list(paths) if isinstance(paths, (list, tuple)) else [paths]
    if any(is_warc_path(p) for p in plist):
        from pdf_parser_ray.functions.errors import ConfigurationError

        if not all(is_warc_path(p) for p in plist):
            raise ConfigurationError(
                "cannot mix WARC and parquet shards in one run",
                parameter="paths")
        if pdf_column is not None or password is not None:
            # silently dropping the PyMuPDF-decode request would produce
            # wrong output from a flag combination that cannot apply to
            # WARC records (review catch) — reject loudly instead
            raise ConfigurationError(
                "--pdf-column/--password do not apply to WARC input "
                "(records carry the payload directly)",
                parameter="pdf_column")
        return extract_dataset(
            read_warc(plist).select_columns(["url", "html"]), **kwargs)
    if pdf_column is None:
        return extract_dataset(read_pages(paths), **kwargs)
    from pdf_parser_ray.sources.pdfbytes import PdfToBundle

    raw = read_pages(paths, columns=("url", pdf_column))
    bundles = raw.map_batches(
        PdfToBundle,
        fn_constructor_kwargs={"password": password, "pdf_column": pdf_column},
        batch_format="pyarrow",
        batch_size=16,  # raw PDFs are large binaries: keep batches small
        concurrency=2,
    )
    return extract_dataset(bundles, **kwargs)
