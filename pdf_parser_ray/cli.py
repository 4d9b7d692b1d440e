"""Command-line interface.

Corpus-level analogs of the reference CLI (cli.py:44-313 — parse / info /
analyze), re-expressed for a Parquet corpus instead of a single PDF file:

    python -m pdf_parser_ray parse   INPUT... -o OUT_DIR [--format ...]
    python -m pdf_parser_ray info    INPUT...
    python -m pdf_parser_ray analyze INPUT... --url URL [--page N]
    python -m pdf_parser_ray synth   N -o OUT_DIR [--seed S]

``parse`` also accepts raw PDF files directly (the reference cli.py:44-169
single-file journey): ``parse docs/*.pdf -o OUT [--password PW]`` stages
the files into (url, pdf) parquet shards under OUT/_staged_pdfs, then runs
the standard checkpointed pipeline through the PyMuPDF seam
(sources/pdfbytes.py) — extension/existence validation and password
decryption included.

The CLI owns its Ray session (guarded init); library code never calls
ray.init.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _init_ray(num_cpus: int | None, verbose: bool = False):
    import ray

    if not ray.is_initialized():
        kwargs = dict(address="local", include_dashboard=False,
                      ignore_reinit_error=True,
                      logging_level="INFO" if verbose else "ERROR")
        if num_cpus:
            kwargs["num_cpus"] = num_cpus
        ray.init(**kwargs)


def _stage_pdfs(pdf_paths: list[str], out_dir: str,
                per_shard: int) -> list[str]:
    """Stage raw PDF files into (url, pdf) parquet shards under
    ``out_dir/_staged_pdfs`` — the front door for ``parse *.pdf``
    (reference cli.py:44-169 ergonomics: extension + existence validated
    up front). Deterministic shard names plus a manifest keyed on the
    input list make re-runs resumable: an unchanged input reuses the
    staging and run_checkpointed skips finished parts. File reads are
    driver-side, bounded by the shell argv (a corpus-scale job feeds
    parquet shards instead)."""
    import hashlib
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as pq

    paths = [os.path.abspath(p) for p in pdf_paths]
    for p in paths:
        if not p.lower().endswith(".pdf"):
            raise SystemExit(f"not a .pdf file: {p}")
        if not os.path.isfile(p):
            raise SystemExit(f"no such file: {p}")
    staged_dir = os.path.join(out_dir, "_staged_pdfs")
    key = hashlib.md5(
        ("\n".join(paths) + f"|{per_shard}").encode()).hexdigest()
    manifest = os.path.join(staged_dir, "_STAGED_OK")
    n_shards = (len(paths) + per_shard - 1) // per_shard
    shards = [os.path.join(staged_dir, f"pdfs-{i:05d}.parquet")
              for i in range(n_shards)]
    if (os.path.isfile(manifest)
            and open(manifest).read().strip() == key
            and all(os.path.isfile(s) for s in shards)):
        return shards
    shutil.rmtree(staged_dir, ignore_errors=True)
    os.makedirs(staged_dir)
    for i, shard in enumerate(shards):
        group = paths[i * per_shard:(i + 1) * per_shard]
        blobs = []
        for p in group:
            with open(p, "rb") as f:
                blobs.append(f.read())
        pq.write_table(
            pa.table({"url": pa.array(group, pa.string()),
                      "pdf": pa.array(blobs, pa.large_binary())}),
            shard)
    with open(manifest, "w") as f:
        f.write(key)
    return shards


def cmd_parse(args) -> int:
    """Run the extraction pipeline over parquet shards, checkpointed."""
    from pdf_parser_ray.state.checkpoint import run_checkpointed

    _init_ray(args.num_cpus, getattr(args, 'verbose', False))
    pipeline_kwargs = {
        "want_markdown": args.format in ("markdown", "all"),
        "want_json": args.format in ("json", "all"),
        "explode_threshold": args.explode_threshold,
        "parse_mode": args.parse_mode,
        "start_page": args.start_page,
        "end_page": args.end_page,
        "json_coordinates": args.coordinates,
        "detect_lang": args.detect_lang,
        "quality_signals": args.quality_signals,
    }
    pdfs = [p for p in args.input if p.lower().endswith(".pdf")]
    inputs = args.input
    if pdfs:
        if len(pdfs) != len(args.input):
            print("cannot mix raw .pdf files and parquet shards in one "
                  "parse invocation", file=sys.stderr)
            return 1
        inputs = _stage_pdfs(pdfs, args.output, args.pdfs_per_shard)
        pipeline_kwargs["pdf_column"] = "pdf"
        pipeline_kwargs["password"] = args.password
    elif args.pdf_column:
        pipeline_kwargs["pdf_column"] = args.pdf_column
        pipeline_kwargs["password"] = args.password
    summary = run_checkpointed(
        inputs, args.output,
        files_per_part=args.files_per_part,
        pipeline_kwargs=pipeline_kwargs,
    )
    print(json.dumps(summary))
    return 0


def cmd_info(args) -> int:
    """Corpus facts: row count, schema, kind mix, payload sizes."""
    import pyarrow.compute as pc
    import ray.data

    _init_ray(args.num_cpus, getattr(args, 'verbose', False))
    ds = ray.data.read_parquet(args.input)
    n = ds.count()
    schema = ds.schema()

    def facts(batch):
        import pyarrow as pa

        sizes = pc.binary_length(batch.column("html"))
        html_rows = pc.sum(
            pc.cast(pc.match_substring_regex(batch.column("url"), r"\.html$"),
                    pa.int64())).as_py() or 0
        return pa.table({
            "rows": pa.array([batch.num_rows], pa.int64()),
            "html_rows": pa.array([html_rows], pa.int64()),
            "bytes": pa.array([pc.sum(sizes).as_py() or 0], pa.int64()),
            "max_bytes": pa.array([pc.max(sizes).as_py() or 0], pa.int64()),
        })

    agg = ds.map_batches(facts, batch_format="pyarrow", zero_copy_batch=True)
    totals = {"rows": 0, "html_rows": 0, "bytes": 0, "max_bytes": 0}
    for b in agg.iter_batches(batch_format="pyarrow"):
        totals["rows"] += sum(b.column("rows").to_pylist())
        totals["html_rows"] += sum(b.column("html_rows").to_pylist())
        totals["bytes"] += sum(b.column("bytes").to_pylist())
        totals["max_bytes"] = max(totals["max_bytes"],
                                  max(b.column("max_bytes").to_pylist()))
    print(f"documents: {n}")
    print(f"schema:    {', '.join(f'{f}:{schema.types[i]}' for i, f in enumerate(schema.names))}")
    print(f"html rows: {totals['html_rows']} "
          f"(pdf rows: {totals['rows'] - totals['html_rows']})")
    print(f"payload:   {totals['bytes'] / 1e6:.1f} MB total, "
          f"largest {totals['max_bytes'] / 1e3:.1f} KB")
    return 0


def cmd_analyze(args) -> int:
    """Verbose layout dump for ONE document (reference cli.py:222-313)."""
    import ray.data

    from pdf_parser_ray.functions import layout
    from pdf_parser_ray.functions.document import doc_kind, extract_document

    _init_ray(args.num_cpus, getattr(args, 'verbose', False))
    payload_col = args.pdf_column or "html"
    from pdf_parser_ray.sources.warc import is_warc_path, read_warc

    if all(is_warc_path(p) for p in args.input):
        ds = read_warc(args.input)  # analyze works on WARC shards too
    else:
        ds = ray.data.read_parquet(args.input,
                                   columns=["url", payload_col])
    rows = ds.filter(expr=f"url == '{args.url}'").take(1)
    if not rows:
        print(f"url not found: {args.url}", file=sys.stderr)
        return 1
    url, payload = rows[0]["url"], rows[0][payload_col]
    if args.pdf_column:
        # raw PDF bytes -> native bundle via the PyMuPDF seam (reference
        # cli.py analyze --password analog)
        from pdf_parser_ray.sources.pdfbytes import pdf_bytes_to_bundle

        bundle = pdf_bytes_to_bundle(payload, password=args.password,
                                     filename=url)
        payload = json.dumps(bundle).encode("utf-8")

    if doc_kind(url) == "html":
        out = extract_document(url, payload)
        print(f"{url}: html document, {out['n_blocks']} kept blocks")
        print(out["text"][: args.max_chars])
        return 0

    bundle = layout.load_bundle(payload)
    start = end = args.page if args.page else None
    pages, meta = (layout.parse_bundle(bundle, start_page=start, end_page=end)
                   if start else layout.parse_bundle(bundle))
    print(f"{url}: {len(bundle['pages'])} pages, metadata={meta}")
    for page in pages:
        print(f"\n--- page {page['page_number']} "
              f"({page['width']:.0f}x{page['height']:.0f}) ---")
        print(f"columns: {len(page['columns'])}  blocks: {len(page['blocks'])}"
              f"  tables: {len(page['tables'])}")
        if page["header"]:
            print(f"header: {page['header']!r}")
        if page["footer"]:
            print(f"footer: {page['footer']!r}")
        for b in page["blocks"][: args.max_blocks]:
            preview = b["text"][:70].replace("\n", "\\n")
            print(f"  [{b['type']:<9} col {b['column_index']}] {preview}")
    return 0


def cmd_query(args) -> int:
    """Run one registered pipeline from the query suite over a testdata
    directory; print (small results) or write parquet."""
    import importlib.util

    _init_ray(args.num_cpus, getattr(args, 'verbose', False))
    spec = importlib.util.spec_from_file_location(
        "__ray_entry__", os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "__ray_entry__.py"))
    entrymod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(entrymod)
    queries = entrymod.queries()
    if args.name not in queries:
        print(f"unknown query {args.name!r}; available: "
              f"{', '.join(sorted(queries))}", file=sys.stderr)
        return 1
    import pandas as pd

    result = queries[args.name](args.sf_dir)
    df = result if isinstance(result, pd.DataFrame) else result.to_pandas()
    if args.output:
        import pyarrow as pa
        import pyarrow.parquet as pq

        pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                       args.output)
        print(f"wrote {len(df)} rows to {args.output}")
    else:
        with_rows = df if len(df) <= args.max_rows else df.head(args.max_rows)
        print(with_rows.to_string(index=False))
        if len(df) > args.max_rows:
            print(f"... ({len(df)} rows total; -o FILE for all)")
    return 0


def cmd_profile(args) -> int:
    """Profile ANY parquet table: per column — row/null counts, exact
    distinct count (text/binary via md5 fingerprints, so payloads never
    shuffle) and canonical min/max. The generic front door to the
    oracled profile_dataset plan (queries.py)."""
    import ray.data

    from pdf_parser_ray.pipelines.queries import (
        profile_dataset,
        profile_spec_for_schema,
    )

    _init_ray(args.num_cpus, getattr(args, 'verbose', False))
    ds = ray.data.read_parquet(args.input)
    spec = profile_spec_for_schema(ds.schema().base_schema
                                   if hasattr(ds.schema(), "base_schema")
                                   else ds.schema())
    if not spec:
        print("no profilable columns (nested-only schema?)",
              file=sys.stderr)
        return 1
    df = profile_dataset(ds, spec)
    for c in ("min_s", "max_s"):  # display-only: long text values
        df[c] = df[c].map(lambda v: v if v is None or len(v) <= 48
                          else v[:45] + "...")
    print(df.to_string(index=False))
    return 0


def cmd_synth(args) -> int:
    """Generate a synthetic pages corpus (FIXTURES.md §1) to parquet, or
    — with ``--format warc`` — to per-shard WARC.gz files (the Common
    Crawl container; ``parse shards/*.warc.gz`` reads them natively)."""
    from pdf_parser_ray.sources.pages import synth_dataset

    _init_ray(args.num_cpus, getattr(args, 'verbose', False))
    if getattr(args, "format", "parquet") == "warc":
        import os

        from pdf_parser_ray.sources.warc import warc_write_bytes

        os.makedirs(args.output, exist_ok=True)
        shard_rows = max(1, -(-args.n_docs // max(1, args.warc_shards)))
        n_shards = 0
        # stream shard-sized Arrow batches off the Dataset — never the
        # whole corpus on the driver (review catch: the draft's
        # to_pandas + iterrows materialized every page)
        for batch in synth_dataset(args.n_docs, seed=args.seed) \
                .iter_batches(batch_size=shard_rows,
                              batch_format="pyarrow"):
            pages = zip(batch.column("url").to_pylist(),
                        batch.column("warc_ts").to_pylist(),
                        batch.column("html").to_pylist())
            path = os.path.join(args.output,
                                f"shard-{n_shards:05d}.warc.gz")
            with open(path, "wb") as f:
                f.write(warc_write_bytes(pages))
            n_shards += 1
        print(f"wrote {args.n_docs} docs to {n_shards} WARC shards "
              f"in {args.output}")
        return 0
    synth_dataset(args.n_docs, seed=args.seed).write_parquet(args.output)
    print(f"wrote {args.n_docs} docs to {args.output}")
    return 0


def _id_prep(schema, id_col: str):
    """Whether the id column needs the md5-derived int63 mapping."""
    import pyarrow as pa

    t = schema.base_schema.field(id_col).type \
        if hasattr(schema, "base_schema") else schema.field(id_col).type
    return not pa.types.is_integer(t)


def _ids_int64(ids, derived: bool):
    """Raw id column -> int64 ids (md5-derived int63 for non-integer
    keys, e.g. url — deterministic, collision odds ~n^2/2^63)."""
    import pyarrow as pa

    if derived:
        from pdf_parser_ray.functions.sketches import _md5_64
        return pa.array([_md5_64(str(v)) & ((1 << 63) - 1)
                         for v in ids.to_pylist()], pa.int64())
    return ids.cast(pa.int64())


def _work_dataset(ds, id_col: str, text_col: str, derived: bool):
    """(any table) -> (doc_id:int64, text) work Dataset."""
    import pyarrow as pa

    def to_work(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        # null text -> "" so the fingerprint/shingle/simhash kernels
        # never see None (an empty doc can only exact-dup other empties)
        return pa.table({"doc_id": _ids_int64(batch.column(id_col), derived),
                         "text": pc.fill_null(
                             pc.cast(batch.column(text_col), "string"), "")})

    return ds.map_batches(to_work, batch_format="pyarrow",
                          zero_copy_batch=True)


def _distinct_id_count(work) -> int:
    """Exact distinct doc_id count (one id-keyed exchange) — the
    duplicate-id guard for dedup/clean: with repeated ids the min-id
    keep rule silently keeps or drops BOTH carriers of an id."""
    from pdf_parser_ray.pipelines import relational as rel

    return rel.salted_agg(work.select_columns(["doc_id"]), ["doc_id"],
                          [("doc_id", "count_all", "c")]).count()


def cmd_urldedup(args) -> int:
    """Canonical-URL dedup over ANY parquet corpus with a URL column —
    the crawl-hygiene pass that runs BEFORE content dedup (RFC 3986
    normalization + tracking-param strip; keeper = lexicographically
    smallest raw spelling). Writes the kept rows as parquet and prints a
    one-line JSON report."""
    import json as _json

    import ray.data

    from pdf_parser_ray.sources.warc import is_warc_path, read_warc
    from pdf_parser_ray.stages.dedup import url_dedup

    _init_ray(args.num_cpus, getattr(args, 'verbose', False))
    if all(is_warc_path(p) for p in args.input):
        ds = read_warc(args.input)  # warc -> urldedup -> parquet funnel
    else:
        ds = ray.data.read_parquet(args.input)
    n_in = ds.count()
    kept = url_dedup(ds, url_col=args.url_column)
    kept.write_parquet(args.output)
    n_out = ray.data.read_parquet(args.output).count()
    print(_json.dumps({"rows_in": n_in, "rows_out": n_out,
                       "removed": n_in - n_out,
                       "url_column": args.url_column}))
    return 0


def cmd_dedup(args) -> int:
    """Dedup ANY parquet corpus from the command line — the training-data
    front door to the dedup family. --mode exact keeps one row per
    distinct text (md5 fingerprint; min-id representative); the near-dup
    modes each run a different blocking strategy into the SAME
    connected-components keep rule: --mode near = MinHash-LSH ->
    exact-Jaccard-verify (>= --threshold), --mode ngram = sketch-free
    exact inverted-index Jaccard (>= --threshold), --mode simhash =
    64-bit SimHash hamming <= 3 (chunk banding, exact by pigeonhole). Writes the kept rows as parquet and prints a
    one-line JSON report. Scale discipline matches the library: text
    never shuffles (only (fingerprint, id) rows exchange), and the
    removed-id set — bounded by dup volume, not corpus size — broadcasts
    back as an anti-join filter over a second streaming pass. Non-int64
    id columns (e.g. url) get a deterministic md5-derived int63 id
    (reported as derived_ids). Repeated id values break the min-id keep
    rule (both carriers kept, or both dropped), so the report carries an
    id_unique flag and a stderr warning."""
    import json as _json

    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data

    from pdf_parser_ray.pipelines import relational as rel
    from pdf_parser_ray.stages import dedup as dstage
    from pdf_parser_ray.stages.text import fingerprint_batch

    _init_ray(args.num_cpus, getattr(args, 'verbose', False))
    ds = ray.data.read_parquet(args.input)
    names = list(ds.schema().names)
    if args.text_col not in names or args.id_col not in names:
        print(f"need columns {args.id_col!r} and {args.text_col!r}; "
              f"table has {names}", file=sys.stderr)
        return 1
    derived = _id_prep(ds.schema(), args.id_col)
    work = _work_dataset(ds, args.id_col, args.text_col, derived)
    n_in = ds.count()
    id_unique = _distinct_id_count(work) == n_in if n_in else True
    if not id_unique:
        print(f"warning: {args.id_col!r} has repeated values — the "
              "min-id keep rule is per-id, so rows sharing an id are "
              "kept or removed TOGETHER", file=sys.stderr)

    def removed_from_pairs(pairs) -> list[int]:
        """(doc_a, doc_b) near-dup pairs -> non-representative ids via
        the shared connected-components loop (min-id representative)."""

        def both_dirs(b: pa.Table) -> pa.Table:
            fwd = pa.table({"u": b.column("doc_a"), "v": b.column("doc_b")})
            rev = pa.table({"u": b.column("doc_b"), "v": b.column("doc_a")})
            return pa.concat_tables([fwd, rev]).combine_chunks()

        if pairs.count() == 0:
            return []
        edges = pairs.map_batches(both_dirs, batch_format="pyarrow")
        labels = rel.cc_min_labels(edges).to_pandas()
        return sorted(labels.loc[labels["doc_id"] != labels["label"],
                                 "doc_id"].tolist())

    if args.mode == "exact":
        fps = work.map_batches(fingerprint_batch, batch_format="pyarrow",
                               zero_copy_batch=True)

        def non_min(g):
            keep = g["doc_id"] != g["doc_id"].min()
            return g.loc[keep, ["doc_id"]]

        removed_df = rel.salted_map_groups(fps, ["fp"], non_min).to_pandas()
        removed = (sorted(set(removed_df["doc_id"].tolist()))
                   if "doc_id" in removed_df.columns else [])
    elif args.mode == "near":
        removed = removed_from_pairs(dstage.minhash_verified_pairs(
            work, threshold=args.threshold).materialize())
    elif args.mode == "ngram":
        # sketch-free exact n-gram Jaccard (inverted-index self-join)
        removed = removed_from_pairs(dstage.ngram_jaccard_pairs(
            work, threshold=args.threshold).materialize())
    else:  # simhash: hamming <= --max-hamming over 64-bit signatures
        if args.threshold != 0.8:
            print("warning: --threshold is a Jaccard bound (near/ngram "
                  "modes); simhash uses --max-hamming", file=sys.stderr)
        removed = removed_from_pairs(dstage.simhash_pairs(
            work, max_hamming=args.max_hamming).materialize())

    rref = ray.put(pa.array(removed, pa.int64()))

    def keep(batch: pa.Table) -> pa.Table:
        ids = _ids_int64(batch.column(args.id_col), derived)
        return batch.filter(
            pc.invert(pc.is_in(ids, value_set=ray.get(rref))))

    kept = ds.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)
    kept.write_parquet(args.output)
    n_out = ray.data.read_parquet(args.output).count()
    print(_json.dumps({"mode": args.mode, "rows_in": n_in,
                       "removed": len(removed), "rows_out": n_out,
                       "threshold": (args.threshold
                                     if args.mode in ("near", "ngram")
                                     else None),
                       "derived_ids": derived, "id_unique": id_unique}))
    return 0


def cmd_clean(args) -> int:
    """Run the composed LLM-corpus cleaning chain over ANY parquet
    corpus and WRITE the cleaned text: exact dedup (md5, min-id winner)
    -> C4-style quality gate (token count / alpha ratio / stopword
    ratio) -> PII redaction (email/IPv4/account) -> ExactSubstr
    duplicated-span surgery. The CLI twin of the oracled
    ``docs_clean_corpus`` flagship (queries.py), running the IDENTICAL
    shared gate kernel (make_gate_redact); the flagship emits
    fingerprints, here the survivors' cleaned text lands in parquet
    with per-stage funnel counts in a one-line JSON report. The
    dedup-join result materializes ONCE (the funnel counters and the
    downstream stages all read the materialized snapshot — no repeated
    corpus scans)."""
    import json as _json

    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    import ray.data

    from pdf_parser_ray.pipelines import queries as qmod
    from pdf_parser_ray.pipelines import relational as rel
    from pdf_parser_ray.stages import dedup as dstage

    _init_ray(args.num_cpus, getattr(args, 'verbose', False))
    ds = ray.data.read_parquet(args.input)
    names = list(ds.schema().names)
    if args.text_col not in names or args.id_col not in names:
        print(f"need columns {args.id_col!r} and {args.text_col!r}; "
              f"table has {names}", file=sys.stderr)
        return 1
    derived = _id_prep(ds.schema(), args.id_col)
    work = _work_dataset(ds, args.id_col, args.text_col, derived)
    n_in = work.count()

    winners = rel.ensure_schema(
        dstage.exact_dedup(work).select_columns(["doc_id"]),
        pa.schema([("doc_id", pa.int64())]))
    n_parts = rel.join_partitions(max(n_in, 1))
    base = work.join(winners, "inner", n_parts, on=("doc_id",)).materialize()
    n_dedup = base.count()

    survivors = base.map_batches(
        qmod.make_gate_redact(args.min_tokens, 0.5, 0.02),
        batch_format="pyarrow", zero_copy_batch=True).materialize()
    n_gate = survivors.count()

    out_schema = pa.schema([("doc_id", pa.int64()),
                            ("text_clean", pa.string()),
                            ("n_cut", pa.int64())])
    if n_gate == 0:
        # nothing survived: write a typed empty shard (an empty Ray
        # Dataset has no schema to write) and report the funnel
        os.makedirs(args.output, exist_ok=True)
        pq.write_table(out_schema.empty_table(),
                       os.path.join(args.output, "part-empty.parquet"))
        n_out, n_cut = 0, 0
    else:
        cleaned = qmod._cut_covered(survivors, args.k, with_fp=False)
        cleaned.write_parquet(args.output)
        out_ds = ray.data.read_parquet(args.output)
        n_out = out_ds.count()
        cut_parts = out_ds.map_batches(
            lambda b: pa.table({"s": pa.array(
                [int(pc.sum(b.column("n_cut")).as_py() or 0)], pa.int64())}),
            batch_format="pyarrow").to_pandas()
        n_cut = int(cut_parts["s"].sum()) \
            if "s" in cut_parts.columns and len(cut_parts) else 0
    print(_json.dumps({"rows_in": n_in, "after_dedup": n_dedup,
                       "after_gate": n_gate, "rows_out": n_out,
                       "tokens_cut": n_cut, "derived_ids": derived}))
    return 0


def cmd_quantile(args) -> int:
    """Exact quantile_cont over ANY parquet numeric column — the CLI
    front door to the radix-selection family (stages/selection.py): no
    sort, no gather, 4 histogram scans for ANY number of quantiles,
    bit-identical to DuckDB's quantile_cont. NULLs are excluded and
    counted; NaN values are a documented precondition."""
    import ray.data

    from pdf_parser_ray.stages.selection import exact_quantiles

    _init_ray(args.num_cpus, getattr(args, 'verbose', False))
    ds = ray.data.read_parquet(args.input)
    names = list(ds.schema().names)
    if args.col not in names:
        print(f"no column {args.col!r}; table has {names}", file=sys.stderr)
        return 1
    try:
        qs = [float(x) for x in args.q.split(",")]
    except ValueError:
        print(f"bad -q value {args.q!r} (want e.g. 0.5,0.95)",
              file=sys.stderr)
        return 1
    if not all(0.0 <= q <= 1.0 for q in qs):
        print("quantiles must be in [0, 1]", file=sys.stderr)
        return 1

    import pyarrow as pa
    import pyarrow.compute as pc

    def as_double(batch: pa.Table) -> pa.Table:
        return pa.table({args.col: pc.cast(batch.column(args.col),
                                           pa.float64())})

    vals, n_valid = exact_quantiles(
        ds.map_batches(as_double, batch_format="pyarrow",
                       zero_copy_batch=True), args.col, qs)
    import json as _json
    print(_json.dumps({"column": args.col, "n_valid": n_valid,
                       "quantiles": dict(zip(map(str, qs), vals))}))
    return 0


def cmd_search(args) -> int:
    """BM25 keyword search over ANY parquet corpus — the CLI front door
    to the shared retrieval kernel (stages/retrieval.py, the oracled
    docs_bm25_topk pipeline's engine): whitespace-token query terms,
    one text scan, constant-width stat partials, local-top-k merge.
    Prints the top-k (id, score) plus a snippet of each hit."""
    import json as _json

    import pyarrow as pa
    import ray.data

    from pdf_parser_ray.stages.retrieval import bm25_topk

    _init_ray(args.num_cpus, getattr(args, 'verbose', False))
    ds = ray.data.read_parquet(args.input)
    names = list(ds.schema().names)
    if args.text_col not in names or args.id_col not in names:
        print(f"need columns {args.id_col!r} and {args.text_col!r}; "
              f"table has {names}", file=sys.stderr)
        return 1
    terms = tuple(t for t in args.query.split() if t)
    if not terms:
        print("empty query", file=sys.stderr)
        return 1
    derived = _id_prep(ds.schema(), args.id_col)
    work = _work_dataset(ds, args.id_col, args.text_col, derived)
    top = bm25_topk(work, terms, args.k)
    hits = dict(zip(top["doc_id"].tolist(), top["bm25"].tolist()))

    # one more streaming pass collects ONLY the hits' display fields
    import pyarrow.compute as pc

    href = None
    if hits:
        import ray as _ray

        href = _ray.put(pa.array(sorted(hits), pa.int64()))

    def pick(batch: pa.Table) -> pa.Table:
        import ray as _ray

        ids = _ids_int64(batch.column(args.id_col), derived)
        mask = pc.is_in(ids, value_set=_ray.get(href))
        kept = batch.filter(mask)
        kept_ids = _ids_int64(kept.column(args.id_col), derived)
        snip = pc.utf8_slice_codeunits(
            pc.fill_null(pc.cast(kept.column(args.text_col), "string"),
                         ""), 0, args.snippet)
        return pa.table({"id": pc.cast(kept.column(args.id_col),
                                       pa.string()),
                         "docid": kept_ids,
                         "snippet": snip})

    rows = []
    if hits:
        shown = ds.map_batches(pick, batch_format="pyarrow",
                               zero_copy_batch=True).to_pandas()
        if "docid" in shown.columns:
            for _, r in shown.iterrows():
                rows.append({"id": r["id"], "score": hits[int(r["docid"])],
                             "snippet": r["snippet"]})
    rows.sort(key=lambda r: (-r["score"], r["id"]))
    for r in rows:
        print(f"{r['score']:10.4f}  {r['id']}  {r['snippet']!r}")
    print(_json.dumps({"query": " ".join(terms), "hits": len(rows)}))
    return 0


def cmd_hot(args) -> int:
    """Exact heavy hitters over ANY parquet text column — the CLI front
    door to the Misra-Gries screen + exact-verify kernel
    (stages/heavy.py): every whitespace token holding more than
    1/--denom of all tokens, with its EXACT count. Two streaming scans,
    driver state bounded by a pigeonhole constant."""
    import json as _json

    import ray.data

    from pdf_parser_ray.stages.heavy import exact_heavy_hitters

    _init_ray(args.num_cpus, getattr(args, 'verbose', False))
    ds = ray.data.read_parquet(args.input)
    names = list(ds.schema().names)
    if args.col not in names:
        print(f"no column {args.col!r}; table has {names}", file=sys.stderr)
        return 1
    if args.k + 1 <= args.denom:
        print(f"need k+1 > denom (got k={args.k}, denom={args.denom}): "
              "the MG sketch must out-resolve the threshold",
              file=sys.stderr)
        return 1
    df = exact_heavy_hitters(ds, args.col, k=args.k, denom=args.denom)
    for _, r in df.sort_values(["cnt", "tok"],
                               ascending=[False, True]).iterrows():
        print(f"{int(r['cnt']):12d}  {int(r['share_ppm']):8d}ppm  "
              f"{r['tok']}")
    print(_json.dumps({"column": args.col, "denom": args.denom,
                       "hitters": len(df)}))
    return 0


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(prog="pdf_parser_ray")
    ap.add_argument("--num-cpus", type=int, default=None)
    ap.add_argument("-v", "--verbose", action="store_true",
                    help="verbose Ray logging (reference cli.py -v analog)")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("parse", help="extract a corpus (checkpointed)")
    p.add_argument("input", nargs="+")
    p.add_argument("-o", "--output", required=True)
    p.add_argument("--format", choices=["text", "markdown", "json", "all"],
                   default="text")
    p.add_argument("--explode-threshold", type=int, default=None)
    p.add_argument("--parse-mode", choices=["tasks", "actors"], default="tasks")
    p.add_argument("--files-per-part", type=int, default=1)
    p.add_argument("--start-page", type=int, default=1,
                   help="first page to parse per document (1-indexed)")
    p.add_argument("--end-page", type=int, default=None,
                   help="last page to parse per document (inclusive)")
    p.add_argument("--coordinates", action="store_true",
                   help="include bounding boxes in JSON output")
    p.add_argument("--detect-lang", action="store_true",
                   help="append a pred_lang column (n-gram language ID "
                        "over the extracted text)")
    p.add_argument("--quality-signals", action="store_true",
                   help="append n_tokens/alpha_ratio/stop_ratio quality "
                        "columns over the extracted text")
    p.add_argument("--pdf-column", default=None,
                   help="treat this input column as raw PDF bytes and "
                        "decode via PyMuPDF (sources/pdfbytes.py seam)")
    p.add_argument("--password", default=None,
                   help="password for encrypted PDFs (with --pdf-column "
                        "or raw .pdf inputs; reference "
                        "core/document.py:104-119)")
    p.add_argument("--pdfs-per-shard", type=int, default=64,
                   help="raw .pdf inputs staged per parquet shard")
    p.set_defaults(fn=cmd_parse)

    p = sub.add_parser("info", help="corpus facts")
    p.add_argument("input", nargs="+")
    p.set_defaults(fn=cmd_info)

    p = sub.add_parser("analyze", help="layout dump for one url")
    p.add_argument("input", nargs="+")
    p.add_argument("--url", required=True)
    p.add_argument("--page", type=int, default=None)
    p.add_argument("--max-blocks", type=int, default=10)
    p.add_argument("--max-chars", type=int, default=1200)
    p.add_argument("--pdf-column", default=None,
                   help="treat this column as raw PDF bytes (PyMuPDF seam)")
    p.add_argument("--password", default=None,
                   help="password for encrypted PDFs (with --pdf-column)")
    p.set_defaults(fn=cmd_analyze)

    p = sub.add_parser("query", help="run one pipeline from the suite")
    p.add_argument("name")
    p.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    p.add_argument("-o", "--output", default=None)
    p.add_argument("--max-rows", type=int, default=50)
    p.set_defaults(fn=cmd_query)

    p = sub.add_parser("synth", help="generate a synthetic corpus")
    p.add_argument("n_docs", type=int)
    p.add_argument("-o", "--output", required=True)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--format", choices=["parquet", "warc"],
                   default="parquet",
                   help="output container: parquet shards (default) or "
                        "per-record-gzipped WARC shards")
    p.add_argument("--warc-shards", type=int, default=4,
                   help="shard count for --format warc")
    p.set_defaults(fn=cmd_synth)

    p = sub.add_parser("urldedup",
                       help="canonical-URL dedup over any parquet corpus "
                            "(RFC 3986 normalization + tracking-param "
                            "strip)")
    p.add_argument("input", nargs="+")
    p.add_argument("-o", "--output", required=True)
    p.add_argument("--url-column", default="url")
    p.set_defaults(fn=cmd_urldedup)

    p = sub.add_parser("dedup",
                       help="dedup any parquet corpus (exact md5 / "
                            "minhash-verified / exact n-gram / simhash)")
    p.add_argument("input", nargs="+")
    p.add_argument("-o", "--output", required=True)
    p.add_argument("--mode",
                   choices=["exact", "near", "ngram", "simhash"],
                   default="exact",
                   help="exact=md5; near=MinHash-LSH+verify; ngram=exact "
                        "inverted-index Jaccard; simhash=hamming<=3")
    p.add_argument("--threshold", type=float, default=0.8,
                   help="Jaccard bound for near/ngram modes")
    p.add_argument("--max-hamming", type=int, default=3,
                   help="simhash-mode hamming bound (<= 3 stays exact "
                        "under the 16-bit chunk banding)")
    p.add_argument("--id-col", default="doc_id")
    p.add_argument("--text-col", default="text")
    p.set_defaults(fn=cmd_dedup)

    p = sub.add_parser("clean",
                       help="dedup + quality gate + PII scrub + span "
                            "surgery; writes cleaned text")
    p.add_argument("input", nargs="+")
    p.add_argument("-o", "--output", required=True)
    p.add_argument("--id-col", default="doc_id")
    p.add_argument("--text-col", default="text")
    p.add_argument("--min-tokens", type=int, default=30)
    p.add_argument("-k", type=int, default=8,
                   help="duplicated-span gram size")
    p.set_defaults(fn=cmd_clean)

    p = sub.add_parser("quantile",
                       help="exact quantile_cont over any numeric "
                            "column (radix selection, no sort)")
    p.add_argument("input", nargs="+")
    p.add_argument("--col", required=True)
    p.add_argument("-q", default="0.25,0.5,0.75,0.95,0.99",
                   help="comma-separated quantiles in [0,1]")
    p.set_defaults(fn=cmd_quantile)

    p = sub.add_parser("search",
                       help="BM25 keyword search over any parquet corpus")
    p.add_argument("input", nargs="+")
    p.add_argument("--query", required=True)
    p.add_argument("-k", type=int, default=10)
    p.add_argument("--id-col", default="doc_id")
    p.add_argument("--text-col", default="text")
    p.add_argument("--snippet", type=int, default=80)
    p.set_defaults(fn=cmd_search)

    p = sub.add_parser("hot",
                       help="exact heavy-hitter tokens (Misra-Gries "
                            "screen + exact verify)")
    p.add_argument("input", nargs="+")
    p.add_argument("--col", default="text")
    p.add_argument("--denom", type=int, default=40,
                   help="report tokens with share > 1/denom")
    p.add_argument("-k", type=int, default=64,
                   help="MG counters per batch (must be > denom)")
    p.set_defaults(fn=cmd_hot)

    p = sub.add_parser("profile",
                       help="column profile of any parquet table")
    p.add_argument("input", nargs="+")
    p.set_defaults(fn=cmd_profile)
    return ap


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
