"""Ray Data stages for the extraction pipeline.

Three stages (SURVEY.md §3.4), all over ``batch_format="pyarrow"``:

1. ``route_and_explode`` — stateless task stage. Small documents pass
   through whole; documents whose payload exceeds the explode threshold are
   split into per-page rows (the skew path for giant documents). The raw
   ``html`` payload does not survive this stage for exploded docs — only
   per-page slices — so the later shuffle never moves crawl bytes.
2. ``ParseDocuments`` — actor-pool stage (callable class: warm state built
   once per actor, the analog of the reference's per-document analyzer
   reuse, document.py:55 / detector.py:77). Parses whole docs or single
   pages into formatted chunks.
3. ``assemble_group`` — ``groupby("url").map_groups`` consolidation of
   per-page chunks, ordered by ``page_number`` inside the group (never by
   arrival order). Single-row groups (the common case) pass through.

Chunk-join invariant: every per-page plain/markdown chunk is exactly the
slice of the whole-document line list for that page, so document text ==
"\\n".join(non-empty chunks in page order). Verified byte-identical against
the sequential renderer in tests/test_pipeline.py.
"""

from __future__ import annotations

import json

import pyarrow as pa

from pdf_parser_ray.functions import layout, render
from pdf_parser_ray.functions import schema as outschema
from pdf_parser_ray.functions.document import extract_document

# Result columns. large_string: extracted text for a giant document can
# approach block-size limits. blocks/tables: nested structured output
# (functions/schema.py), empty lists unless want_structured.
RESULT_FIELDS = [
    ("url", pa.string()),
    ("page_number", pa.int32()),
    ("n_pages", pa.int32()),
    ("text", pa.large_string()),
    ("markdown", pa.large_string()),
    ("json", pa.large_string()),
    ("n_blocks", pa.int64()),
    ("n_tables", pa.int64()),
    ("error", pa.string()),
    ("blocks", outschema.BLOCKS_TYPE),
    ("tables", outschema.TABLES_TYPE),
    ("final", pa.bool_()),
    # bundle metadata JSON, carried on page-1 chunk rows only: the
    # assemble stage needs it to rebuild the document-level JSON output
    ("meta", pa.string()),
]
RESULT_SCHEMA = pa.schema(RESULT_FIELDS)

OUTPUT_COLUMNS = ["url", "text", "markdown", "json",
                  "n_pages", "n_blocks", "n_tables", "error",
                  "blocks", "tables"]

ROUTED_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("kind", pa.string()),        # "doc" (whole) | "page" (exploded)
    ("page_number", pa.int32()),  # 0 for whole docs
    ("n_pages", pa.int32()),
    ("payload", pa.large_binary()),
    ("meta", pa.string()),        # bundle metadata JSON, page-1 rows only
])


def _wrap_as_docs(batch: pa.Table) -> pa.Table:
    """Vectorised fast path: every row passes through whole — no Python
    copy of the payload bytes, just column reuse + constant columns."""
    import pyarrow.compute as pc

    n = batch.num_rows
    return pa.table({
        "url": batch.column("url"),
        "kind": pa.array(["doc"] * n, pa.string()),
        "page_number": pa.array([0] * n, pa.int32()),
        "n_pages": pa.array([0] * n, pa.int32()),
        "payload": pc.cast(batch.column("html"), pa.large_binary()),
        "meta": pa.array([""] * n, pa.string()),
    }, schema=ROUTED_SCHEMA)


def make_router(explode_threshold: int | None):
    """Stateless routing stage. ``explode_threshold=None`` disables the
    explode path entirely (pure-map pipeline, no shuffle downstream)."""

    if explode_threshold is None:
        return _wrap_as_docs

    def route(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        # common case: nothing in this batch crosses the threshold
        sizes = pc.binary_length(batch.column("html"))
        if pa.compute.max(sizes).as_py() is None or \
                pa.compute.max(sizes).as_py() <= explode_threshold:
            return _wrap_as_docs(batch)

        urls = batch.column("url").to_pylist()
        payloads = batch.column("html").to_pylist()
        out = {name: [] for name in ROUTED_SCHEMA.names}

        def emit(url, kind, page_number, n_pages, payload, meta):
            out["url"].append(url)
            out["kind"].append(kind)
            out["page_number"].append(page_number)
            out["n_pages"].append(n_pages)
            out["payload"].append(payload)
            out["meta"].append(meta)

        for url, payload in zip(urls, payloads):
            big = (
                explode_threshold is not None
                and payload is not None
                and len(payload) > explode_threshold
                and not url.endswith(".html")
            )
            if big:
                try:
                    bundle = layout.load_bundle(payload)
                except Exception:
                    # undecodable: fall through as a whole doc so the parse
                    # stage produces the standard error row
                    emit(url, "doc", 0, 0, payload, "")
                    continue
                pages = bundle["pages"]
                meta_json = json.dumps(bundle.get("metadata") or {})
                # a non-dict page entry would poison per-page parsing (both
                # analyze_page and the fallback need a dict); route the whole
                # doc instead so it degrades to the standard error row exactly
                # like pure-map mode (never-raises invariant)
                if not pages or not all(isinstance(p, dict) for p in pages):
                    emit(url, "doc", 0, 0, payload, "")
                    continue
                for i, pdict in enumerate(pages):
                    emit(
                        url, "page", i + 1, len(pages),
                        json.dumps(pdict).encode("utf-8"),
                        meta_json if i == 0 else "",
                    )
            else:
                emit(url, "doc", 0, 0, payload, "")
        return pa.table(out, schema=ROUTED_SCHEMA)

    return route


class ParseDocuments:
    """Actor-pool parse stage: whole documents and exploded pages.

    Built once per actor (``__init__``), applied per batch (``__call__``) —
    pass to ``ds.map_batches(ParseDocuments, concurrency=..., ...)``.
    """

    def __init__(self, want_markdown: bool = True, want_json: bool = False,
                 start_page: int = 1, end_page: int | None = None,
                 json_coordinates: bool = False,
                 want_structured: bool = False):
        self.want_markdown = want_markdown
        self.want_json = want_json
        self.start_page = start_page
        self.end_page = end_page
        self.json_coordinates = json_coordinates
        self.want_structured = want_structured

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = {name: [] for name, _ in RESULT_FIELDS}

        def emit(url, page_number, n_pages, text, markdown, json_s,
                 n_blocks, n_tables, error, final,
                 blocks=None, tables=None, meta=""):
            out["url"].append(url)
            out["page_number"].append(page_number)
            out["n_pages"].append(n_pages)
            out["text"].append(text)
            out["markdown"].append(markdown)
            out["json"].append(json_s)
            out["n_blocks"].append(n_blocks)
            out["n_tables"].append(n_tables)
            out["error"].append(error)
            out["blocks"].append(blocks or [])
            out["tables"].append(tables or [])
            out["final"].append(final)
            out["meta"].append(meta)

        kinds = batch.column("kind").to_pylist()
        urls = batch.column("url").to_pylist()
        numbers = batch.column("page_number").to_pylist()
        totals = batch.column("n_pages").to_pylist()
        payloads = batch.column("payload").to_pylist()
        metas = batch.column("meta").to_pylist()

        for url, kind, number, total, payload, meta in zip(
            urls, kinds, numbers, totals, payloads, metas
        ):
            if kind == "doc":
                row = extract_document(
                    url, payload,
                    want_markdown=self.want_markdown,
                    want_json=self.want_json,
                    start_page=self.start_page,
                    end_page=self.end_page,
                    json_coordinates=self.json_coordinates,
                    want_structured=self.want_structured,
                )
                emit(url, 0, row["n_pages"], row["text"], row["markdown"],
                     row["json"], row["n_blocks"], row["n_tables"],
                     row["error"], True,
                     blocks=row["blocks"], tables=row["tables"])
            else:
                try:
                    (text, md, json_s, n_blocks, n_tables,
                     blocks, tables) = self._parse_page(number, payload, meta)
                    err = ""
                except Exception as e:  # noqa: BLE001 — never-raises invariant
                    # the router only explodes dict page entries, so this is a
                    # safety net for unexpected page-level failures: degrade to
                    # an error chunk instead of failing the Ray task
                    text = md = json_s = ""
                    n_blocks = n_tables = 0
                    blocks = tables = []
                    err = f"{type(e).__name__}: {e}"
                emit(url, number, total, text, md, json_s,
                     n_blocks, n_tables, err, False,
                     blocks=blocks, tables=tables,
                     meta=meta if number == 1 else "")
        return pa.table(out, schema=RESULT_SCHEMA)

    def _parse_page(self, number: int, payload: bytes, meta_json: str):
        """One exploded page -> (text_chunk, md_chunk, json_chunk,
        n_blocks, n_tables, blocks, tables). Page-level failures degrade to
        the fallback page exactly like the in-doc path (quirk Q12)."""
        pdict = json.loads(payload.decode("utf-8"))
        try:
            page = layout.analyze_page(number, pdict)
        except Exception:
            page = layout.fallback_page(number, pdict)
        text = "\n".join(render.plain_page_lines(page))
        md = ""
        if self.want_markdown:
            lines = []
            if number == 1 and meta_json:
                meta = {k: v for k, v in json.loads(meta_json).items() if v}
                lines.extend(render.markdown_meta_lines(meta))
            lines.extend(render.markdown_page_lines(page))
            md = "\n".join(lines)
        json_s = ""
        if self.want_json:
            # per-page fragment of the reference JSON document
            # (output/formatter.py:250-364): the page dict alone, compact;
            # assemble_group rebuilds the document envelope and re-dumps
            # with indent=2 (json value round-trips are byte-stable)
            json_s = json.dumps(
                render._json_page(page, self.json_coordinates),
                ensure_ascii=False)
        blocks = tables = []
        if self.want_structured:
            blocks = outschema.doc_blocks([page])
            tables = outschema.doc_tables([page])
        return (text, md, json_s, len(page["blocks"]), len(page["tables"]),
                blocks, tables)


def assemble_group(group: pa.Table) -> pa.Table:
    """``map_groups`` consolidation for one url: order chunks by
    page_number and join. Deterministic regardless of arrival order."""
    if group.num_rows == 1 and group.column("final")[0].as_py():
        return group.select(OUTPUT_COLUMNS)
    order = pa.compute.sort_indices(group.column("page_number"))
    rows = group.take(order)
    texts = rows.column("text").to_pylist()
    mds = rows.column("markdown").to_pylist()
    blocks = [b for lst in rows.column("blocks").to_pylist() for b in lst]
    tables = [t for lst in rows.column("tables").to_pylist() for t in lst]
    url = rows.column("url")[0].as_py()
    json_frags = rows.column("json").to_pylist()
    json_doc = ""
    if any(json_frags):
        # rebuild the document envelope exactly like the sequential
        # renderer (render.render_json / formatter.py:250-364); metadata
        # rides on the page-1 chunk row, filtered identically to
        # parse_bundle (empty values dropped)
        raw_meta = rows.column("meta")[0].as_py() or "{}"
        meta = {k: v for k, v in json.loads(raw_meta).items() if v}
        # skip empty fragments (safety-net error chunks produce none) but
        # report the document's TRUE page count from the n_pages column —
        # len(pages) would undercount when an errored chunk was skipped
        pages = [json.loads(f) for f in json_frags if f]
        json_doc = json.dumps({
            "source_path": url,
            "page_count": int(rows.column("n_pages")[0].as_py()),
            "metadata": meta,
            "pages": pages,
        }, indent=2, ensure_ascii=False)
    return pa.table({
        "url": [url],
        "text": pa.array(["\n".join(texts)], pa.large_string()),
        "markdown": pa.array(["\n".join(m for m in mds if m != "")],
                             pa.large_string()),
        "json": pa.array([json_doc], pa.large_string()),
        "n_pages": pa.array([rows.column("n_pages")[0].as_py()], pa.int32()),
        "n_blocks": [sum(rows.column("n_blocks").to_pylist())],
        "n_tables": [sum(rows.column("n_tables").to_pylist())],
        "error": ["; ".join(dict.fromkeys(
            e for e in rows.column("error").to_pylist() if e))],
        "blocks": pa.array([blocks], outschema.BLOCKS_TYPE),
        "tables": pa.array([tables], outschema.TABLES_TYPE),
    })
