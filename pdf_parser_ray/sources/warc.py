"""WARC source: read Common-Crawl-style WARC shards as a pages Dataset.

The north star names "Parquet shards of Common-Crawl-style pages" as the
primary input, but the crawl ecosystem's native container is WARC/1.0
(ISO 28500): a sequence of records, each a header block (CRLF-separated
``Name: value`` lines ending in a blank line) plus a Content-Length-sized
body, records separated by CRLFCRLF; Common Crawl gzips each record
separately so readers can seek member boundaries. This module implements
the format from the public spec (stdlib only):

- ``warc_write_bytes``:  pages -> WARC bytes (warcinfo + one ``response``
  record per page wrapping a minimal HTTP/1.1 response), optionally
  per-record-gzipped (the Common Crawl convention). The test/synth twin.
- ``parse_warc_bytes``:  WARC bytes (plain or multi-member gzip — the
  stdlib gzip module concatenates members transparently) -> one dict per
  ``response`` record: url (WARC-Target-URI), warc_ts (WARC-Date), html
  (the HTTP body; headers stripped when the record wraps an
  application/http payload). Malformed records are SKIPPED, never raised
  — one bad record must not kill a shard task.
- ``read_warc``: shard paths -> ``ray.data.Dataset`` with the pages
  schema (url, warc_ts, html) via ``read_binary_files`` + a per-file
  parse ``map_batches``. Parallelism is per shard file (the Common Crawl
  layout: ~1 GB gzipped shards, tens of thousands per crawl — far more
  shards than cluster cores, so file granularity saturates any cluster;
  a record-offset index would subdivide further if single shards ever
  dominate).

``pipelines.extraction.extract_paths`` sniffs ``.warc`` / ``.warc.gz``
suffixes and routes through here, so the CLI front door
(``parse shards/*.warc.gz -o out``) and checkpoint/resume work unchanged
on WARC input.
"""

from __future__ import annotations

import datetime as _dt
import gzip as _gzip
import io as _io

_CRLF = b"\r\n"
_SEP = b"\r\n\r\n"


def _fmt_date(ts: _dt.datetime) -> str:
    return ts.strftime("%Y-%m-%dT%H:%M:%SZ")


def _parse_date(s: str) -> _dt.datetime | None:
    try:
        return _dt.datetime.strptime(s.strip(), "%Y-%m-%dT%H:%M:%SZ")
    except ValueError:
        try:  # fractional seconds variant (WARC/1.1 allows them)
            return _dt.datetime.strptime(s.strip(),
                                         "%Y-%m-%dT%H:%M:%S.%fZ")
        except ValueError:
            return None


def _record(headers: list[tuple[str, str]], body: bytes) -> bytes:
    head = b"WARC/1.0" + _CRLF + b"".join(
        f"{k}: {v}".encode() + _CRLF for k, v in headers)
    return head + _CRLF + body + _SEP


def warc_write_bytes(pages, *, gzip_per_record: bool = True,
                     warcinfo: str = "software: pdf-parser-ray") -> bytes:
    """pages: iterable of (url, ts: datetime, html: bytes). Returns a
    WARC/1.0 byte stream: a warcinfo record then one response record per
    page, each wrapping a minimal HTTP/1.1 200 response. With
    ``gzip_per_record`` every record is its own gzip member (the Common
    Crawl convention; readers may seek to member boundaries)."""
    out = _io.BytesIO()

    def emit(rec: bytes) -> None:
        out.write(_gzip.compress(rec) if gzip_per_record else rec)

    info_body = warcinfo.encode() + _CRLF
    emit(_record([
        ("WARC-Type", "warcinfo"),
        ("WARC-Date", _fmt_date(_dt.datetime(2024, 1, 1))),
        ("Content-Type", "application/warc-fields"),
        ("Content-Length", str(len(info_body))),
    ], info_body))
    for i, (url, ts, html) in enumerate(pages):
        http = (b"HTTP/1.1 200 OK" + _CRLF
                + b"Content-Type: text/html; charset=UTF-8" + _CRLF
                + f"Content-Length: {len(html)}".encode() + _CRLF
                + _CRLF + html)
        emit(_record([
            ("WARC-Type", "response"),
            ("WARC-Record-ID", f"<urn:uuid:{i:032d}>"),
            ("WARC-Target-URI", url),
            ("WARC-Date", _fmt_date(ts)),
            ("Content-Type", "application/http; msgtype=response"),
            ("Content-Length", str(len(http))),
        ], http))
    return out.getvalue()


def parse_warc_bytes(payload: bytes) -> list[dict]:
    """WARC bytes -> [{url, warc_ts, html}] for every parseable
    ``response`` record. Total over garbage: gzip corruption truncates at
    the last good member; a malformed record skips to the next
    ``WARC/`` magic instead of raising."""
    if payload[:2] == b"\x1f\x8b":
        # member-by-member zlib decompress: gzip.GzipFile buffers across
        # members and discards EVERYTHING on a truncated tail, while this
        # loop keeps every complete member plus the partial tail (whose
        # short record the length check below then skips)
        import zlib as _zlib

        chunks: list[bytes] = []
        data = payload
        while data[:2] == b"\x1f\x8b":
            d = _zlib.decompressobj(31)
            try:
                chunks.append(d.decompress(data))
            except _zlib.error:
                break
            if not d.eof:
                break  # truncated final member: partial output kept
            data = d.unused_data
        payload = b"".join(chunks)
    out: list[dict] = []
    pos = 0
    n = len(payload)
    while pos < n:
        start = payload.find(b"WARC/", pos)
        if start < 0:
            break
        hdr_end = payload.find(_SEP, start)
        if hdr_end < 0:
            break
        headers: dict[str, str] = {}
        for line in payload[start:hdr_end].split(_CRLF)[1:]:
            k, _, v = line.decode("utf-8", "replace").partition(":")
            if _:
                headers[k.strip().lower()] = v.strip()
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            length = -1
        if length < 0:  # unparseable/negative: resync on next magic
            pos = start + 5
            continue
        body = payload[hdr_end + 4:hdr_end + 4 + length]
        # pos must ALWAYS move forward (a lying Content-Length may point
        # backward and loop forever otherwise)
        pos = max(hdr_end + 4 + length + len(_SEP), start + 5)
        if headers.get("warc-type") != "response":
            continue
        url = headers.get("warc-target-uri")
        ts = _parse_date(headers.get("warc-date", ""))
        if not url or ts is None or len(body) < length:
            continue
        if headers.get("content-type", "").startswith("application/http"):
            split = body.find(_SEP)
            body = body[split + 4:] if split >= 0 else body
        out.append({"url": url, "warc_ts": ts, "html": body})
    return out


def is_warc_path(path: str) -> bool:
    p = str(path).lower()
    return p.endswith(".warc") or p.endswith(".warc.gz")


def read_warc(paths) -> "ray.data.Dataset":
    """WARC shard paths -> Dataset(url, warc_ts, html). One parse task
    per shard file (see module docstring for the parallelism argument)."""
    import pyarrow as pa
    import ray.data

    schema = pa.schema([("url", pa.string()),
                        ("warc_ts", pa.timestamp("us")),
                        ("html", pa.binary())])

    def parse_files(batch: "pa.Table") -> "pa.Table":
        urls, tss, htmls = [], [], []
        for blob in batch.column("bytes").to_pylist():
            for rec in parse_warc_bytes(blob):
                urls.append(rec["url"])
                tss.append(rec["warc_ts"])
                htmls.append(rec["html"])
        return pa.table({"url": pa.array(urls, pa.string()),
                         "warc_ts": pa.array(tss, pa.timestamp("us")),
                         "html": pa.array(htmls, pa.binary())})

    files = ray.data.read_binary_files(
        list(paths) if isinstance(paths, (list, tuple)) else paths)
    from pdf_parser_ray.pipelines.relational import ensure_schema

    return ensure_schema(
        files.map_batches(parse_files, batch_format="pyarrow",
                          batch_size=1),  # one ~1 GB shard per task
        schema)
