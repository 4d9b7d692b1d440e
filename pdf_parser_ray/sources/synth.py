"""Deterministic synthetic page corpus (the ``pages`` input table).

Schema is exactly the input_hint shape (BASELINE.json:15 / FIXTURES.md §1):
    url:string  warc_ts:timestamp[us]  html:binary  text:string  lang:string

``.pdf`` urls carry a JSON page-dict bundle in PyMuPDF ``get_text("dict")``
shape; ``.html`` urls carry UTF-8 HTML with boilerplate.  Generation is a
pure function of (seed, doc_id), so the corpus can be produced inside Ray
``map_batches`` at any scale with identical bytes regardless of sharding.

Scenario coverage (FIXTURES.md §1): single-column prose, gated two-column
pages with centered titles, span-straddling wide blocks, header/footer
bands, heading/list/caps classification triggers, hyphenated line ends,
tables (with/without header rows, long cells), empty pages, malformed
payloads (block-level drops, page-level fallback, document-level error),
and a heavy-tail page-count distribution for the skew path.
"""

from __future__ import annotations

import json
import random

PAGE_W = 612.0
PAGE_H = 792.0
EPOCH_US = 1_700_000_000_000_000  # fixed fake crawl epoch (microseconds)

_WORDS = (
    "stream shuffle arrow batch actor lineage column layout corpus page "
    "vector tensor window schema broadcast partition kernel block span "
    "crawl index token charter harvest signal merit lattice copper delta "
    "meadow anchor botany cinder dynamo ember fathom garnet hollow ingot"
).split()

_LANGS = ("en", "de", "fr", "es", "unknown")


def _rng_for(seed: int, doc_id: int) -> random.Random:
    return random.Random((seed * 1_000_003 + doc_id) & 0xFFFFFFFFFFFF)


def _words(rng: random.Random, n: int) -> list[str]:
    return [_WORDS[rng.randrange(len(_WORDS))] for _ in range(n)]


def _sentence(rng: random.Random, n: int) -> str:
    ws = _words(rng, n)
    return " ".join(ws).capitalize() + "."


# ---------------------------------------------------------------------------
# page-dict building blocks
# ---------------------------------------------------------------------------


def _span(text: str, x: float, y: float, size: float = 11.0,
          font: str = "Times-Roman", flags: int = 0) -> dict:
    w = len(text) * size * 0.5
    return {
        "text": text,
        "bbox": [x, y, x + w, y + size],
        "font": font,
        "size": size,
        "flags": flags,
        "color": 0,
    }


def _line(rng: random.Random, x: float, y: float, n_words: int,
          size: float = 11.0, font: str = "Times-Roman", flags: int = 0,
          hyphen: bool = False, multi_span: bool = False) -> dict:
    text = " ".join(_words(rng, n_words))
    if hyphen:
        text += "-"
    spans = []
    if multi_span and n_words >= 4:
        cut = len(text) // 2
        first, second = text[:cut], text[cut:].lstrip()
        s1 = _span(first, x, y, size, font, flags)
        gap = size * 0.5  # > 0.3*size -> the joiner must insert a space
        s2 = _span(second, s1["bbox"][2] + gap, y, size, font, flags)
        spans = [s1, s2]
    else:
        spans = [_span(text, x, y, size, font, flags)]
    return {
        "bbox": [x, y, max(s["bbox"][2] for s in spans), y + size],
        "spans": spans,
    }


def _block(lines: list[dict]) -> dict:
    return {
        "type": 0,
        "bbox": [
            min(ln["bbox"][0] for ln in lines),
            min(ln["bbox"][1] for ln in lines),
            max(ln["bbox"][2] for ln in lines),
            max(ln["bbox"][3] for ln in lines),
        ],
        "lines": lines,
    }


def _para_block(rng: random.Random, x: float, y: float, n_lines: int,
                width_words: int = 7, size: float = 11.0,
                leading: float = 3.0, hyphen_rate: float = 0.15) -> dict:
    lines = []
    for i in range(n_lines):
        hyphen = rng.random() < hyphen_rate and i < n_lines - 1
        lines.append(_line(
            rng, x, y + i * (size + leading), width_words, size,
            hyphen=hyphen, multi_span=rng.random() < 0.3,
        ))
    return _block(lines)


def _heading_block(rng: random.Random, x: float, y: float,
                   style: int) -> dict:
    if style == 0:    # bold flag
        ln = _line(rng, x, y, 3, size=12.0, flags=16)
    elif style == 1:  # large font
        ln = _line(rng, x, y, 3, size=16.0)
    else:             # ALL CAPS
        ln = _line(rng, x, y, 3, size=11.0)
        for s in ln["spans"]:
            s["text"] = s["text"].upper()
    return _block([ln])


def _list_block(rng: random.Random, x: float, y: float, idx: int) -> dict:
    ln = _line(rng, x, y, 5)
    marker = f"{idx}. " if idx % 2 else "- "
    ln["spans"][0]["text"] = marker + ln["spans"][0]["text"]
    return _block([ln])


# ---------------------------------------------------------------------------
# page scenarios
# ---------------------------------------------------------------------------


def _page_single_column(rng: random.Random) -> dict:
    blocks = []
    y = 90.0
    if rng.random() < 0.6:
        blocks.append(_heading_block(rng, 72.0, y, rng.randrange(3)))
        y += 30.0
    n_paras = rng.randrange(3, 7)
    for _ in range(n_paras):
        nl = rng.randrange(2, 6)
        blocks.append(_para_block(rng, 72.0, y, nl))
        y += nl * 14.0 + rng.uniform(8.0, 20.0)
        if y > 640.0:
            break
    if rng.random() < 0.4:
        for i in range(rng.randrange(2, 5)):
            blocks.append(_list_block(rng, 90.0, y, i + 1))
            y += 16.0
            if y > 680.0:
                break
    return {"width": PAGE_W, "height": PAGE_H, "blocks": blocks, "tables": []}


def _page_two_column(rng: random.Random, with_wide_split: bool = False) -> dict:
    blocks = []
    # centered one-line title straddling the middle (stays whole: Q8)
    title_text = " ".join(_words(rng, 4)).upper()
    tw = len(title_text) * 14.0 * 0.5
    tx = PAGE_W / 2 - tw / 2
    blocks.append(_block([_line(rng, tx, 95.0, 1, size=14.0)]))
    blocks[-1]["lines"][0]["spans"][0]["text"] = title_text
    blocks[-1]["lines"][0]["spans"][0]["bbox"] = [tx, 95.0, tx + tw, 109.0]
    blocks[-1]["bbox"] = [tx, 95.0, tx + tw, 109.0]

    left_x, right_x = 60.0, 322.0
    y = 140.0
    for _ in range(rng.randrange(2, 5)):
        nl = rng.randrange(2, 5)
        blocks.append(_para_block(rng, left_x, y, nl, width_words=5))
        y2 = y + rng.uniform(0.0, 10.0)
        blocks.append(_para_block(rng, right_x, y2, nl, width_words=5))
        y += nl * 14.0 + 14.0
    if with_wide_split:
        # multi-line block whose spans sit on both sides -> span-level split
        lines = []
        for i in range(2):
            ly = y + i * 14.0
            s_left = _span(" ".join(_words(rng, 3)), left_x, ly)
            s_right = _span(" ".join(_words(rng, 3)), right_x, ly)
            lines.append({
                "bbox": [left_x, ly, s_right["bbox"][2], ly + 11.0],
                "spans": [s_left, s_right],
            })
        blocks.append(_block(lines))
    return {"width": PAGE_W, "height": PAGE_H, "blocks": blocks, "tables": []}


def _page_with_bands(rng: random.Random) -> dict:
    page = _page_single_column(rng)
    page["blocks"].insert(0, _block([_line(rng, 72.0, 30.0, 4)]))       # header band
    page["blocks"].append(_block([_line(rng, 250.0, 750.0, 2)]))        # footer band
    return page


def _page_with_table(rng: random.Random) -> dict:
    page = _page_single_column(rng)
    style = rng.randrange(4)
    if style == 0:      # caps header row
        data = [["NAME", "VALUE"], ["alpha", "100"], ["beta", "2400"]]
    elif style == 1:    # no header signal (numbers everywhere)
        data = [["1", "2", "3"], ["4", "5", "6"], ["7", "8", "9"]]
    elif style == 2:    # long wrapped cell + >40-char cell
        long_word = "x" * 55
        data = [
            ["Item", "Description"],
            ["widget", _sentence(rng, 14)],
            ["gadget", long_word],
        ]
    else:               # multi-line cell + empty cells
        data = [["Col A", "Col B"], ["line1\nline2", ""], ["", "tail"]]
    top, bottom = 430.0, 430.0 + 22.0 * len(data)
    page["tables"] = [{"bbox_topleft": [72.0, top, 420.0, bottom], "data": data}]
    # a stray text block overlapping the table region must be filtered out
    # (analyzer.py:258-266 via the flipped-y table bbox, quirk Q5)
    page["blocks"].append(_block([_line(rng, 100.0, PAGE_H - bottom + 4.0, 3)]))
    return page


def _page_empty(rng: random.Random) -> dict:
    blocks = []
    if rng.random() < 0.5:  # whitespace-only page exercises the drop path
        ln = _line(rng, 72.0, 200.0, 1)
        ln["spans"][0]["text"] = "   "
        blocks = [_block([ln])]
    return {"width": PAGE_W, "height": PAGE_H, "blocks": blocks, "tables": []}


def _page_malformed(rng: random.Random) -> dict:
    """Mix of tolerated damage (dropped items) and page-fallback damage."""
    page = _page_single_column(rng)
    kind = rng.randrange(3)
    if kind == 0:
        # invalid bbox (x0 > x1): ValueError -> block silently dropped
        page["blocks"].append({
            "type": 0,
            "bbox": [500.0, 200.0, 100.0, 220.0],
            "lines": [_line(rng, 100.0, 200.0, 3)],
        })
    elif kind == 1:
        # null bbox: TypeError escapes the tolerated set -> whole-page
        # fallback via simple text (quirk Q12)
        page["blocks"].append({"type": 0, "bbox": None,
                               "lines": [_line(rng, 100.0, 300.0, 3)]})
    else:
        # non-text block type is skipped
        page["blocks"].append({"type": 1, "bbox": [0, 0, 10, 10], "lines": []})
    return page


_SCENARIOS = (
    _page_single_column,
    lambda rng: _page_two_column(rng, with_wide_split=False),
    lambda rng: _page_two_column(rng, with_wide_split=True),
    _page_with_bands,
    _page_with_table,
    _page_empty,
    _page_malformed,
)
# draw weights: prose-heavy with regular structure pages
_SCENARIO_WEIGHTS = (30, 14, 8, 14, 16, 5, 6)


def _make_page(rng: random.Random) -> dict:
    pick = rng.choices(range(len(_SCENARIOS)), weights=_SCENARIO_WEIGHTS)[0]
    return _SCENARIOS[pick](rng)


def _page_count(rng: random.Random) -> int:
    r = rng.random()
    if r < 0.80:
        return rng.randrange(1, 5)
    if r < 0.95:
        return rng.randrange(5, 17)
    if r < 0.99:
        return rng.randrange(17, 65)
    return rng.randrange(100, 301)  # giant docs drive the explode path


# ---------------------------------------------------------------------------
# HTML documents
# ---------------------------------------------------------------------------


def _html_doc(rng: random.Random) -> str:
    nav_links = "".join(
        f'<li><a href="/{w}">{w}</a></li>' for w in _words(rng, 6)
    )
    paras = "\n".join(
        f"<p>{_sentence(rng, rng.randrange(12, 30))}</p>"
        for _ in range(rng.randrange(3, 9))
    )
    lis = "\n".join(
        f"<li>{_sentence(rng, rng.randrange(6, 14))}</li>"
        for _ in range(rng.randrange(0, 4))
    )
    linkfarm = " ".join(
        f'<a href="/{w}">{w} {w}</a>' for w in _words(rng, 10)
    )
    return f"""<html><head><title>{' '.join(_words(rng, 3))}</title>
<style>body {{ margin: 0; }}</style>
<script>var x = 1;</script></head>
<body>
<nav><ul>{nav_links}</ul></nav>
<header><p>{_sentence(rng, 8)}</p></header>
<div class="main">
<h1>{' '.join(_words(rng, 4)).title()}</h1>
{paras}
<h2>{' '.join(_words(rng, 3)).title()}</h2>
<ul>{lis}</ul>
<p>{linkfarm}</p>
</div>
<aside><p>{_sentence(rng, 20)}</p></aside>
<footer><p>copyright {' '.join(_words(rng, 4))}</p></footer>
</body></html>"""


# ---------------------------------------------------------------------------
# corpus rows
# ---------------------------------------------------------------------------

HTML_FRACTION = 0.4
BROKEN_DOC_RATE = 0.01  # undecodable payloads -> error rows


def gen_document(doc_id: int, seed: int = 42) -> dict:
    """One deterministic corpus row (pure function of (seed, doc_id))."""
    rng = _rng_for(seed, doc_id)
    is_html = rng.random() < HTML_FRACTION
    lang = rng.choice(_LANGS)
    ts = EPOCH_US + doc_id * 1_000_000

    if is_html:
        url = f"https://example.org/doc/{doc_id:08d}.html"
        payload = _html_doc(rng).encode("utf-8")
        raw_text = " ".join(_words(rng, 40))
    else:
        url = f"https://example.org/doc/{doc_id:08d}.pdf"
        if rng.random() < BROKEN_DOC_RATE:
            payload = b"\x00\x01corrupt-not-json"
        else:
            n_pages = _page_count(rng)
            bundle = {
                "pages": [_make_page(rng) for _ in range(n_pages)],
                "metadata": {
                    "title": " ".join(_words(rng, 3)).title(),
                    "author": " ".join(_words(rng, 2)).title(),
                },
            }
            payload = json.dumps(bundle).encode("utf-8")
        raw_text = " ".join(_words(rng, 40))

    return {
        "url": url,
        "warc_ts": ts,  # microseconds; cast to timestamp[us] at table build
        "html": payload,
        "text": raw_text,
        "lang": lang,
    }


def corpus_table_for_ids(ids, seed: int = 42):
    """Arrow table for an explicit doc_id list (order preserved)."""
    import pyarrow as pa

    rows = [gen_document(i, seed) for i in ids]
    return pa.table({
        "url": pa.array([r["url"] for r in rows], pa.string()),
        "warc_ts": pa.array([r["warc_ts"] for r in rows], pa.timestamp("us")),
        "html": pa.array([r["html"] for r in rows], pa.binary()),
        "text": pa.array([r["text"] for r in rows], pa.string()),
        "lang": pa.array([r["lang"] for r in rows], pa.string()),
    })


def corpus_table(n_docs: int, seed: int = 42, start: int = 0):
    """Arrow table of ``n_docs`` rows starting at ``start`` (driver-side /
    test-size corpora; large corpora are generated distributed via
    sources.pages.synth_dataset)."""
    return corpus_table_for_ids(range(start, start + n_docs), seed)
