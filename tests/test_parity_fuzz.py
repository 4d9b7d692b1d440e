"""Property-based parity: for ARBITRARY (including degenerate/malformed)
page-dict bundles, the engine's plain/markdown/JSON output must equal the
reference oracle byte-for-byte."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from pdf_parser_ray.functions import layout, render
from tests.oracle import refbridge

_text = st.text(
    alphabet=st.characters(
        codec="utf-8",
        categories=("L", "N", "P", "Zs"),
    ),
    min_size=0, max_size=16,
)
_coord = st.floats(min_value=-50.0, max_value=900.0,
                   allow_nan=False, allow_infinity=False)
_size = st.floats(min_value=0.0, max_value=40.0,
                  allow_nan=False, allow_infinity=False)


@st.composite
def _bbox(draw, maybe_invalid=True):
    a, b, c, d = (draw(_coord) for _ in range(4))
    if maybe_invalid and draw(st.booleans()):
        return [a, b, c, d]  # arbitrary order: often invalid -> drop paths
    return [min(a, c), min(b, d), max(a, c), max(b, d)]


@st.composite
def _span(draw):
    return {
        "text": draw(_text),
        "bbox": draw(_bbox()),
        "font": draw(st.sampled_from(
            ["Times-Roman", "Helvetica-Bold", "Courier-Italic", "", "x"])),
        "size": draw(_size),
        "flags": draw(st.integers(min_value=0, max_value=31)),
        "color": draw(st.integers(min_value=0, max_value=0xFFFFFF)),
    }


@st.composite
def _line(draw):
    return {
        "bbox": draw(_bbox()),
        "spans": draw(st.lists(_span(), max_size=4)),
    }


@st.composite
def _block(draw):
    return {
        "type": draw(st.sampled_from([0, 0, 0, 1, 2])),
        "bbox": draw(_bbox()),
        "lines": draw(st.lists(_line(), max_size=4)),
    }


@st.composite
def _table_spec(draw):
    rows = draw(st.integers(min_value=0, max_value=4))
    cols = draw(st.integers(min_value=0, max_value=4))
    data = [
        [draw(st.one_of(st.none(), _text)) for _ in range(cols)]
        for _ in range(rows)
    ]
    x0, top = draw(_coord), draw(_coord)
    return {
        "bbox_topleft": [x0, top, x0 + abs(draw(_coord)), top + abs(draw(_coord))],
        "data": data,
    }


@st.composite
def _page(draw):
    return {
        "width": draw(st.floats(min_value=1.0, max_value=1200.0,
                                allow_nan=False)),
        "height": draw(st.floats(min_value=1.0, max_value=1600.0,
                                 allow_nan=False)),
        "blocks": draw(st.lists(_block(), max_size=6)),
        "tables": draw(st.lists(_table_spec(), max_size=2)),
    }


@st.composite
def _bundle(draw):
    return {
        "pages": draw(st.lists(_page(), max_size=3)),
        "metadata": draw(st.one_of(
            st.none(),
            st.dictionaries(st.sampled_from(["title", "author", "subject"]),
                            _text, max_size=3),
        )),
    }


@settings(max_examples=150, deadline=None)
@given(_bundle())
def test_fuzz_parity(bundle):
    want = refbridge.reference_outputs(bundle, "fuzz.pdf",
                                       include_coordinates=True)
    pages, meta = layout.parse_bundle(bundle)
    assert render.render_plain(pages) == want["text"]
    assert render.render_markdown(pages, meta) == want["markdown"]
    assert render.render_json(pages, meta, "fuzz.pdf",
                              include_coordinates=True) == want["json"]
