"""ASCIITableStyle plug-point tests, mirroring the reference's
tests/unit/test_ascii_converter.py style cases. The default style IS the
byte contract; custom styles restyle the rendering without touching the
pipeline's default output."""

from __future__ import annotations

from pdf_parser_ray.functions.tables import (
    ASCIITableStyle,
    render_ascii,
    render_markdown,
)


def _table(texts: list[list[str]], has_header: bool = False) -> dict:
    cells = []
    for r, row in enumerate(texts):
        for c, text in enumerate(row):
            cells.append({"text": text, "box": (0, 0, 10, 10),
                          "row": r, "col": c, "is_header": r == 0})
    return {
        "cells": cells,
        "box": (0.0, 0.0, 100.0, 50.0),
        "num_rows": len(texts),
        "num_cols": max(len(r) for r in texts),
        "has_header": has_header,
        "ascii": "",
    }


def test_default_style_values():
    style = ASCIITableStyle()
    assert style.horizontal == "-"
    assert style.vertical == "|"
    assert style.corner == "+"
    assert style.header_separator is True
    assert style.padding == 1
    assert style.max_cell_width == 40
    assert style.min_cell_width == 3


def test_custom_style_values():
    style = ASCIITableStyle(horizontal="═", vertical="║", corner="╬",
                            padding=2, max_cell_width=50)
    assert style.horizontal == "═"
    assert style.vertical == "║"
    assert style.corner == "╬"
    assert style.padding == 2
    assert style.max_cell_width == 50


def test_default_style_is_byte_contract():
    t = _table([["Name", "Value"], ["Item1", "10"]], has_header=True)
    assert render_ascii(t) == render_ascii(t, ASCIITableStyle())
    assert render_markdown(t) == render_markdown(t, ASCIITableStyle())


def test_custom_characters_render():
    t = _table([["Test", "x"], ["a", "b"]])
    out = render_ascii(t, ASCIITableStyle(horizontal="=", vertical="!",
                                          corner="*", padding=2))
    assert "*" in out
    assert "=" in out
    assert "!" in out
    assert "|" not in out
    assert "  Test  " in out  # padding=2


def test_max_cell_width_wraps():
    long = "This is a very long text that should be wrapped"
    t = _table([[long, "x"], ["a", "b"]])
    out = render_ascii(t, ASCIITableStyle(max_cell_width=20))
    content = [line for line in out.split("\n")
               if "|" in line and "+" not in line]
    assert len(content) > 2  # the long cell wrapped over several lines
    assert all(len(line) <= 20 + 4 + 7 for line in content)


def test_header_separator_toggle():
    t = _table([["H1", "H2"], ["a", "b"]], has_header=True)
    with_sep = render_ascii(t)
    without = render_ascii(t, ASCIITableStyle(header_separator=False))
    assert with_sep.count("+--") > without.count("+--")


def test_min_cell_width_floor():
    t = _table([["a", "b"], ["c", "d"]])
    out = render_ascii(t, ASCIITableStyle(min_cell_width=8))
    # every content row pads each cell to >= 8 chars + 2 pad
    row = [line for line in out.split("\n") if line.startswith("|")][0]
    assert len(row) == 1 + (8 + 2) + 1 + (8 + 2) + 1


def test_markdown_uses_style_widths():
    t = _table([["HeaderOne", "H2"], ["a", "b"]])
    out = render_markdown(t, ASCIITableStyle(max_cell_width=4))
    assert "Head |" in out  # truncated to width 4
