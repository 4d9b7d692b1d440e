"""Nested Arrow schema for structured output (SURVEY.md §1.2).

Besides the flat text/markdown/json columns, the pipeline can emit the
document structure as NATIVE nested Arrow columns — the columnar
re-expression of the reference's StructuredDocument tree — so downstream
Ray/Arrow consumers can query blocks and tables without JSON parsing:

    blocks: list<struct<page_number:int32, text:large_string,
                        block_type:string, column_index:int32,
                        bbox:fixed_size_list<double,4>>>
    tables: list<struct<page_number:int32, num_rows:int32, num_cols:int32,
                        has_header:bool, ascii:large_string,
                        bbox:fixed_size_list<double,4>>>
"""

from __future__ import annotations

import pyarrow as pa

BBOX_TYPE = pa.list_(pa.float64(), 4)

BLOCK_STRUCT = pa.struct([
    ("page_number", pa.int32()),
    ("text", pa.large_string()),
    ("block_type", pa.string()),
    ("column_index", pa.int32()),
    ("bbox", BBOX_TYPE),
])

TABLE_STRUCT = pa.struct([
    ("page_number", pa.int32()),
    ("num_rows", pa.int32()),
    ("num_cols", pa.int32()),
    ("has_header", pa.bool_()),
    ("ascii", pa.large_string()),
    ("bbox", BBOX_TYPE),
])

BLOCKS_TYPE = pa.list_(BLOCK_STRUCT)
TABLES_TYPE = pa.list_(TABLE_STRUCT)


def doc_blocks(pages: list[dict]) -> list[dict]:
    """Flatten a parsed document's blocks for the nested column."""
    out = []
    for page in pages:
        for b in page["blocks"]:
            out.append({
                "page_number": page["page_number"],
                "text": b["text"],
                "block_type": b["type"],
                "column_index": b["column_index"],
                "bbox": [float(v) for v in b["box"]],
            })
    return out


def doc_tables(pages: list[dict]) -> list[dict]:
    out = []
    for page in pages:
        for t in page["tables"]:
            out.append({
                "page_number": page["page_number"],
                "num_rows": t["num_rows"],
                "num_cols": t["num_cols"],
                "has_header": t["has_header"],
                "ascii": t["ascii"],
                "bbox": [float(v) for v in t["box"]],
            })
    return out
