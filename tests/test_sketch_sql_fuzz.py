"""Property-based parity: the Python sketch kernels (simhash, winnowing,
shingle Jaccard) must equal their DuckDB formulations on ARBITRARY text,
not just the fixed corpus — any divergence here would silently break the
oracle gates."""

from __future__ import annotations

import duckdb
import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from pdf_parser_ray.functions import sketches

# words with unicode + punctuation to stress \S+ / md5 agreement — plus
# the whitespace classes where Python str.split() and RE2 \S+ DISAGREE
# (Zs like NBSP/narrow-nbsp, Cc like \v and the \x1c-\x1f separators,
#   line separator): RE2 keeps all of these inside tokens, so the
# Python kernels must too (sketches.re2_tokens)
_WORD = st.text(
    alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd", "Po"),
                           whitelist_characters="\xa0\u202f\u2007\u2028"
                                                "\x0b\x1c\x1d\x1e\x1f",
                           blacklist_characters="'\\"),
    min_size=1, max_size=8)
_TEXT = st.lists(_WORD, min_size=0, max_size=40).map(" ".join)


@pytest.fixture(scope="module")
def con():
    return duckdb.connect()


@settings(max_examples=60, deadline=None)
@given(text=_TEXT)
def test_simhash_sql_parity_fuzz(con, text):
    py = f"{sketches.simhash(text):016x}"
    sql = con.execute(r"""
        WITH toks AS (SELECT unnest(regexp_extract_all(?, '\S+')) AS tok),
        bits AS (
            SELECT b.b AS b,
                   sum(CASE WHEN (md5_number_upper(tok) >> b.b) & 1 = 1
                       THEN 1 ELSE -1 END) AS vote
            FROM toks, (SELECT unnest(range(0, 64)) AS b) b GROUP BY b.b
        )
        SELECT lower(lpad(to_hex(CAST(coalesce(sum(
            CASE WHEN vote > 0 THEN (1::HUGEINT << CAST(b AS INTEGER))
                 ELSE 0::HUGEINT END), 0) AS UBIGINT)), 16, '0'))
        FROM bits
    """, [text]).fetchone()[0]
    assert py == sql


@settings(max_examples=60, deadline=None)
@given(text=_TEXT)
def test_winnow_sql_parity_fuzz(con, text):
    from pdf_parser_ray.functions.sketches import _md5_64

    k, window = 5, 8
    n_grams = len(text) - k + 1
    if n_grams >= window:
        hs = np.array([_md5_64(text[i:i + k]) for i in range(n_grams)],
                      dtype=np.uint64)
        mins = np.lib.stride_tricks.sliding_window_view(hs, window).min(axis=1)
        py = sorted(int(x) for x in np.unique(mins))
    else:
        py = []
    sql = [r[0] for r in con.execute(r"""
        WITH grams AS (
            SELECT i, md5_number_upper(substr(?, CAST(i AS INTEGER), 5)) AS h
            FROM (SELECT ? AS t),
                 LATERAL unnest(range(1, length(t) - 5 + 2)) AS u(i)
            WHERE length(t) >= 5
        ), winmin AS (
            SELECT min(h) OVER (ORDER BY i ROWS BETWEEN 7 PRECEDING
                                AND CURRENT ROW) AS fp,
                   row_number() OVER (ORDER BY i) AS rn
            FROM grams
        )
        SELECT DISTINCT fp FROM winmin WHERE rn >= 8 ORDER BY fp
    """, [text, text]).fetchall()]
    assert py == [int(x) for x in sql]


@settings(max_examples=40, deadline=None)
@given(text=_TEXT)
def test_md5_minhash_band_sql_parity_fuzz(con, text):
    """md5-minhash band fingerprints (the SQL-twinnable LSH screen behind
    docs_minhash_eval): the Python band keys must encode exactly the
    (band, csv-of-minima) fingerprints DuckDB recomputes from scratch —
    a divergence anywhere (tokenization, >> 33 truncation, BIGINT affine
    arithmetic, per-band ordering) breaks the eval oracle silently."""
    from pdf_parser_ray.stages import dedup

    py = {tuple(k.split(":", 1)) for k in dedup.md5_minhash_band_keys(text)}
    rows = con.execute(r"""
        WITH words AS (SELECT regexp_extract_all(?, '\S+') AS w),
        sh AS (SELECT DISTINCT w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s
               FROM words, LATERAL unnest(range(1, len(w) - 1)) AS t(i)
               WHERE len(w) >= 3),
        perms AS (
            SELECT CAST(p AS BIGINT) AS p,
                   CAST(md5_number_upper('mh-a-' || p) % 2147483646 + 1
                        AS BIGINT) AS a,
                   CAST(md5_number_upper('mh-b-' || p) % 2147483647
                        AS BIGINT) AS b
            FROM (SELECT unnest(range(0, 64)) AS p)
        ), sig AS (
            SELECT p, p // 4 AS band,
                   min((a * CAST(md5_number_upper(s) >> 33 AS BIGINT) + b)
                       % 2147483647) AS v
            FROM sh, perms GROUP BY p
        )
        SELECT CAST(band AS VARCHAR),
               string_agg(CAST(v AS VARCHAR), ',' ORDER BY p)
        FROM sig GROUP BY band
    """, [text]).fetchall()
    assert py == {(r[0], r[1]) for r in rows}


@settings(max_examples=40, deadline=None)
@given(a=_TEXT, b=_TEXT)
def test_shingle_jaccard_sql_parity_fuzz(con, a, b):
    """Exact 3-word-shingle Jaccard: python kernel vs the SQL formulation
    used by the docs_minhash_pairs oracle (restricted to >= 3 words, the
    regime the oracle covers). The >= 3 gate uses RE2 token counts —
    the oracle's own domain."""
    if len(sketches.re2_tokens(a)) < 3 or len(sketches.re2_tokens(b)) < 3:
        return
    py = sketches.jaccard(sketches.word_shingles(a), sketches.word_shingles(b))
    row = con.execute(r"""
        WITH docs(doc_id, text) AS (VALUES (0, ?), (1, ?)),
        words AS (SELECT doc_id, regexp_extract_all(text, '\S+') AS w
                  FROM docs),
        sh AS (SELECT DISTINCT doc_id,
                      w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s
               FROM words, LATERAL unnest(range(1, len(w) - 1)) AS t(i)
               WHERE len(w) >= 3),
        counts AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        inter AS (SELECT count(*) AS i FROM sh a JOIN sh b
                  ON a.s = b.s AND a.doc_id = 0 AND b.doc_id = 1)
        SELECT CAST(i AS DOUBLE)
               / ((SELECT n FROM counts WHERE doc_id = 0)
                  + (SELECT n FROM counts WHERE doc_id = 1) - i)
        FROM inter
    """, [a, b]).fetchone()
    assert abs(py - row[0]) < 1e-12
