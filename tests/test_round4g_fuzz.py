"""Round-4g additions: exact heavy hitters (distributed Misra-Gries
screen + exact verify) and Okapi BM25 top-k retrieval.

The sf testdata's dense 31-token vocabulary never triggers MG
compression (31 < k = 64), so the fuzz here builds corpora with
VOCABULARIES WIDER THAN THE SKETCH plus planted heavy tokens — the
decrement/merge path and the pigeonhole candidate bound do real work —
and checks the two-pass plan still returns the exact heavy-hitter set
with exact counts. BM25 fuzz covers empty documents (dl = 0), docs
without any query term, tf ties, and block-layout invariance (the
per-batch MG summaries and local top-k must not depend on batching).
"""

from __future__ import annotations

import math
import random

import duckdb
import pandas as pd
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

import __ray_entry__ as entrymod


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    return df.sort_values(list(df.columns),
                          kind="mergesort").reset_index(drop=True)


def _check(query_name: str, tables: dict[str, pa.Table]) -> None:
    import ray.data

    from pdf_parser_ray.pipelines import queries as q

    orig = q.rel.load

    def fake_load(sf, t, columns=None):
        tbl = tables[t]
        return ray.data.from_arrow(tbl.select(columns) if columns else tbl)

    q.rel.load = fake_load
    try:
        ray_df = entrymod.queries()[query_name]("fuzz")
    finally:
        q.rel.load = orig
    con = duckdb.connect()
    for name, tbl in tables.items():
        con.register(name, tbl)
    sql_df = con.execute(entrymod.oracle_sql()[query_name]).df()
    a, b = _canon(pd.DataFrame(ray_df)), _canon(sql_df)
    assert list(a.columns) == list(b.columns)
    assert len(a) == len(b), f"{query_name}: {len(a)} != {len(b)}"
    for col in a.columns:
        for x, y in zip(a[col], b[col]):
            both_nan = (isinstance(x, float) and isinstance(y, float)
                        and math.isnan(x) and math.isnan(y))
            assert both_nan or repr(x) == repr(y), \
                f"{query_name}.{col}: {x!r} != {y!r}"


def _docs(texts: list[str]) -> pa.Table:
    return pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * len(texts), pa.string()),
        "source": pa.array(["src0"] * len(texts), pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })


def _wide_vocab_corpus(seed: int, n_docs: int, heavy: list[tuple[str, int]],
                       vocab: int = 400) -> list[str]:
    """Docs over a vocabulary wider than the MG sketch (400 > 64), with
    the given heavy tokens planted at the given per-doc repeat counts."""
    rng = random.Random(seed)
    texts = []
    for _ in range(n_docs):
        toks = [f"w{rng.randrange(vocab)}" for _ in range(rng.randrange(5, 40))]
        for tok, reps in heavy:
            toks.extend([tok] * reps)
        rng.shuffle(toks)
        texts.append(" ".join(toks))
    return texts


@pytest.mark.usefixtures("ray_session")
class TestHeavyHitters:
    def test_wide_vocab_planted_heavies(self):
        # ~400-token tail vocabulary forces MG decrements in every batch;
        # the two planted tokens dominate and MUST come back exactly
        texts = _wide_vocab_corpus(7, 60, [("hot", 30), ("warm", 12)])
        _check("docs_heavy_hitters", {"documents": _docs(texts)})

    def test_no_heavy_hitters_empty_result(self):
        # uniform wide vocabulary, nothing clears share > 1/40
        texts = _wide_vocab_corpus(11, 80, [])
        _check("docs_heavy_hitters", {"documents": _docs(texts)})

    def test_empty_and_whitespace_docs(self):
        texts = ["", "   ", "\t\n", "hot hot hot hot", "hot hot"]
        _check("docs_heavy_hitters", {"documents": _docs(texts)})

    def test_batch_layout_invariance(self):
        # the MG screen runs per batch: tiny blocks change every partial
        # summary, but the exact verify pass must erase the difference
        import ray.data

        from pdf_parser_ray.pipelines import queries as q

        texts = _wide_vocab_corpus(23, 50, [("hot", 25)])
        tbl = _docs(texts)
        orig = q.rel.load

        def load_blocks(n_blocks):
            def fake_load(sf, t, columns=None):
                t2 = tbl.select(columns) if columns else tbl
                return ray.data.from_arrow(t2).repartition(n_blocks)
            return fake_load

        outs = []
        for nb in (1, 7):
            q.rel.load = load_blocks(nb)
            try:
                outs.append(_canon(q.docs_heavy_hitters("fuzz")))
            finally:
                q.rel.load = orig
        pd.testing.assert_frame_equal(outs[0], outs[1])

    @settings(max_examples=5, deadline=None)
    @given(st.integers(min_value=0, max_value=10_000))
    def test_fuzz_guarantee(self, seed):
        rng = random.Random(seed)
        heavy = [("hot", rng.randrange(10, 40))] if rng.random() < 0.7 else []
        texts = _wide_vocab_corpus(seed, rng.randrange(20, 70), heavy,
                                   vocab=rng.randrange(80, 600))
        _check("docs_heavy_hitters", {"documents": _docs(texts)})


@pytest.mark.usefixtures("ray_session")
class TestBM25:
    def test_mixed_corpus(self):
        rng = random.Random(3)
        texts = []
        for i in range(60):
            toks = [f"w{rng.randrange(50)}" for _ in range(rng.randrange(0, 30))]
            toks += ["scan"] * rng.randrange(0, 5)
            toks += ["merge"] * rng.randrange(0, 3)
            rng.shuffle(toks)
            texts.append(" ".join(toks))
        # empty doc, whitespace doc, term-only doc, no-term doc
        texts += ["", "  \t ", "scan scan merge", "w1 w2 w3"]
        _check("docs_bm25_topk", {"documents": _docs(texts)})

    def test_absent_terms_score_zero(self):
        # no doc contains any query term: every score is exactly 0.0 and
        # the tie-break (doc_id) alone orders the top-k
        texts = [f"w{i} w{i + 1} w{i + 2}" for i in range(30)]
        _check("docs_bm25_topk", {"documents": _docs(texts)})

    def test_fewer_docs_than_k(self):
        texts = ["scan merge", "merge", "scan scan"]
        _check("docs_bm25_topk", {"documents": _docs(texts)})

    @settings(max_examples=5, deadline=None)
    @given(st.integers(min_value=0, max_value=10_000))
    def test_fuzz(self, seed):
        rng = random.Random(seed)
        texts = []
        for _ in range(rng.randrange(1, 80)):
            toks = ([f"w{rng.randrange(40)}"
                     for _ in range(rng.randrange(0, 25))]
                    + ["scan"] * rng.randrange(0, 4)
                    + ["merge"] * rng.randrange(0, 4))
            rng.shuffle(toks)
            texts.append(" ".join(toks))
        _check("docs_bm25_topk", {"documents": _docs(texts)})


@pytest.mark.usefixtures("ray_session")
class TestScriptMix:
    def test_unicode_classes(self):
        # NBSP is non-ASCII but NOT RE2 \s (ASCII-only class on both
        # engines); emoji are single codepoints under length(); CJK and
        # accents land in non_ascii only
        texts = [
            "hello world 123",
            "café naïve résumé",
            "你好世界 42",
            "a b c",            # NBSP-joined
            "tab\tnewline\nmix 7",
            "\U0001f600\U0001f680 rocket",
            "",
        ]
        tbl = pa.table({
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * len(texts), pa.string()),
            "source": pa.array(["s0", "s1", "s0", "s1", "s0", "s1", "s0"],
                               pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        })
        _check("docs_script_mix", {"documents": tbl})

    @settings(max_examples=5, deadline=None)
    @given(st.integers(min_value=0, max_value=10_000))
    def test_fuzz(self, seed):
        rng = random.Random(seed)
        alphabet = ("abcXYZ019 \t\n" + "é世 "
                    + "\U0001f600Жא")
        texts = ["".join(rng.choice(alphabet)
                         for _ in range(rng.randrange(0, 120)))
                 for _ in range(rng.randrange(1, 40))]
        tbl = pa.table({
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * len(texts), pa.string()),
            "source": pa.array([f"s{rng.randrange(3)}" for _ in texts],
                               pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        })
        _check("docs_script_mix", {"documents": tbl})


def _events(rows) -> pa.Table:
    import datetime as dt
    base = dt.datetime(2024, 3, 1)
    return pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([base + dt.timedelta(seconds=r[1]) for r in rows],
                       pa.timestamp("us")),
        "user_id": pa.array([r[2] for r in rows], pa.int64()),
        "event_type": pa.array([r[3] for r in rows], pa.string()),
        "value": pa.array([r[4] for r in rows], pa.float64()),
        "props": pa.array(["{}"] * len(rows), pa.string()),
    })


@pytest.mark.usefixtures("ray_session")
class TestWatermarkDrops:
    def test_out_of_order_stream(self):
        # arrival order != event-time order: plant events far behind
        rng = random.Random(5)
        rows = []
        for i in range(300):
            sec = i * 30 + rng.randrange(-120, 120)
            if rng.random() < 0.08:
                sec -= 1200  # way late: beyond the 10-min allowance
            rows.append((i, sec, rng.randrange(5),
                         rng.choice(["click", "view", "purchase"]), 1.0))
        _check("events_watermark_drops", {"events": _events(rows)})

    def test_exact_boundary_not_dropped(self):
        # lag == exactly 10 min: ts = hw - 600s is NOT < hw - 600s
        rows = [(0, 1000, 1, "click", 1.0),
                (1, 400, 1, "click", 1.0),     # exactly 600 behind: kept
                (2, 399, 1, "view", 1.0),      # 601 behind: dropped
                (3, 1000, 2, "view", 1.0)]     # ties with the watermark
        _check("events_watermark_drops", {"events": _events(rows)})

    def test_sparse_event_ids(self):
        # holes in the id space: buckets go uneven, carry still exact
        rows = [(i * 977, (i * 37) % 500, 1, "click", 1.0)
                for i in range(100)]
        _check("events_watermark_drops", {"events": _events(rows)})

    @settings(max_examples=5, deadline=None)
    @given(st.integers(min_value=0, max_value=10_000))
    def test_fuzz(self, seed):
        rng = random.Random(seed)
        n = rng.randrange(1, 400)
        rows = [(i, rng.randrange(0, 3000), rng.randrange(4),
                 rng.choice(["click", "view", "purchase", "error"]),
                 float(rng.randrange(100)))
                for i in range(n)]
        _check("events_watermark_drops", {"events": _events(rows)})


@pytest.mark.usefixtures("ray_session")
class TestExactMedian:
    def _events_vals(self, vals):
        import datetime as dt
        base = dt.datetime(2024, 3, 1)
        n = len(vals)
        return pa.table({
            "event_id": pa.array(range(n), pa.int64()),
            "ts": pa.array([base] * n, pa.timestamp("us")),
            "user_id": pa.array([1] * n, pa.int64()),
            "event_type": pa.array(["click"] * n, pa.string()),
            "value": pa.array(vals, pa.float64()),
            "props": pa.array(["{}"] * n, pa.string()),
        })

    def test_negatives_and_zero(self):
        _check("events_value_exact_median",
               {"events": self._events_vals(
                   [-3.5, -1.25, 0.0, 2.5, 7.75, -100.0])})

    def test_ties_and_odd(self):
        _check("events_value_exact_median",
               {"events": self._events_vals([5.0, 5.0, 5.0, 1.0, 9.0])})

    def test_single_row(self):
        _check("events_value_exact_median",
               {"events": self._events_vals([42.125])})

    def test_extreme_magnitudes(self):
        _check("events_value_exact_median",
               {"events": self._events_vals(
                   [1e-308, 1e308, -1e308, 3.0])})

    @settings(max_examples=6, deadline=None)
    @given(st.integers(min_value=0, max_value=10_000))
    def test_fuzz(self, seed):
        rng = random.Random(seed)
        n = rng.randrange(1, 300)
        vals = [rng.choice([-1, 1]) * rng.random()
                * 10 ** rng.randrange(-3, 6) for _ in range(n)]
        # sprinkle exact ties
        for _ in range(min(10, n // 3)):
            vals[rng.randrange(n)] = vals[rng.randrange(n)]
        _check("events_value_exact_median", {"events": self._events_vals(vals)})

    def test_nulls_excluded_but_counted(self):
        # quantile_cont ignores NULLs; count(*) does not — both engines
        vals = [5.0, None, 1.0, None, 9.0, 3.0]
        _check("events_value_exact_median",
               {"events": self._events_vals(vals)})

    def test_all_null(self):
        _check("events_value_exact_median",
               {"events": self._events_vals([None, None])})


@pytest.mark.usefixtures("ray_session")
class TestNtileShards:
    def _docs_lengths(self, lengths):
        return pa.table({
            "doc_id": pa.array(range(len(lengths)), pa.int64()),
            "text": pa.array(["x" * 3] * len(lengths), pa.string()),
            "lang": pa.array(["en"] * len(lengths), pa.string()),
            "source": pa.array(["s"] * len(lengths), pa.string()),
            "n_chars": pa.array(lengths, pa.int64()),
        })

    def test_fewer_rows_than_tiles(self):
        _check("docs_ntile_shards", {"documents": self._docs_lengths([7, 3, 9])})

    def test_all_tied_lengths(self):
        # one tie group spans every tile boundary: in-group doc_id rank
        # alone decides the tile
        _check("docs_ntile_shards",
               {"documents": self._docs_lengths([50] * 23)})

    def test_uneven_fill(self):
        # n % k != 0: the first n%k tiles take the extra row
        _check("docs_ntile_shards",
               {"documents": self._docs_lengths(list(range(100, 73, -1)))})

    @settings(max_examples=6, deadline=None)
    @given(st.integers(min_value=0, max_value=10_000))
    def test_fuzz(self, seed):
        rng = random.Random(seed)
        n = rng.randrange(1, 200)
        lengths = [rng.randrange(1, rng.choice([5, 50, 500]))
                   for _ in range(n)]
        _check("docs_ntile_shards",
               {"documents": self._docs_lengths(lengths)})


@pytest.mark.usefixtures("ray_session")
class TestGroupedMedian:
    @settings(max_examples=6, deadline=None)
    @given(st.integers(min_value=0, max_value=10_000))
    def test_fuzz(self, seed):
        import datetime as dt
        rng = random.Random(seed)
        base = dt.datetime(2024, 3, 1)
        n = rng.randrange(1, 300)
        rows = [(i, rng.choice(["a", "b", "c", "d"]),
                 rng.choice([-1, 1]) * rng.random()
                 * 10 ** rng.randrange(-2, 5)) for i in range(n)]
        tbl = pa.table({
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([base] * n, pa.timestamp("us")),
            "user_id": pa.array([1] * n, pa.int64()),
            "event_type": pa.array([r[1] for r in rows], pa.string()),
            "value": pa.array([r[2] for r in rows], pa.float64()),
            "props": pa.array(["{}"] * n, pa.string()),
        })
        _check("events_value_median_by_type", {"events": tbl})

    def test_null_values_in_groups(self):
        import datetime as dt
        base = dt.datetime(2024, 3, 1)
        types = ["a", "a", "a", "b", "b", "c"]
        vals = [1.5, None, 7.5, None, None, 4.25]   # c all-valid, b all-null
        tbl = pa.table({
            "event_id": pa.array(range(6), pa.int64()),
            "ts": pa.array([base] * 6, pa.timestamp("us")),
            "user_id": pa.array([1] * 6, pa.int64()),
            "event_type": pa.array(types, pa.string()),
            "value": pa.array(vals, pa.float64()),
            "props": pa.array(["{}"] * 6, pa.string()),
        })
        _check("events_value_median_by_type", {"events": tbl})

    def test_single_row_groups(self):
        import datetime as dt
        base = dt.datetime(2024, 3, 1)
        tbl = pa.table({
            "event_id": pa.array([0, 1], pa.int64()),
            "ts": pa.array([base] * 2, pa.timestamp("us")),
            "user_id": pa.array([1, 1], pa.int64()),
            "event_type": pa.array(["only_a", "only_b"], pa.string()),
            "value": pa.array([-7.25, 0.0], pa.float64()),
            "props": pa.array(["{}"] * 2, pa.string()),
        })
        _check("events_value_median_by_type", {"events": tbl})


@pytest.mark.usefixtures("ray_session")
class TestWeightedMedian:
    @settings(max_examples=6, deadline=None)
    @given(st.integers(min_value=0, max_value=10_000))
    def test_fuzz(self, seed):
        import datetime as dt
        rng = random.Random(seed)
        n = rng.randrange(1, 200)
        prices = [round(rng.random() * 10 ** rng.randrange(1, 5), 2)
                  for _ in range(n)]
        # force price ties so groups carry summed weights
        for _ in range(n // 3):
            prices[rng.randrange(n)] = prices[rng.randrange(n)]
        tbl = pa.table({
            "l_orderkey": pa.array(range(n), pa.int64()),
            "l_partkey": pa.array([1] * n, pa.int64()),
            "l_suppkey": pa.array([1] * n, pa.int64()),
            "l_linenumber": pa.array([1] * n, pa.int64()),
            "l_quantity": pa.array(
                [float(rng.randrange(1, 51))
                 + rng.choice([0.0, 0.0, 0.5, 0.25])  # fractional: CAST
                 for _ in range(n)],                   # rounds half-even
                pa.float64()),
            "l_extendedprice": pa.array(prices, pa.float64()),
            "l_discount": pa.array([0.0] * n, pa.float64()),
            "l_tax": pa.array([0.0] * n, pa.float64()),
            "l_returnflag": pa.array(["N"] * n, pa.string()),
            "l_linestatus": pa.array(["O"] * n, pa.string()),
            "l_shipdate": pa.array([dt.datetime(2024, 1, 1)] * n,
                                   pa.timestamp("us")),
            "l_commitdate": pa.array([dt.datetime(2024, 1, 1)] * n,
                                     pa.timestamp("us")),
            "l_receiptdate": pa.array([dt.datetime(2024, 1, 1)] * n,
                                      pa.timestamp("us")),
            "l_shipmode": pa.array(["MAIL"] * n, pa.string()),
        })
        _check("lineitem_weighted_median_price", {"lineitem": tbl})


@pytest.mark.usefixtures("ray_session")
class TestPercentilesExact:
    @settings(max_examples=8, deadline=None)
    @given(st.integers(min_value=0, max_value=10_000))
    def test_fuzz(self, seed):
        import datetime as dt
        rng = random.Random(seed)
        base = dt.datetime(2024, 3, 1)
        n = rng.randrange(1, 250)
        vals = [None if rng.random() < 0.1 else
                rng.choice([-1, 1]) * rng.random()
                * 10 ** rng.randrange(-2, 5) for i in range(n)]
        if all(v is None for v in vals):
            vals[0] = 1.0
        tbl = pa.table({
            "event_id": pa.array(range(n), pa.int64()),
            "ts": pa.array([base] * n, pa.timestamp("us")),
            "user_id": pa.array([1] * n, pa.int64()),
            "event_type": pa.array(["click"] * n, pa.string()),
            "value": pa.array(vals, pa.float64()),
            "props": pa.array(["{}"] * n, pa.string()),
        })
        _check("events_value_percentiles_exact", {"events": tbl})


@pytest.mark.usefixtures("ray_session")
class TestRetrievalModule:
    """stages/retrieval.bm25_topk with ARBITRARY terms (the oracle only
    pins the fixed 3-term query): verified against a brute-force python
    reference on random corpora."""

    @settings(max_examples=5, deadline=None)
    @given(st.integers(min_value=0, max_value=10_000))
    def test_vs_bruteforce(self, seed):
        import math

        import ray.data

        from pdf_parser_ray.stages.retrieval import bm25_topk

        rng = random.Random(seed)
        vocab = [f"w{i}" for i in range(12)]
        texts = [" ".join(rng.choice(vocab)
                          for _ in range(rng.randrange(0, 30)))
                 for _ in range(rng.randrange(2, 50))]
        terms = tuple(rng.sample(vocab, rng.randrange(1, 4)))
        k = rng.randrange(1, 10)
        tbl = pa.table({
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        })
        got = bm25_topk(ray.data.from_arrow(tbl).repartition(3), terms, k)

        # brute force (same formula, same written-order adds)
        n = len(texts)
        toks = [t.split() for t in texts]
        dl = [len(x) for x in toks]
        avgdl = sum(dl) / n
        scores = []
        for d in range(n):
            s = 0.0
            for t in terms:
                df = sum(1 for x in toks if t in x)
                idf = math.log((n - df + 0.5) / (df + 0.5) + 1)
                tf = toks[d].count(t)
                s = s + (idf * (tf * 2.2)) / (
                    tf + 1.2 * (0.25 + (0.75 * dl[d]) / avgdl))
            scores.append(round_ref(s))
        order = sorted(range(n), key=lambda d: (-scores[d], d))[:k]
        want = pd.DataFrame({
            "doc_id": pd.Series(sorted(order), dtype="int64"),
            "bm25": pd.Series([scores[d] for d in sorted(order)],
                              dtype="float64")})
        pd.testing.assert_frame_equal(got.reset_index(drop=True), want)


def round_ref(x: float) -> float:
    """Half-away rounding to 4, matching num.np_round_half_away."""
    import numpy as np

    from pdf_parser_ray.functions.num import np_round_half_away
    return float(np_round_half_away(np.array([x]), 4)[0])


class TestRoundingBand:
    """floor(y+0.5) vs C round(y) divergence band [2^52, 2^53): the
    round-4g ANOVA fuzz caught an F ~ 8.6e9 whose 6-decimal scaling
    lands inside it (odd integral doubles got bumped +1 vs DuckDB)."""

    def test_band_matches_duckdb(self):
        import duckdb

        from pdf_parser_ray.functions.num import (
            np_round_half_away,
            round_half_away,
        )

        cases = [8567963952.9259253,        # the caught F statistic
                 (float((1 << 52) + 1)) / 1e6,   # odd integral, in band
                 (float((1 << 52) + 2)) / 1e6,   # even integral, in band
                 float((1 << 53) + 2) / 1e6,     # past the band
                 4503599627370495.5 / 1e6,       # just below the band
                 -8567963952.9259253]
        con = duckdb.connect()
        for x in cases:
            want = con.execute(
                "SELECT round(CAST(? AS DOUBLE), 6)", [x]).fetchone()[0]
            assert repr(round_half_away(x, 6)) == repr(want), x
            assert repr(float(np_round_half_away([x], 6)[0])) \
                == repr(want), x

    def test_small_values_unchanged(self):
        from pdf_parser_ray.functions.num import round_half_away

        assert round_half_away(0.03125, 4) == 0.0313   # half away, not even
        assert round_half_away(-0.03125, 4) == -0.0313
        assert round_half_away(2.5, 0) == 3.0
