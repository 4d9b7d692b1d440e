"""Cross-parallelism determinism for the session-3 operators: every
pipeline must return identical frames whether the input arrives as one
block or many (map-side combiners, broadcast sets and groupby finishers
must not depend on block boundaries)."""

from __future__ import annotations

import datetime as dt

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

_FILL = "the and of to in the and of to in the and of to in"


def _docs_table() -> pa.Table:
    run_a = " ".join(f"p{i}" for i in range(8))
    run_b = " ".join(f"s{i}" for i in range(8))
    texts = []
    for j in range(12):
        # span-sharing docs that pass the quality gate, plus PII
        texts.append(f"{run_a} {_FILL} u{j} {run_b} {_FILL} a@b.co 123456789")
    texts.append(texts[0])            # exact duplicate
    texts.extend(["tiny junk", "", "x y z"])  # gate-failing docs
    return pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * len(texts), pa.string()),
        "source": pa.array(["inv"] * len(texts), pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })


def _events_table() -> pa.Table:
    base = dt.datetime(2024, 3, 1)
    n = 200
    rng = np.random.RandomState(3)
    return pa.table({
        "event_id": pa.array(range(n), pa.int64()),
        "ts": pa.array([base + dt.timedelta(seconds=int(s))
                        for s in rng.randint(0, 5000, n)],
                       pa.timestamp("us")),
        "user_id": pa.array(rng.randint(1, 6, n), pa.int64()),
        "event_type": pa.array(
            [["click", "view", "error"][i % 3] for i in range(n)],
            pa.string()),
        "value": pa.array((rng.randint(0, 10000, n) / 100.0), pa.float64()),
        "props": pa.array(['{"k": 1}'] * n, pa.string()),
    })


def _emb_table() -> pa.Table:
    rng = np.random.RandomState(5)
    base = rng.standard_normal((40, 8))
    mat = np.vstack([base, base[:6] + 1e-5 * rng.standard_normal((6, 8))])
    return pa.table({
        "vec_id": pa.array(range(len(mat)), pa.int64()),
        "embedding": pa.array(mat.tolist(), pa.list_(pa.float64())),
        "label": pa.array((np.arange(len(mat)) % 3).astype(np.int32),
                          pa.int32()),
    })


def _orders_table() -> pa.Table:
    base = dt.datetime(2024, 3, 1)
    n = 120
    rng = np.random.RandomState(7)
    return pa.table({
        "o_orderkey": pa.array(range(n), pa.int64()),
        "o_custkey": pa.array(rng.randint(0, 15, n), pa.int64()),
        "o_orderdate": pa.array(
            [base + dt.timedelta(days=int(d)) for d in rng.randint(0, 9, n)],
            pa.timestamp("us")),
        "o_totalprice": pa.array(rng.randint(100, 900000, n) / 100.0,
                                 pa.float64()),
        "o_orderpriority": pa.array(
            [f"{1 + i % 5}-P" for i in range(n)], pa.string()),
    })


def _lineitem_table() -> pa.Table:
    # 1996-03 ship dates: inside q7's [1996, 1998) band AND q15's
    # [1996-01, 1996-04) quarter
    base = dt.datetime(1996, 3, 1)
    n = 300
    rng = np.random.RandomState(11)
    okey = rng.randint(0, 120, n)
    qty = rng.randint(1, 51, n).astype(np.float64)
    # pin a handful of heavy orders so q18's >250-qty gate binds
    okey[:12] = 0
    qty[:12] = 50.0
    okey[12:20] = 1
    qty[12:20] = 45.0
    return pa.table({
        "l_orderkey": pa.array(okey, pa.int64()),
        "l_partkey": pa.array(rng.randint(0, 30, n), pa.int64()),
        "l_suppkey": pa.array(rng.randint(0, 10, n), pa.int64()),
        "l_quantity": pa.array(qty, pa.float64()),
        "l_extendedprice": pa.array(
            rng.randint(100, 900000, n) / 100.0, pa.float64()),
        "l_discount": pa.array(rng.randint(0, 11, n) / 100.0,
                               pa.float64()),
        "l_tax": pa.array(rng.randint(0, 9, n) / 100.0, pa.float64()),
        "l_linenumber": pa.array(
            (1 + rng.randint(0, 4, n)).astype(np.int32), pa.int32()),
        "l_returnflag": pa.array(
            [["A", "N", "R"][i % 3] for i in range(n)], pa.string()),
        "l_linestatus": pa.array(
            [["F", "O"][i % 2] for i in range(n)], pa.string()),
        "l_shipdate": pa.array(
            [base + dt.timedelta(days=int(d))
             for d in rng.randint(0, 20, n)],
            pa.timestamp("us")),
    })


def _region_table() -> pa.Table:
    return pa.table({
        "r_regionkey": pa.array(range(3), pa.int64()),
        "r_name": pa.array([f"REGION_{i}" for i in range(3)], pa.string()),
    })


def _nation_table() -> pa.Table:
    return pa.table({
        "n_nationkey": pa.array(range(10), pa.int64()),
        "n_name": pa.array([f"NATION_{i}" for i in range(10)], pa.string()),
        "n_regionkey": pa.array([i % 3 for i in range(10)], pa.int64()),
    })


def _supplier_table() -> pa.Table:
    rng = np.random.RandomState(13)
    return pa.table({
        "s_suppkey": pa.array(range(10), pa.int64()),
        "s_name": pa.array([f"Supplier#{i:09d}" for i in range(10)],
                           pa.string()),
        "s_nationkey": pa.array(rng.randint(0, 10, 10).astype(np.int32),
                                pa.int32()),
        "s_acctbal": pa.array(rng.randint(0, 90000, 10) / 100.0,
                              pa.float64()),
    })


def _customer_table() -> pa.Table:
    rng = np.random.RandomState(17)
    # custkeys 15..19 never appear in orders (o_custkey < 15), so the
    # q22 idle anti-join keeps rows; balances span negative..high so
    # the above-average gate binds on both sides
    n = 20
    return pa.table({
        "c_custkey": pa.array(range(n), pa.int64()),
        "c_name": pa.array([f"Customer#{i:09d}" for i in range(n)],
                           pa.string()),
        "c_nationkey": pa.array(rng.randint(0, 10, n).astype(np.int32),
                                pa.int32()),
        "c_acctbal": pa.array(
            (rng.randint(-100000, 900000, n) / 100.0), pa.float64()),
        "c_mktsegment": pa.array(
            [["BUILDING", "MACHINERY", "AUTOMOBILE"][i % 3]
             for i in range(n)], pa.string()),
    })


def _part_table() -> pa.Table:
    rng = np.random.RandomState(19)
    n = 30
    brands = [f"Brand#{b}" for b in (12, 23, 34, 45, 55)]
    types = ["STANDARD", "PROMO", "ECONOMY"]
    return pa.table({
        "p_partkey": pa.array(range(n), pa.int64()),
        "p_brand": pa.array([brands[i % 5] for i in range(n)], pa.string()),
        "p_type": pa.array([types[i % 3] for i in range(n)], pa.string()),
        "p_size": pa.array(rng.randint(1, 40, n).astype(np.int32),
                           pa.int32()),
        "p_retailprice": pa.array(rng.randint(100, 900000, n) / 100.0,
                                  pa.float64()),
    })


_TABLES = {"documents": _docs_table, "events": _events_table,
           "embeddings": _emb_table, "orders": _orders_table,
           "lineitem": _lineitem_table, "nation": _nation_table,
           "supplier": _supplier_table, "customer": _customer_table,
           "part": _part_table, "region": _region_table}

_OPS = ["docs_dup_spans", "docs_cut_dup_spans", "docs_postings",
        "docs_token_lift", "docs_clean_corpus", "events_latest_snapshot",
        "events_value_percent_rank", "events_type_value_stats",
        "emb_dedup_keep", "docs_bin_pack", "emb_normalize",
        "events_interarrival", "docs_anchor_positive",
        "docs_charclass_profile", "events_debounce", "docs_bpe_pretokens",
        "docs_pagerank", "docs_triangles", "events_users_kmv",
        "docs_bigram_fluency", "docs_dsir_weights", "emb_gram_matrix",
        "emb_knn_graph", "emb_snn_keep", "docs_bpe_merges",
        "emb_label_prop", "docs_weighted_sample",
        "events_hourly_pivot", "events_user_top_type",
        "events_type_affinity", "docs_token_entropy",
        "orders_running_revenue", "events_markov",
        "docs_split_leakage_safe", "events_user_gini",
        "docs_shuffle_shards", "docs_quality_buckets", "customer_rfm",
        "orders_open_backlog", "docs_dup_rate_by_source",
        "events_hour_profile_z", "emb_quantize_error",
        "events_user_lifespan", "orders_fanout_profile",
        "docs_ngram_diversity", "docs_prefix_families",
        "emb_half_drift", "events_user_burstiness",
        "events_type_drift", "docs_zipf_slope", "docs_containment_pairs",
        "docs_source_cap", "events_top_paths", "docs_score_auc_dup",
        "events_user_streaks", "docs_top_quality_per_source",
        "emb_diversity", "events_winsorized_stats",
        "docs_cross_source_dups", "docs_oov_rate",
        "events_trending_types", "orders_dow_seasonality",
        "docs_lang_purity", "docs_dup_degree_profile",
        "customer_order_gaps", "events_error_rate_ci",
        "docs_score_length_bias", "orders_benford_profile",
        "q7_trade_volume", "q8_market_share",
        "q13_order_count_distribution", "q18_large_orders",
        "q19_discounted_revenue", "lineitem_basket_pairs",
        "events_first_touch", "emb_dim_stats", "docs_pmi_pairs",
        "q15_top_supplier", "q17_small_qty_revenue", "q22_idle_balance",
        "docs_heaps_law", "supplier_revenue_pareto",
        "docs_dup_cluster_sizes", "events_ab_lift", "events_bot_minutes",
        "events_peak_hour", "orders_monthly_growth", "orders_ship_latency",
        "customer_nation_matrix", "lineitem_tax_profile",
        "docs_keyword_hits", "orders_priority_year_share",
        "events_new_vs_returning", "emb_pair_hist",
        "docs_exactdup_savings", "docs_hapax_rate",
        "events_session_length_hist", "part_cheapest_supplier",
        "orders_cohort_ltv", "supplier_discount_deviation",
        "region_revenue_share", "events_error_burst_sessions",
        "orders_key_continuity", "part_type_price_index",
        "customer_spend_balance_corr", "lineitem_position_stats",
        "events_type_transition_entropy", "daily_activity_overlay",
        "orders_lineitem_reconcile", "events_value_magnitude_hist",
        "docs_pipeline_yield", "docs_token_len_hist",
        "events_type_time_coverage", "docs_quality_gate_attribution",
        "events_session_gap_sensitivity", "events_props_k_hist",
        "part_type_supplier_counts", "supplier_catalog_breadth",
        "events_type_dow_matrix", "lineitem_discount_uplift",
        "docs_source_median_chars", "events_power_users_share",
        "docs_quality_metric_hist", "docs_token_coverage_curve",
        "docs_bigram_entropy_rate", "events_session_value",
        "supplier_price_dispersion", "docs_simpson_index",
        "lineitem_qty_mode", "events_user_count_mad",
        "events_rate_limit_sim", "docs_field_completeness",
        "events_first_week_activation", "docs_dup_threshold_sweep",
        "orders_customer_repeat_rate", "docs_top_dup_families",
        "customer_single_order_by_nation", "docs_shingle_df_hist",
        "lineitem_price_qty_ols", "events_type_dow_chisq",
        "lineitem_qty_discount_spearman", "lineitem_charge_unpivot",
        "events_hourly_autocorr", "events_cumulative_users",
        "events_cusum_shift", "lineitem_qty_discount_kendall",
        "lineitem_status_cube", "q9_profit_by_nation_year",
        "docs_readability", "events_acf_grid",
        "q11_important_parts", "q20_dominant_suppliers",
        "q21_last_shippers", "lineitem_qty_discount_theilsen",
        "lineitem_abc_class", "events_overdispersion",
        "events_user_type_breadth", "events_revenue_trend",
        "events_weekend_lift", "emb_covariance",
        "customer_segment_welch_matrix", "events_revenue_ewma",
        "orders_seasonal_index", "orders_top_decile_share",
        "part_price_competition", "events_revenue_runs_test",
        "docs_emb_length_norm_corr", "events_session_abandonment",
        "customer_nation_anova", "customer_balance_jackknife",
        "docs_lang_source_cramers_v", "lineitem_tax_discount_grid",
        "events_dayn_retention", "events_hourly_type_entropy",
        "part_size_price_corr", "part_skyline",
        "events_max_concurrency",
        # round-4g additions: selection family, retrieval, streaming,
        # range sharding (heavy hitters has its own dedicated
        # layout-invariance test in test_round4g_fuzz.py)
        "docs_bm25_topk", "docs_script_mix", "events_watermark_drops",
        "events_value_exact_median", "events_value_median_by_type",
        "events_value_percentiles_exact", "docs_ntile_shards",
        "lineitem_weighted_median_price"]
# events_error_pchart flags no hour on the shared fixture (uniform error
# mix -> everything inside the 3-sigma band), so it gets a dedicated
# invariance table below with one saturated-error hour.
# events_conversion_lag_hist needs purchase events and
# events_retention_km needs a multi-day span with uncensored users;
# the shared events fixture (one day, no purchases) satisfies neither,
# so each gets a dedicated invariance test below.
# events_value_ks_test / events_value_mannwhitney need purchase events;
# the shared fixture has none, so they get a dedicated table below.
# orders_top_growth_customers pins years 1996/1997; the shared orders
# fixture lives in 2024, so it gets a dedicated invariance test below.
# docs_source_vocab_jaccard needs >= 2 sources to emit pairs; the shared
# docs fixture is single-source, so it gets a dedicated table below.


def _run(op: str, n_blocks: int) -> pd.DataFrame:
    import ray.data

    from pdf_parser_ray.pipelines import queries as q

    def load(sf, table, columns=None):
        tbl = _TABLES[table]()
        ds = ray.data.from_arrow(tbl.select(columns) if columns else tbl)
        return ds.repartition(n_blocks)

    orig = q.rel.load
    q.rel.load = load
    try:
        out = getattr(q, op)("inv")
    finally:
        q.rel.load = orig
    return out.reset_index(drop=True)


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("op", _OPS)
def test_block_boundary_invariance(op):
    a = _run(op, 1)
    b = _run(op, 7)
    pd.testing.assert_frame_equal(a, b)
    assert len(a) > 0


@pytest.mark.usefixtures("ray_session")
def test_norm_outliers_band_and_invariance():
    # 46 vectors is too few for the default 1%/99% band to bind (the
    # rank rule pins lo=min, hi=max), so exercise a 10/90 band: both
    # sides must flag, frames must be block-boundary invariant, and
    # every flagged norm must sit strictly outside the band interior
    import ray.data

    from pdf_parser_ray.pipelines import queries as q

    def run(n_blocks):
        def load(sf, table, columns=None):
            tbl = _TABLES[table]()
            return ray.data.from_arrow(
                tbl.select(columns) if columns else tbl
            ).repartition(n_blocks)

        orig = q.rel.load
        q.rel.load = load
        try:
            return q.emb_norm_outliers("inv", lo_q=0.1, hi_q=0.9
                                       ).reset_index(drop=True)
        finally:
            q.rel.load = orig

    a, b = run(1), run(7)
    pd.testing.assert_frame_equal(a, b)
    assert set(a["side"]) == {"low", "high"}
    assert len(a) > 0


@pytest.mark.usefixtures("ray_session")
def test_source_cap_binds_and_ranks_contiguous():
    # 16 harness docs share one source; cap=10 must keep exactly 10
    # with sampling ranks 1..10 (dense, deterministic md5 order)
    df = _run("docs_source_cap", 5)
    assert len(df) == 10
    assert sorted(df["rk"]) == list(range(1, 11))
    # deterministic: the same 10 doc_ids at any parallelism
    df2 = _run("docs_source_cap", 1)
    assert set(df["doc_id"]) == set(df2["doc_id"])


@pytest.mark.usefixtures("ray_session")
def test_leakage_safe_split_keeps_twins_together():
    # docs 0 and 12 are exact duplicates (same text) -> same near-dup
    # cluster -> MUST share group_key and split; that is the whole
    # point of keying the split hash on the cluster representative
    df = _run("docs_split_leakage_safe", 5).set_index("doc_id")
    assert df.loc[0, "group_key"] == df.loc[12, "group_key"]
    assert df.loc[0, "split"] == df.loc[12, "split"]
    # and both split labels actually occur over the corpus domain
    assert set(df["split"]) <= {"train", "val"}


@pytest.mark.usefixtures("ray_session")
def test_running_revenue_hot_day_split_exact():
    # force the hot-day sub-split path (split_cap=4 -> every day splits
    # into orderkey ranges): results must be IDENTICAL to the default
    # single-part-per-day plan for any bounds, at any parallelism
    from pdf_parser_ray.pipelines import queries as q

    base = _run("orders_running_revenue", 5)
    import ray.data

    def load(sf, table, columns=None):
        tbl = _TABLES[table]()
        return ray.data.from_arrow(
            tbl.select(columns) if columns else tbl).repartition(5)

    orig = q.rel.load
    q.rel.load = load
    try:
        split = q.orders_running_revenue("inv", split_cap=4)
    finally:
        q.rel.load = orig
    pd.testing.assert_frame_equal(base, split.reset_index(drop=True))


@pytest.mark.usefixtures("ray_session")
def test_wau_hll_accuracy_and_invariance():
    # the sketch path must (a) be block-boundary invariant (registers
    # are value-set functions) and (b) track the exact WAU within the
    # p=12 HLL error envelope on the harness events table
    from pdf_parser_ray.pipelines import queries as q

    a = _run("events_wau_hll", 1)
    b = _run("events_wau_hll", 7)
    pd.testing.assert_frame_equal(a, b)
    exact = _run("events_dau_wau", 3).set_index("day")["wau"]
    est = a.set_index("day")["wau_est"]
    assert set(est.index) == set(exact.index)
    for d in exact.index:
        rel_err = abs(est[d] - exact[d]) / max(1, exact[d])
        assert rel_err <= 0.1, (d, est[d], exact[d])


@pytest.mark.usefixtures("ray_session")
def test_source_vocab_jaccard_invariance():
    # two overlapping + one disjoint source: the pair rows must be
    # identical across block splits and the disjoint pair ABSENT
    import ray.data

    from pdf_parser_ray.pipelines import queries as q

    tbl = pa.table({
        "source": pa.array(["s1", "s1", "s2", "s3"], pa.string()),
        "text": pa.array(["a b c", "c d", "b c e", "zz qq"], pa.string()),
    })

    def run(n_blocks):
        def load(sf, table, columns=None):
            return ray.data.from_arrow(
                tbl.select(columns) if columns else tbl
            ).repartition(n_blocks)

        orig = q.rel.load
        q.rel.load = load
        try:
            return q.docs_source_vocab_jaccard("inv").reset_index(drop=True)
        finally:
            q.rel.load = orig

    a, b = run(1), run(4)
    pd.testing.assert_frame_equal(a, b)
    assert list(a["source_a"]) == ["s1"] and list(a["source_b"]) == ["s2"]
    # s1 vocab {a,b,c,d}, s2 vocab {b,c,e}: i=2, union=5 -> 400000 ppm
    assert list(a["n_shared"]) == [2]
    assert list(a["jaccard_ppm"]) == [400000]


@pytest.mark.usefixtures("ray_session")
def test_top_growth_customers_invariance():
    import ray.data

    from pdf_parser_ray.pipelines import queries as q

    rng = np.random.RandomState(23)
    n = 80
    tbl = pa.table({
        "o_custkey": pa.array(rng.randint(0, 12, n), pa.int64()),
        "o_orderdate": pa.array(
            [dt.datetime(1996 + int(y), 1 + int(m), 3)
             for y, m in zip(rng.randint(0, 2, n), rng.randint(0, 12, n))],
            pa.timestamp("us")),
        "o_totalprice": pa.array(rng.randint(100, 900000, n) / 100.0,
                                 pa.float64()),
    })

    def run(n_blocks):
        def load(sf, table, columns=None):
            return ray.data.from_arrow(
                tbl.select(columns) if columns else tbl
            ).repartition(n_blocks)

        orig = q.rel.load
        q.rel.load = load
        try:
            return q.orders_top_growth_customers("inv") \
                .reset_index(drop=True)
        finally:
            q.rel.load = orig

    a, b = run(1), run(6)
    pd.testing.assert_frame_equal(a, b)
    assert len(a) > 0
    assert list(a["growth_ppm"]) == sorted(a["growth_ppm"], reverse=True)


@pytest.mark.usefixtures("ray_session")
def test_ks_mannwhitney_invariance():
    # two-sample value tests: histogram combine must be block-invariant
    # and the exact-int walk deterministic; purchase values strictly
    # above click values pin KS near 1e6 ppm and AUC near 0 ppm
    import ray.data

    from pdf_parser_ray.pipelines import queries as q

    base = dt.datetime(2024, 3, 1)
    n = 60
    tbl = pa.table({
        "event_type": pa.array(
            ["click" if i % 2 == 0 else "purchase" for i in range(n)],
            pa.string()),
        "ts": pa.array([base + dt.timedelta(seconds=i) for i in range(n)],
                       pa.timestamp("us")),
        "value": pa.array(
            [float(i % 7) if i % 2 == 0 else 100.0 + (i % 5)
             for i in range(n)], pa.float64()),
    })

    def run(op, n_blocks):
        def load(sf, table, columns=None):
            return ray.data.from_arrow(
                tbl.select(columns) if columns else tbl
            ).repartition(n_blocks)

        orig = q.rel.load
        q.rel.load = load
        try:
            return getattr(q, op)("inv").reset_index(drop=True)
        finally:
            q.rel.load = orig

    for op in ("events_value_ks_test", "events_value_mannwhitney",
               "events_value_welch_t"):
        a, b = run(op, 1), run(op, 5)
        pd.testing.assert_frame_equal(a, b)
        assert len(a) == 1
    ks = run("events_value_ks_test", 3)
    assert int(ks["ks_ppm"][0]) == 1_000_000      # disjoint supports
    mw = run("events_value_mannwhitney", 3)
    assert int(mw["auc_ppm"][0]) == 0             # every click < purchase


@pytest.mark.usefixtures("ray_session")
def test_conversion_lag_invariance():
    # first-click -> first-purchase lags: the conditional-min fold must
    # be block-invariant; user 0 converts in exactly 90 minutes, user 1
    # purchases before clicking and must drop
    import ray.data

    from pdf_parser_ray.pipelines import queries as q

    base = dt.datetime(2024, 3, 1)
    rows = [
        (0, 0, "click"), (0, 30, "click"), (0, 90, "purchase"),
        (0, 200, "purchase"),
        (1, 10, "purchase"), (1, 50, "click"),
        (2, 5, "view"), (2, 6, "click"),            # never converts
        (3, 0, "click"), (3, 90, "purchase"),       # same bucket as 0
    ]
    tbl = pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([base + dt.timedelta(minutes=r[1]) for r in rows],
                       pa.timestamp("us")),
        "event_type": pa.array([r[2] for r in rows], pa.string()),
    })

    def run(n_blocks):
        def load(sf, table, columns=None):
            return ray.data.from_arrow(
                tbl.select(columns) if columns else tbl
            ).repartition(n_blocks)

        orig = q.rel.load
        q.rel.load = load
        try:
            return q.events_conversion_lag_hist("inv").reset_index(
                drop=True)
        finally:
            q.rel.load = orig

    a, b = run(1), run(5)
    pd.testing.assert_frame_equal(a, b)
    assert list(a["lag_min"]) == [90]
    assert list(a["n_users"]) == [2]


@pytest.mark.usefixtures("ray_session")
def test_retention_km_invariance():
    # multi-day spans with a mix of churned and censored users: the
    # span fold + suffix-sum risk walk must be block-invariant, the
    # curve must be non-increasing, and censored-only durations must
    # not emit a step
    import ray.data

    from pdf_parser_ray.pipelines import queries as q

    base = dt.datetime(2024, 3, 1)
    rows = []
    # users 0..6 churn (last seen before the corpus-end day); user 7
    # is censored (still active on the final day)
    for uid, (f, l) in enumerate([(0, 0), (1, 1), (0, 3), (2, 5),
                                  (4, 7), (0, 10), (20, 29), (25, 30)]):
        rows.append((uid, f))
        rows.append((uid, l))
    tbl = pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([base + dt.timedelta(days=r[1]) for r in rows],
                       pa.timestamp("us")),
    })

    def run(n_blocks):
        def load(sf, table, columns=None):
            return ray.data.from_arrow(
                tbl.select(columns) if columns else tbl
            ).repartition(n_blocks)

        orig = q.rel.load
        q.rel.load = load
        try:
            return q.events_retention_km("inv").reset_index(drop=True)
        finally:
            q.rel.load = orig

    a, b = run(1), run(7)
    pd.testing.assert_frame_equal(a, b)
    assert len(a) > 0
    surv = list(a["survival"])
    assert all(x >= y for x, y in zip(surv, surv[1:]))
    assert int(a["n_risk"][0]) == 8          # everyone at risk at t=0


@pytest.mark.usefixtures("ray_session")
def test_q12_late_priority_invariance():
    # the shared fixtures put lineitem in 1996 and orders in 2024 (no
    # late lines), so q12 gets a dedicated table: half the lines ship
    # 90 days after their order, split across critical priorities
    import ray.data

    from pdf_parser_ray.pipelines import queries as q

    base = dt.datetime(2024, 3, 1)
    n = 80
    li = pa.table({
        "l_orderkey": pa.array([i % 10 for i in range(n)], pa.int64()),
        "l_linestatus": pa.array([["F", "O"][i % 2] for i in range(n)],
                                 pa.string()),
        "l_shipdate": pa.array(
            [base + dt.timedelta(days=90 if i % 3 == 0 else 10)
             for i in range(n)], pa.timestamp("us")),
    })
    orders = pa.table({
        "o_orderkey": pa.array(range(10), pa.int64()),
        "o_orderdate": pa.array([base] * 10, pa.timestamp("us")),
        "o_orderpriority": pa.array(
            [["1-URGENT", "2-HIGH", "3-MEDIUM", "5-LOW"][i % 4]
             for i in range(10)], pa.string()),
    })
    tables = {"lineitem": li, "orders": orders}

    def run(n_blocks):
        def load(sf, table, columns=None):
            tbl = tables[table]
            return ray.data.from_arrow(
                tbl.select(columns) if columns else tbl
            ).repartition(n_blocks)

        orig = q.rel.load
        q.rel.load = load
        try:
            return q.q12_late_priority_split("inv").reset_index(drop=True)
        finally:
            q.rel.load = orig

    a, b = run(1), run(7)
    pd.testing.assert_frame_equal(a, b)
    assert len(a) > 0
    assert int(a["high_line_count"].sum()) > 0


@pytest.mark.usefixtures("ray_session")
def test_error_pchart_invariance():
    # hour 0 is all errors against a low background rate -> must flag;
    # the flag set and p_hat must be block-boundary invariant
    import ray.data

    from pdf_parser_ray.pipelines import queries as q

    base = dt.datetime(2024, 3, 1)
    n = 240
    types = ["error" if i < 40 else ("error" if i % 20 == 0 else "view")
             for i in range(n)]
    tbl = pa.table({
        "ts": pa.array([base + dt.timedelta(hours=i // 40, minutes=i % 40)
                        for i in range(n)], pa.timestamp("us")),
        "event_type": pa.array(types, pa.string()),
    })

    def run(n_blocks):
        def load(sf, table, columns=None):
            return ray.data.from_arrow(
                tbl.select(columns) if columns else tbl
            ).repartition(n_blocks)

        orig = q.rel.load
        q.rel.load = load
        try:
            return q.events_error_pchart("inv").reset_index(drop=True)
        finally:
            q.rel.load = orig

    a, b = run(1), run(7)
    pd.testing.assert_frame_equal(a, b)
    assert len(a) > 0
    assert 0 in set(a["hour"] - a["hour"].min())  # the saturated hour
