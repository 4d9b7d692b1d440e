"""Round-2 robustness fixes (ADVICE.md): explode-path never-raises,
NULL group keys, as-of tie-breaking, checkpoint stale-part cleanup,
corpus cache marker placement."""

from __future__ import annotations

import json
import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _poison_bundle() -> bytes:
    """A bundle whose pages list contains a non-dict entry."""
    good_page = {"width": 612.0, "height": 792.0, "blocks": []}
    return json.dumps({"pages": [good_page, "not-a-dict"],
                       "metadata": {}}).encode("utf-8")


@pytest.mark.usefixtures("ray_session")
def test_explode_mode_poison_page_degrades_like_pure_map():
    """A giant doc with a non-dict page entry must yield an error row in
    explode mode (never a failed Ray task), identical to pure-map mode."""
    import ray.data

    from pdf_parser_ray.functions.document import extract_document
    from pdf_parser_ray.pipelines.extraction import extract_dataset

    payload = _poison_bundle()
    table = pa.table({
        "url": pa.array(["poison-0001.pdf"], pa.string()),
        "html": pa.array([payload], pa.binary()),
    })
    want = extract_document("poison-0001.pdf", payload)
    assert want["error"], "pure-map must classify this doc as an error row"

    # threshold=0 forces every pdf row through the explode router
    got = extract_dataset(ray.data.from_arrow(table),
                          explode_threshold=0).take_all()
    assert len(got) == 1
    row = got[0]
    assert row["error"] == want["error"]
    assert row["text"] == want["text"] == ""


@pytest.mark.usefixtures("ray_session")
def test_parse_page_safety_net_emits_error_chunk():
    """Even if a poisoned page reaches _parse_page (router bypassed), the
    actor must emit an error chunk, not raise."""
    from pdf_parser_ray.stages.extract import ROUTED_SCHEMA, ParseDocuments

    batch = pa.table({
        "url": ["u.pdf"],
        "kind": ["page"],
        "page_number": pa.array([1], pa.int32()),
        "n_pages": pa.array([1], pa.int32()),
        "payload": pa.array([json.dumps("not-a-dict").encode()],
                            pa.large_binary()),
        "meta": [""],
    }, schema=ROUTED_SCHEMA)
    out = ParseDocuments()(batch)
    assert out.num_rows == 1
    assert out.column("error")[0].as_py() != ""
    assert out.column("text")[0].as_py() == ""


@pytest.mark.usefixtures("ray_session")
def test_grouped_agg_keeps_null_group_keys():
    import duckdb
    import ray.data

    from pdf_parser_ray.pipelines import relational as rel

    tbl = pa.table({
        "k": pa.array(["a", None, "a", None, "b"], pa.string()),
        "v": pa.array([1, 2, 3, 4, 5], pa.int64()),
    })
    ds = ray.data.from_arrow(tbl)
    for small in (True, False):
        agg = rel.grouped_agg(ds, ["k"],
                              [("n", "", "count"), ("s", "v", "sum")],
                              small_result=small)
        df = rel.as_pandas(agg).sort_values("k", na_position="last",
                                            kind="mergesort").reset_index(drop=True)
        want = duckdb.query(
            "SELECT k, count(*) AS n, sum(v) AS s FROM tbl "
            "GROUP BY k ORDER BY k NULLS LAST").df()
        assert len(df) == 3, f"NULL group dropped (small_result={small})"
        assert df["n"].tolist() == want["n"].tolist()
        assert [int(x) for x in df["s"]] == [int(x) for x in want["s"]]


@pytest.mark.usefixtures("ray_session")
def test_asof_click_tie_break_is_engine_independent(tmp_path):
    """Duplicate (user_id, ts, 'click') rows: both engines must pick the
    max-event_id click deterministically."""
    import duckdb

    import __ray_entry__ as entrymod

    ts = pd.Timestamp("2024-01-01 10:00:00")
    events = pd.DataFrame({
        "event_id": [1, 2, 3, 4],
        "user_id": [7, 7, 7, 7],
        "ts": [ts, ts, ts, ts + pd.Timedelta(minutes=5)],
        "event_type": ["click", "click", "view", "error"],
        "value": [10.0, 20.0, 0.0, 1.0],
    })
    sf_dir = str(tmp_path)
    pq.write_table(pa.Table.from_pandas(events, preserve_index=False),
                   os.path.join(sf_dir, "events.parquet"))

    from pdf_parser_ray.pipelines import queries as q
    ray_df = q.events_asof_click(sf_dir)
    assert ray_df["click_id"].tolist() == [2]  # max event_id among ties
    assert ray_df["click_value"].tolist() == [20.0]

    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"'{sf_dir}/events.parquet'")
    sql_df = con.execute(entrymod.oracle_sql()["events_asof_click"]).df()
    assert sql_df["click_id"].tolist() == [2]
    assert sql_df["click_value"].tolist() == [20.0]


@pytest.mark.usefixtures("ray_session")
def test_checkpoint_resume_removes_stale_parts(tmp_path):
    from pdf_parser_ray.sources import synth
    from pdf_parser_ray.state.checkpoint import run_checkpointed

    shards = []
    for i in range(3):
        p = tmp_path / f"shard-{i}.parquet"
        pq.write_table(synth.corpus_table(6, seed=100 + i, start=i * 6), p)
        shards.append(str(p))
    out = str(tmp_path / "out")

    first = run_checkpointed(shards, out, files_per_part=1)
    assert first["parts_total"] == 3
    # resume over a SHORTER input list: stale part-0002 must disappear
    second = run_checkpointed(shards[:2], out, files_per_part=1)
    assert second["parts_total"] == 2
    assert second["parts_skipped"] == 2
    entries = sorted(e for e in os.listdir(out) if e.startswith("part-"))
    assert entries == ["part-0000", "part-0001"]
    manifests = sorted(os.listdir(os.path.join(out, "_manifest")))
    assert manifests == ["part-0000.json", "part-0001.json"]


@pytest.mark.usefixtures("ray_session")
def test_corpus_cache_readable_by_plain_read_parquet(tmp_path):
    import ray.data

    from pdf_parser_ray.sources.pages import materialize_corpus

    out = materialize_corpus(20, seed=5, cache_dir=str(tmp_path / "cache"))
    # no non-parquet files inside the shard dir
    assert all(name.endswith(".parquet") for name in os.listdir(out))
    assert ray.data.read_parquet(out).count() == 20
    # cache hit returns the same dir without rebuilding
    again = materialize_corpus(20, seed=5, cache_dir=str(tmp_path / "cache"))
    assert again == out


def test_vectorized_textstats_match_scalar_reference():
    """The pc-regex vectorized stats/langid kernels must equal the scalar
    Python-re reference kernels row by row on the real corpus (RE2 vs re
    semantics: identical on this data; the oracle SQL is RE2 too)."""
    import pyarrow.parquet as pq

    from pdf_parser_ray.functions import textstats as ts
    from pdf_parser_ray.functions.num import round_half_away
    from pdf_parser_ray.stages import text as textstage

    t = pq.read_table("/root/testdata/sf0.001/documents.parquet",
                      columns=["doc_id", "text"])
    texts = t.column("text").to_pylist()
    # edge cases the corpus may lack — incl. the RE2-vs-Unicode-\b traps
    # (scalar kernels compile with re.ASCII to match RE2): 'thé' has an
    # ASCII word boundary after 'the'; NBSP is a token char in both
    extra = ["", " ", "no-stopwords-here!!!", "the the the", "éé the é",
             "thé café", "a b the", "die der und"]
    t2 = pa.table({
        "doc_id": pa.array(range(len(extra)), pa.int64()),
        "text": pa.array(extra, pa.string()),
    })
    for table in (t, t2):
        texts = table.column("text").to_pylist()
        stats = textstage.stats_batch(table)
        assert stats.column("n_tokens").to_pylist() == [
            ts.token_count(x) for x in texts]
        assert stats.column("alpha_ratio").to_pylist() == [
            round_half_away(ts.alpha_ratio(x), 4) for x in texts]
        assert stats.column("stop_ratio").to_pylist() == [
            round_half_away(ts.stopword_ratio(x), 4) for x in texts]
        lang = textstage.langid_batch(table)
        assert lang.column("pred_lang").to_pylist() == [
            ts.predict_lang(x) for x in texts]


@pytest.mark.usefixtures("ray_session")
def test_pack_sequences_multi_chunk(tmp_path):
    """Docs longer than seq_len split into ceil(n/512) sequences with the
    remainder in the last one."""
    import duckdb

    import __ray_entry__ as entrymod
    from pdf_parser_ray.pipelines import queries as q

    texts = [" ".join(f"t{i}" for i in range(1200)),  # 3 seqs: 512,512,176
             " ".join(f"t{i}" for i in range(512)),   # exactly 1 full seq
             "short doc"]
    t = pa.table({
        "doc_id": pa.array(range(3), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })
    pq.write_table(t, tmp_path / "documents.parquet")
    df = q.docs_pack_sequences(str(tmp_path))
    got = list(zip(df["doc_id"], df["seq_index"], df["n_tokens"]))
    assert got == [(0, 0, 512), (0, 1, 512), (0, 2, 176),
                   (1, 0, 512), (2, 0, 2)]
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"'{tmp_path}/documents.parquet'")
    sql = con.execute(entrymod.oracle_sql()["docs_pack_sequences"]).df()
    sql = sql.sort_values(["doc_id", "seq_index"]).reset_index(drop=True)
    assert list(zip(sql["doc_id"], sql["seq_index"], sql["n_tokens"])) == got


@pytest.mark.usefixtures("ray_session")
def test_funnel_respects_stage_ordering(tmp_path):
    """A purchase BEFORE the first qualifying click must not convert;
    a click before the first view must not count as clicked."""
    import duckdb

    import __ray_entry__ as entrymod
    from pdf_parser_ray.pipelines import queries as q

    t0 = pd.Timestamp("2024-01-01 00:00:00")
    rows = []
    # user 1: view -> click -> purchase (full funnel)
    rows += [(1, 1, t0, "view"), (2, 1, t0 + pd.Timedelta("1h"), "click"),
             (3, 1, t0 + pd.Timedelta("2h"), "purchase")]
    # user 2: purchase BEFORE click (clicked but not converted)
    rows += [(4, 2, t0, "view"), (5, 2, t0 + pd.Timedelta("2h"), "click"),
             (6, 2, t0 + pd.Timedelta("1h"), "purchase")]
    # user 3: click BEFORE view (viewed but not clicked)
    rows += [(7, 3, t0, "click"), (8, 3, t0 + pd.Timedelta("1h"), "view")]
    # user 4: never viewed
    rows += [(9, 4, t0, "click"), (10, 4, t0 + pd.Timedelta("1h"), "purchase")]
    events = pd.DataFrame(rows, columns=["event_id", "user_id", "ts",
                                         "event_type"])
    events["value"] = 0.0
    pq.write_table(pa.Table.from_pandas(events, preserve_index=False),
                   os.path.join(str(tmp_path), "events.parquet"))
    df = q.events_funnel(str(tmp_path))
    assert df.iloc[0].tolist() == [3, 2, 1]  # viewed / clicked / converted
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"'{tmp_path}/events.parquet'")
    sql = con.execute(entrymod.oracle_sql()["events_funnel"]).df()
    assert sql.iloc[0].tolist() == [3, 2, 1]
