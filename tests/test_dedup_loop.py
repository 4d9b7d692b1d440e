"""The closed dedup loop: LSH candidates -> distributed exact Jaccard,
SimHash chunk-banded hamming pairs, and hot-bucket capping."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from pdf_parser_ray.functions import sketches


def _docs_table(texts: list[str]) -> pa.Table:
    return pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })


@pytest.mark.usefixtures("ray_session")
def test_minhash_verified_pairs_finds_planted_dups():
    import ray.data

    from pdf_parser_ray.stages import dedup

    base = ("the quick brown fox jumps over the lazy dog and then "
            "wanders through seventeen distinct meadows before dusk")
    texts = [f"unrelated document number {i} with its own words "
             f"alpha{i} beta{i} gamma{i} delta{i} epsilon{i} zeta{i}"
             for i in range(40)]
    texts.append(base)                                     # doc 40
    texts.append(base.replace("dusk", "dawn"))             # doc 41 ~ dup
    docs = ray.data.from_arrow(_docs_table(texts))
    out = dedup.minhash_verified_pairs(docs, threshold=0.5).to_pandas()
    got = set(zip(out["doc_a"], out["doc_b"]))
    assert got == {(40, 41)}
    j = float(out["jaccard"].iloc[0])
    want = sketches.jaccard(sketches.word_shingles(texts[40]),
                            sketches.word_shingles(texts[41]))
    assert abs(j - round(want, 4)) < 1e-9


@pytest.mark.usefixtures("ray_session")
def test_minhash_hot_band_cap_stars_to_representative(caplog):
    import logging

    import ray.data

    from pdf_parser_ray.stages import dedup

    texts = ["identical boilerplate content repeated verbatim"] * 10
    docs = ray.data.from_arrow(_docs_table(texts))
    with caplog.at_level(logging.WARNING):
        out = dedup.minhash_candidates(docs, bucket_cap=5).to_pandas()
    # star: every doc pairs with representative 0 only
    got = set(zip(out["doc_a"], out["doc_b"]))
    assert got == {(0, i) for i in range(1, 10)}


@pytest.mark.usefixtures("ray_session")
def test_simhash_pairs_exact_vs_bruteforce():
    """Chunk banding must find EXACTLY the brute-force hamming <= 3 set."""
    import ray.data

    from pdf_parser_ray.stages import dedup

    rng = np.random.RandomState(5)
    words = [f"w{i}" for i in range(50)]
    texts = [" ".join(rng.choice(words, 30)) for _ in range(120)]
    # clone a few docs with one token changed (small hamming expected)
    for k in range(5):
        toks = texts[k].split()
        toks[3] = "changed"
        texts.append(" ".join(toks))
    sigs = [sketches.simhash(t) for t in texts]
    want = {(a, b) for a in range(len(texts)) for b in range(a + 1, len(texts))
            if sketches.hamming64(sigs[a], sigs[b]) <= 3}
    docs = ray.data.from_arrow(_docs_table(texts))
    out = dedup.simhash_pairs(docs, max_hamming=3).to_pandas()
    got = set(zip(out["doc_a"], out["doc_b"]))
    assert got == want
    for _, row in out.iterrows():
        assert row["hamming"] == sketches.hamming64(
            sigs[int(row["doc_a"])], sigs[int(row["doc_b"])])


def test_simhash_matches_duckdb_kernel():
    """The md5 bit hash equals DuckDB md5_number_upper, so signatures are
    SQL-replicable."""
    import duckdb

    texts = ["stream shuffle arrow batch", "one token", "", "a a a b"]
    con = duckdb.connect()
    for t in texts:
        py = f"{sketches.simhash(t):016x}"
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
        """, [t]).fetchone()[0]
        assert py == sql, (t, py, sql)


@pytest.mark.usefixtures("ray_session")
def test_simhash_hot_bucket_truncates(caplog):
    import logging

    import ray.data

    from pdf_parser_ray.stages import dedup

    texts = ["same text for everyone"] * 30
    docs = ray.data.from_arrow(_docs_table(texts))
    with caplog.at_level(logging.WARNING):
        out = dedup.simhash_pairs(docs, max_hamming=3,
                                  bucket_cap=10).to_pandas()
    assert len(out) == 10 * 9 // 2
    assert out["doc_a"].max() < 10


@pytest.mark.usefixtures("ray_session")
def test_dup_clusters_transitive_chain(tmp_path, monkeypatch):
    """A chain A~B~C~D (adjacent near-dups only) must collapse into ONE
    cluster labeled by the minimum doc_id, via >1 propagation rounds."""
    import pyarrow.parquet as pq
    import ray.data

    from pdf_parser_ray.pipelines import queries as q

    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lambda mu nu xi omicron pi rho sigma tau upsilon") * 3
    words = base.split()
    texts = []
    for k in range(4):  # each neighbor differs by 2 more words
        w = list(words)
        for j in range(2 * k):
            w[j] = f"sub{k}_{j}"
        texts.append(" ".join(w))
    texts.append("entirely different content " + " ".join(
        f"zz{i}" for i in range(40)))
    t = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * len(texts), pa.string()),
        "source": pa.array(["t"] * len(texts), pa.string()),
        "n_chars": pa.array([len(x) for x in texts], pa.int64()),
    })
    pq.write_table(t, tmp_path / "documents.parquet")
    out = q.docs_dup_clusters(str(tmp_path), threshold=0.7)
    got = dict(zip(out["doc_id"], out["cluster_id"]))
    assert set(got) >= {0, 1, 2, 3}
    assert {got[i] for i in range(4)} == {0}, got  # one component, min id
    assert 4 not in got  # the unrelated doc joins no cluster


@pytest.mark.usefixtures("ray_session")
def test_short_doc_pairs_match_sql_domain():
    """Two identical 1-2-word docs share all minhash bands, but the SQL
    oracle's shingle CTE excludes docs with < 3 words — the verified
    pipeline must emit NO pair for them (jaccard(empty,empty) would
    otherwise claim 1.0)."""
    import ray.data

    from pdf_parser_ray.stages import dedup

    texts = ["hi there", "hi there", "one", "one",
             "a normal document with plenty of words to shingle properly"]
    docs = ray.data.from_arrow(_docs_table(texts))
    out = dedup.minhash_verified_pairs(docs, threshold=0.5).to_pandas()
    assert len(out) == 0, out
