"""Round-3 fix pins: ConfigurationError surface, RE2 tokenization
lockstep, HLL null semantics + tree merge, explode-JSON page_count,
label_centroids return type."""

from __future__ import annotations

import json

import pandas as pd
import pyarrow as pa
import pytest

from pdf_parser_ray.functions import sketches
from pdf_parser_ray.functions.errors import (
    ConfigurationError,
    ExtractionError,
)


def test_configuration_error_hierarchy_and_parameter():
    # mirrors the reference surface (core/exceptions.py:181-209): a
    # ValueError subclass carrying the offending parameter in details
    err = ConfigurationError("bad knob", parameter="parse_mode")
    assert isinstance(err, ExtractionError)
    assert isinstance(err, ValueError)
    assert err.details["parameter"] == "parse_mode"
    assert "parse_mode" in str(err)


@pytest.mark.usefixtures("ray_session")
def test_extract_dataset_rejects_bad_parse_mode():
    import ray.data

    from pdf_parser_ray.pipelines.extraction import extract_dataset

    ds = ray.data.from_arrow(pa.table({"url": ["u"], "html": [b"x"]}))
    with pytest.raises(ConfigurationError):
        extract_dataset(ds, parse_mode="threads")


def test_re2_tokens_diverge_from_python_split():
    # Zs (NBSP) and Cc (\x1f) are Python-split whitespace but RE2 token
    # content; \t stays a separator on both
    assert sketches.re2_tokens("a\xa0b") == ["a\xa0b"]
    assert sketches.re2_tokens("a\x1fb") == ["a\x1fb"]
    assert sketches.re2_tokens("a\x0bb") == ["a\x0bb"]
    assert sketches.re2_tokens("a\tb c") == ["a", "b", "c"]
    assert "a\xa0b".split() == ["a", "b"]  # the divergence being pinned


def test_shingle_sep_collision_free():
    # tokens may contain any char except [\t\n\f\r ]; the pack separator
    # must therefore be one of those five — regression pin for the \x1f
    # collision
    from pdf_parser_ray.stages.dedup import _SHINGLE_SEP

    assert _SHINGLE_SEP in "\t\n\f\r "


@pytest.mark.usefixtures("ray_session")
def test_events_users_hll_drops_nulls(monkeypatch):
    import ray.data

    from pdf_parser_ray.pipelines import queries as q

    def fake_load(tbl):
        def load(sf_dir, table, columns=None):
            return ray.data.from_arrow(tbl)
        return load

    with_nulls = pa.table({"user_id": pa.array([1, None, 2, 2, None],
                                               pa.int64())})
    without = pa.table({"user_id": pa.array([1, 2, 2], pa.int64())})
    monkeypatch.setattr(q.rel, "load", fake_load(with_nulls))
    est_a = q.events_users_hll("ignored")
    monkeypatch.setattr(q.rel, "load", fake_load(without))
    est_b = q.events_users_hll("ignored")
    pd.testing.assert_frame_equal(est_a, est_b)


def test_assemble_group_page_count_uses_n_pages():
    # a safety-net error chunk contributes no JSON fragment; page_count
    # must still report the document's true page count (ADVICE r2)
    from pdf_parser_ray.stages.extract import RESULT_SCHEMA, assemble_group

    frag = json.dumps({"page_number": 1, "blocks": [], "tables": []})
    group = pa.table({
        "url": ["u", "u"],
        "page_number": pa.array([1, 2], pa.int32()),
        "n_pages": pa.array([2, 2], pa.int32()),
        "text": pa.array(["page one text", ""], pa.large_string()),
        "markdown": pa.array(["", ""], pa.large_string()),
        "json": pa.array([frag, ""], pa.large_string()),
        "n_blocks": pa.array([1, 0], pa.int64()),
        "n_tables": pa.array([0, 0], pa.int64()),
        "error": ["", "RuntimeError: boom"],
        "blocks": pa.array([[], []],
                           RESULT_SCHEMA.field("blocks").type),
        "tables": pa.array([[], []],
                           RESULT_SCHEMA.field("tables").type),
        "final": [False, False],
        "meta": ["{}", ""],
    }, schema=RESULT_SCHEMA)
    out = assemble_group(group)
    doc = json.loads(out.column("json")[0].as_py())
    assert doc["page_count"] == 2
    assert len(doc["pages"]) == 1  # errored chunk really was skipped


@pytest.mark.usefixtures("ray_session")
def test_anti_join_shuffle_path_matches_broadcast(monkeypatch):
    # force the size gate down so the left-outer hash-shuffle path runs,
    # and pin it to the broadcast path's result on data where the answer
    # is non-empty (sf0.001 has zero order-less customers)
    import ray.data

    from pdf_parser_ray.pipelines import queries as q

    tables = {
        "orders": pa.table({"o_custkey": pa.array([2, 4, 2, None],
                                                  pa.int64())}),
        "customer": pa.table({
            "c_custkey": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
            "c_mktsegment": ["A", "A", "B", "B", "B", "A"],
        }),
    }

    def load(sf_dir, table, columns=None):
        return ray.data.from_arrow(tables[table])

    monkeypatch.setattr(q.rel, "load", load)
    broadcast = q.customers_without_orders("ignored")
    shuffle = q.customers_without_orders("ignored", broadcast_max_keys=0)
    pd.testing.assert_frame_equal(broadcast, shuffle)
    # 1, 6 in A; 3, 5 in B
    assert broadcast.set_index("c_mktsegment")["n_customers"].to_dict() == {
        "A": 2, "B": 2}


@pytest.mark.usefixtures("ray_session")
def test_star_cap_repair_reattaches_members():
    """A hot band star-caps to rep—member edges; when the rep is an
    outlier every star edge fails verification, and without the repair
    pass the members' true near-dup pairs would vanish (r2 ADVICE)."""
    import ray.data

    from pdf_parser_ray.stages import dedup

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "text": [
            "totally unrelated words here nothing shared at all ever",
            base,
            base + " lambda",
            base + " mu",
        ],
    }))
    # force ONE band bucket of size 4 with cap 3 -> star edges from rep 0
    out = dedup.minhash_verified_pairs(
        docs, threshold=0.8, bucket_cap=3,
        band_fn=lambda text: ["hot"]).to_pandas()
    got = {(int(a), int(b)): round(j, 4)
           for a, b, j in zip(out.doc_a, out.doc_b, out.jaccard)}
    assert got == {(1, 2): 0.8889, (1, 3): 0.8889, (2, 3): 0.8}


@pytest.mark.usefixtures("ray_session")
def test_star_cap_repair_uses_verified_members():
    """A failed member must also be re-paired against members whose star
    edge VERIFIED (rep similar to some members but not others)."""
    import ray.data

    from pdf_parser_ray.stages import dedup

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": [
            base,                 # rep
            base + " lambda",     # star edge verifies (J 0.8889)
            # shares enough with doc 1 but NOT with the rep:
            # rep-2 fails, 1-2 must come from the repair pass
            "nu xi omicron " + base.replace("alpha beta gamma ", "")
            + " lambda",
        ],
    }))
    out = dedup.minhash_verified_pairs(
        docs, threshold=0.5, bucket_cap=2,
        band_fn=lambda text: ["hot"]).to_pandas()
    pairs = {(int(a), int(b)) for a, b in zip(out.doc_a, out.doc_b)}
    assert (0, 1) in pairs
    assert (1, 2) in pairs


def _ngram_corpus(ids):
    import ray.data

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    texts = [base, base + " lambda",
             "one two three four five six seven eight nine ten",
             "completely different words in this document here now"]
    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": texts,
    }))


@pytest.mark.usefixtures("ray_session")
def test_ngram_pairs_partition_invariance():
    from pdf_parser_ray.stages import dedup

    docs = _ngram_corpus([1, 2, 3, 4])
    a = dedup.ngram_jaccard_pairs(docs, threshold=0.5,
                                  num_partitions=1).to_pandas()
    b = dedup.ngram_jaccard_pairs(docs, threshold=0.5,
                                  num_partitions=4).to_pandas()
    key = lambda df: sorted(map(tuple, df.to_numpy().tolist()))  # noqa: E731
    assert key(a) == key(b)
    assert len(a) == 1  # only the base/base+lambda pair (J = 8/9)


@pytest.mark.usefixtures("ray_session")
def test_ngram_pairs_wide_id_fallback():
    """doc_ids beyond 32 bits must take the two-column groupby path and
    produce the same pairs as the packed path does for small ids."""
    from pdf_parser_ray.stages import dedup

    big = 2 ** 40
    docs = _ngram_corpus([big + 1, big + 2, big + 3, big + 4])
    out = dedup.ngram_jaccard_pairs(docs, threshold=0.5).to_pandas()
    assert len(out) == 1
    assert int(out.doc_a[0]) == big + 1 and int(out.doc_b[0]) == big + 2
    assert round(float(out.jaccard[0]), 4) == 0.8889


def test_join_partitions_bounds():
    """Partition sizing must respect both Ray 2.49 failure modes: never
    more partitions than keys can fill, never more than the cluster can
    run without deadlocking the join aggregator pools."""
    from pdf_parser_ray.pipelines.relational import join_partitions
    from pdf_parser_ray.runtime import cluster_cpus

    assert join_partitions(0) == 1
    assert join_partitions(500) == 1            # < rows_per_part
    big = join_partitions(10_000_000)
    assert 1 <= big <= min(16, max(1, cluster_cpus() // 2))
    assert join_partitions(10_000_000, cap=32) <= max(1, cluster_cpus() // 2)


@pytest.mark.usefixtures("ray_session")
def test_empty_result_pipelines_keep_schema(monkeypatch):
    """Filter-derived pipelines whose result can legally be EMPTY must
    return a typed empty frame, not crash on the lost Dataset schema
    (class of bug the events/docs fuzz suites caught)."""
    import ray.data

    from pdf_parser_ray.pipelines import queries as q

    tbl = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                    "text": ["ab", "cd"],
                    "lang": ["en", "en"], "source": ["x", "x"]})

    def load(sf_dir, table, columns=None):
        return ray.data.from_arrow(tbl.select(columns) if columns else tbl)

    monkeypatch.setattr(q.rel, "load", load)
    assert list(q.docs_winnow_fp("f").columns) == ["doc_id", "fp"]
    assert len(q.docs_winnow_fp("f")) == 0
    assert list(q.docs_minhash_candidates("f").columns) == [
        "doc_a", "doc_b", "n_bands"]
    assert list(q.docs_pack_sequences("f").columns) == [
        "doc_id", "seq_index", "n_tokens"]
    assert list(q.docs_quality_filter("f").columns) == [
        "doc_id", "n_tokens", "alpha_ratio", "stop_ratio"]
    assert len(q.docs_quality_filter("f")) == 0


@pytest.mark.usefixtures("ray_session")
def test_label_centroids_returns_dataframe():
    import ray.data

    from pdf_parser_ray.stages import similarity

    t = pa.table({
        "label": pa.array([0, 0, 1], pa.int64()),
        "embedding": [[1.0, 0.0], [0.0, 1.0], [1.0, 1.0]],
    })
    out = similarity.label_centroids(ray.data.from_arrow(t))
    assert isinstance(out, pd.DataFrame)
    assert set(out.columns) == {"label", "dim", "centroid"}
