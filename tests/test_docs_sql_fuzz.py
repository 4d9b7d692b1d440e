"""Property-based SQL parity for the text-quality family (docs_stats,
docs_langid, docs_quality_filter): the pc-regex kernels and DuckDB's
regexp functions are both RE2, so counts and the derived rounded ratios
must agree on ARBITRARY text — including the whitespace classes where
Python semantics would diverge (Zs/Cc, pinned separately for the
sketches)."""

from __future__ import annotations

import duckdb
import pandas as pd
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

import __ray_entry__ as entrymod

_WORD = st.text(
    alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd", "Po"),
                           whitelist_characters="\xa0 \x0b\x1f",
                           blacklist_characters="'\\"),
    min_size=1, max_size=8)
# seed language-marker words so the langid cascade's >= tie-breaks and
# the stopword ratio get exercised, not just the all-zero branch
_MARKER = st.sampled_from(["the", "and", "der", "und", "le", "et",
                           "el", "es", "y", "in", "to", "la", "los"])
_TEXT = st.lists(st.one_of(_WORD, _MARKER),
                 min_size=0, max_size=30).map(" ".join)
_DOCS = st.lists(_TEXT, min_size=1, max_size=8)


def _table(texts) -> pa.Table:
    return pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * len(texts), pa.string()),
        "source": pa.array(["fuzz"] * len(texts), pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    return df.sort_values(list(df.columns),
                          kind="mergesort").reset_index(drop=True)


def _check(query_name: str, texts) -> None:
    import ray.data

    from pdf_parser_ray.pipelines import queries as q

    tbl = _table(texts)
    q.clear_session_caches()  # fake sf_dir keys must not hit stale memos

    orig = q.rel.load
    q.rel.load = lambda sf, t, columns=None: ray.data.from_arrow(
        tbl.select(columns) if columns else tbl)
    try:
        ray_df = entrymod.queries()[query_name]("fuzz")
    finally:
        q.rel.load = orig
    con = duckdb.connect()
    con.register("documents", tbl)
    sql_df = con.execute(entrymod.oracle_sql()[query_name]).df()
    a, b = _canon(ray_df), _canon(sql_df)
    assert list(a.columns) == list(b.columns)
    assert len(a) == len(b), f"{len(a)} != {len(b)}"
    import math

    for col in a.columns:
        for i, (x, y) in enumerate(zip(a[col], b[col])):
            if (isinstance(x, float) and isinstance(y, float)
                    and math.isnan(x) and math.isnan(y)):
                continue  # engine-agreed undefined (e.g. zipf 1-token)
            assert x == y, f"{query_name}.{col}[{i}]: {x!r} != {y!r}"


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=25, deadline=None)
@given(texts=_DOCS)
def test_docs_stats_fuzz(texts):
    _check("docs_stats", texts)


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=25, deadline=None)
@given(texts=_DOCS)
def test_docs_langid_fuzz(texts):
    _check("docs_langid", texts)


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=25, deadline=None)
@given(texts=_DOCS)
def test_docs_quality_filter_fuzz(texts):
    _check("docs_quality_filter", texts)


# near-dup strategy: duplicate/perturb a base doc so the exact dedup
# pipelines see real pairs, not only the trivial empty result
_NEAR = st.lists(_TEXT, min_size=2, max_size=5).flatmap(
    lambda base: st.lists(
        st.tuples(st.integers(0, len(base) - 1), _WORD),
        min_size=0, max_size=4,
    ).map(lambda edits: base + [base[i] + " " + w for i, w in edits]))


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=20, deadline=None)
@given(texts=_NEAR)
def test_docs_exact_dedup_fuzz(texts):
    _check("docs_exact_dedup", texts)


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=15, deadline=None)
@given(texts=_NEAR)
def test_docs_ngram_jaccard_pairs_fuzz(texts):
    # exact at any threshold: no LSH recall caveat, safe to fuzz
    _check("docs_ngram_jaccard_pairs", texts)


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=15, deadline=None)
@given(texts=_NEAR)
def test_docs_containment_pairs_fuzz(texts):
    # the _NEAR strategy's "base doc + appended word" edits are exactly
    # the subset-inclusion shape containment exists for: the base's
    # shingles are all inside the extension, C = 1 at any length ratio
    _check("docs_containment_pairs", texts)


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=20, deadline=None)
@given(texts=_DOCS)
def test_docs_score_length_bias_fuzz(texts):
    # distributed-moment Pearson on (token count, score micro):
    # degenerate variance (one doc, constant scores) pins NaN on both
    _check("docs_score_length_bias", texts)


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=20, deadline=None)
@given(texts=_DOCS)
def test_docs_oov_rate_fuzz(texts):
    # vocab selection under count ties ((n desc, tok) total order) and
    # the OOV ppm must agree on arbitrary text; zero-token docs drop
    _check("docs_oov_rate", texts)


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=20, deadline=None)
@given(texts=_DOCS)
def test_docs_top_quality_per_source_fuzz(texts):
    # score-ranked per-source top-n: score ties (identical texts, tiny
    # docs) must resolve by the integer score-micro + doc_id order on
    # both engines; zero-token docs never rank
    _check("docs_top_quality_per_source", texts)


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=15, deadline=None)
@given(texts=_NEAR)
def test_docs_dup_degree_profile_fuzz(texts):
    # count-of-counts over near-dup degrees: multi-partner docs (a base
    # with several extensions) must land in the same degree bucket on
    # both engines
    _check("docs_dup_degree_profile", texts)


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=15, deadline=None)
@given(texts=_NEAR)
def test_docs_cross_source_dups_fuzz(texts):
    # multi-source variant of the pair machinery: near-dup pairs must
    # land in the lexicographically-normalized (least, greatest) source
    # cell identically on both engines, diagonal included
    import ray.data

    from pdf_parser_ray.pipelines import queries as q

    tbl = _table(texts)
    tbl = tbl.set_column(
        tbl.schema.get_field_index("source"), "source",
        pa.array([f"s{i % 3}" for i in range(len(texts))], pa.string()))
    q.clear_session_caches()
    orig = q.rel.load
    q.rel.load = lambda sf, t, columns=None: ray.data.from_arrow(
        tbl.select(columns) if columns else tbl)
    try:
        ray_df = entrymod.queries()["docs_cross_source_dups"]("fuzz")
    finally:
        q.rel.load = orig
    con = duckdb.connect()
    con.register("documents", tbl)
    sql_df = con.execute(
        entrymod.oracle_sql()["docs_cross_source_dups"]).df()
    a, b = _canon(ray_df), _canon(sql_df)
    assert list(a.columns) == list(b.columns)
    assert len(a) == len(b)
    for col in a.columns:
        for x, y in zip(a[col], b[col]):
            assert x == y, (col, x, y)


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=15, deadline=None)
@given(texts=_NEAR)
def test_docs_score_auc_dup_fuzz(texts):
    # rank-statistic parity over arbitrary dup/unique mixes, including
    # the single-class corpora where AUC is NULL/NaN on both engines
    # and heavy score ties (the tie-correction term)
    _check("docs_score_auc_dup", texts)


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=15, deadline=None)
@given(texts=_NEAR)
def test_docs_simhash_pairs_fuzz(texts):
    # chunk banding is EXACT for hamming <= 3 (pigeonhole): fuzz-safe
    _check("docs_simhash_pairs", texts)


# deterministic-exact pipelines (md5 / integer arithmetic only — no
# cross-libm float risk like TF-IDF's ln(), no LSH recall caveat):
@pytest.mark.usefixtures("ray_session")
@settings(max_examples=20, deadline=None)
@given(texts=_DOCS)
def test_docs_fingerprints_fuzz(texts):
    _check("docs_fingerprints", texts)


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=20, deadline=None)
@given(texts=_DOCS)
def test_docs_hash_sample_fuzz(texts):
    _check("docs_hash_sample", texts)


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=15, deadline=None)
@given(texts=_DOCS)
def test_docs_stratified_sample_fuzz(texts):
    _check("docs_stratified_sample", texts)


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=15, deadline=None)
@given(texts=_DOCS)
def test_docs_top_tokens_fuzz(texts):
    _check("docs_top_tokens", texts)


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=15, deadline=None)
@given(texts=_DOCS)
def test_docs_pack_sequences_fuzz(texts):
    _check("docs_pack_sequences", texts)


# PII strategy: mix ordinary words with email-, IPv4- and account-number-
# shaped tokens so the redaction kernels exercise every pattern (and
# their interactions: digit runs inside emails/IPs must be consumed by
# the earlier pass on both engines).
_PII = st.one_of(
    st.from_regex(r"[a-z]{1,5}[._%+-]{0,2}[a-z0-9]{1,4}@[a-z0-9]{1,6}\.(com|co\.uk|io)",
                  fullmatch=True),
    st.tuples(st.integers(0, 999), st.integers(0, 999),
              st.integers(0, 999), st.integers(0, 999)).map(
        lambda t: ".".join(map(str, t))),
    st.integers(10**8, 10**14).map(str),
)
_PII_TEXT = st.lists(st.one_of(_WORD, _MARKER, _PII),
                     min_size=0, max_size=25).map(" ".join)


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=25, deadline=None)
@given(texts=st.lists(_PII_TEXT, min_size=1, max_size=8))
def test_docs_pii_redact_fuzz(texts):
    _check("docs_pii_redact", texts)


def test_docs_pii_redact_counts():
    """Deterministic spot-check: counts and placeholder substitution."""
    from pdf_parser_ray.pipelines.queries import pii_redact_batch

    tbl = pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array([
            "mail a.b+c@ex.co.uk and 10.0.0.1 acct 1234567890",
            "clean text only",
        ]),
    })
    out = pii_redact_batch(tbl)
    assert out.column("n_email").to_pylist() == [1, 0]
    assert out.column("n_ip").to_pylist() == [1, 0]
    assert out.column("n_num").to_pylist() == [1, 0]
    assert out.column("redacted").to_pylist()[0] == \
        "mail <EMAIL> and <IP> acct <NUM>"
    assert out.column("redacted").to_pylist()[1] == "clean text only"


# line-dedup strategy: build multi-line docs from a SMALL shared line pool
# so cross-document frequent lines (the boilerplate the operator strikes)
# actually occur, including empty lines and docs that get fully blanked.
_LINE_POOL = st.lists(_TEXT, min_size=1, max_size=6)
_LINE_DOCS = _LINE_POOL.flatmap(
    lambda pool: st.lists(
        st.lists(st.sampled_from(pool), min_size=0, max_size=5)
        .map("\n".join),
        min_size=1, max_size=8))


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=25, deadline=None)
@given(texts=_LINE_DOCS)
def test_docs_line_dedup_fuzz(texts):
    _check("docs_line_dedup", texts)


def _run_on_texts(query_name: str, texts) -> pd.DataFrame:
    import ray.data

    from pdf_parser_ray.pipelines import queries as q

    tbl = _table(texts)
    orig = q.rel.load
    q.rel.load = lambda sf, t, columns=None: ray.data.from_arrow(
        tbl.select(columns) if columns else tbl)
    try:
        return entrymod.queries()[query_name]("fuzz")
    finally:
        q.rel.load = orig


@pytest.mark.usefixtures("ray_session")
def test_docs_line_dedup_removes_boilerplate():
    """Deterministic: a footer line shared by 2 docs is struck from both,
    a unique line survives, a fully-boilerplate doc becomes empty."""
    import hashlib

    texts = ["body one\nCOOKIE FOOTER", "body two\nCOOKIE FOOTER",
             "COOKIE FOOTER"]
    df = _run_on_texts("docs_line_dedup", texts)
    assert df.sort_values("doc_id")["n_removed"].tolist() == [1, 1, 1]
    fps = df.sort_values("doc_id")["clean_fp"].tolist()
    assert fps[0] == hashlib.md5(b"body one").hexdigest()
    assert fps[2] == hashlib.md5(b"").hexdigest()


# decontamination strategy: doc_id 27 is in the md5-bucket benchmark
# slice (md5('27') starts with '0'); train docs share (or don't) an
# 8-word run with it, so real hits occur alongside clean docs.
_RUN8 = st.lists(_WORD, min_size=8, max_size=12).map(" ".join)


def _check_ids(query_name: str, ids, texts) -> None:
    import duckdb as _dd

    import ray.data

    from pdf_parser_ray.pipelines import queries as q

    q.clear_session_caches()  # fake sf_dir keys must not hit stale memos

    tbl = pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * len(texts), pa.string()),
        "source": pa.array(["fuzz"] * len(texts), pa.string()),
    })
    orig = q.rel.load
    q.rel.load = lambda sf, t, columns=None: ray.data.from_arrow(
        tbl.select(columns) if columns else tbl)
    try:
        ray_df = entrymod.queries()[query_name]("fuzz")
    finally:
        q.rel.load = orig
    con = _dd.connect()
    con.register("documents", tbl)
    sql_df = con.execute(entrymod.oracle_sql()[query_name]).df()
    a, b = _canon(ray_df), _canon(sql_df)
    assert list(a.columns) == list(b.columns)
    assert len(a) == len(b), f"{len(a)} != {len(b)}"
    for col in a.columns:
        for x, y in zip(a[col], b[col]):
            assert x == y, f"{query_name}.{col}: {x!r} != {y!r}"


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=20, deadline=None)
@given(bench=_RUN8, extra=st.lists(_WORD, min_size=0, max_size=4),
       clean=st.lists(_TEXT, min_size=0, max_size=3),
       contaminated=st.booleans())
def test_docs_decontaminate_fuzz(bench, extra, clean, contaminated):
    texts, ids = [bench], [27]          # benchmark doc
    if contaminated:
        texts.append(bench + " " + " ".join(extra))  # shares the 8-gram run
        ids.append(1)
    texts.extend(clean)
    ids.extend(range(2, 2 + len(clean)))
    _check_ids("docs_decontaminate", ids, texts)


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=20, deadline=None)
@given(texts=_LINE_DOCS)
def test_docs_repetition_stats_fuzz(texts):
    # exact kernels (md5, integer run-lengths, identical-double rounding):
    # fuzz-safe; _LINE_DOCS supplies real duplicate lines and 2-grams
    _check("docs_repetition_stats", texts)


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=20, deadline=None)
@given(texts=_DOCS)
def test_docs_length_band_fuzz(texts):
    # tiny corpora stress the quantile_disc rank boundaries (ceil(q*n))
    _check("docs_length_band", texts)


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=15, deadline=None)
@given(texts=_DOCS)
def test_docs_cms_top_tokens_fuzz(texts):
    # the sketch is deterministic (md5 buckets, elementwise-sum merge):
    # the SQL twin rebuilds the identical matrix, collisions included
    _check("docs_cms_top_tokens", texts)


def test_cms_overestimates_never_underestimate():
    """CMS guarantee: est >= exact for every queried token (planted
    collision-heavy corpus: many distinct tokens into 1024 buckets)."""
    texts = [" ".join(f"tok{i}" for i in range(j, j + 400))
             for j in range(0, 4000, 37)]
    df = _run_on_texts("docs_cms_top_tokens", texts)
    assert (df["n_est"] >= df["n_exact"]).all()
    assert len(df) == 20


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=20, deadline=None)
@given(texts=_DOCS)
def test_docs_chunk_windows_fuzz(texts):
    # integer chunk arithmetic + md5 only: exact; small docs hit the
    # single-chunk and empty-doc edges, long ones the stride tail
    _check("docs_chunk_windows", texts)


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=10, deadline=None)
@given(n=st.integers(0, 200))
def test_docs_chunk_windows_boundaries(n):
    texts = [" ".join(f"w{i}" for i in range(n))]
    _check("docs_chunk_windows", texts)


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=20, deadline=None)
@given(texts=_DOCS)
def test_docs_model_score_fuzz(texts):
    # integer micro-unit weights summed exactly -> the double division
    # and half-away rounding are bit-identical on both engines
    _check("docs_model_score", texts)


# dup-span strategy: docs share (or don't) 8+-token runs, sometimes at
# multiple offsets, so marked windows overlap, chain via adjacency, and
# split into separate islands
_SPAN_DOCS = st.tuples(_RUN8, _RUN8, st.lists(_WORD, min_size=0, max_size=6),
                       st.booleans()).map(
    lambda t: [t[0] + " " + " ".join(t[2]) + " " + t[1],
               t[0] + (" filler " + t[1] if t[3] else ""),
               " ".join(t[2])])


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=20, deadline=None)
@given(texts=_SPAN_DOCS)
def test_docs_dup_spans_fuzz(texts):
    # integer positions + md5 window hashes: exact; islands exercise the
    # overlap, adjacency-merge and split cases
    _check("docs_dup_spans", texts)


@pytest.mark.usefixtures("ray_session")
def test_docs_dup_spans_islands():
    """Deterministic: shared prefix+suffix with a unique middle yields
    two separate spans; a fully-shared doc yields one covering span."""
    a = " ".join(f"p{i}" for i in range(8))      # shared prefix run
    b = " ".join(f"s{i}" for i in range(8))      # shared suffix run
    texts = [a + " unique middle here " + b, a + " " + b]
    df = _run_on_texts("docs_dup_spans", texts)
    d0 = df[df.doc_id == 0]
    assert d0[["s", "e"]].values.tolist() == [[1, 8], [12, 19]]
    d1 = df[df.doc_id == 1]
    assert d1[["s", "e"]].values.tolist() == [[1, 16]]


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=25, deadline=None)
@given(texts=_DOCS)
def test_docs_postings_fuzz(texts):
    # inverted index: per-doc-unique tokens, packed sorted posting lists
    _check("docs_postings", texts)


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=20, deadline=None)
@given(texts=_SPAN_DOCS)
def test_docs_cut_dup_spans_fuzz(texts):
    # surgery: cleaned text = space-rejoined uncovered tokens; n_cut =
    # covered-token count; empty/fully-cut docs still emit a row
    _check("docs_cut_dup_spans", texts)


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=15, deadline=None)
@given(texts=_NEAR)
def test_docs_edit_pairs_fuzz(texts):
    # candidates are the exact 3-shingle Jaccard pairs; the byte-level
    # levenshtein kernel and the single int/int ratio division are exact
    _check("docs_edit_pairs", texts)


@settings(max_examples=60, deadline=None)
@given(a=st.text(max_size=24), b=st.text(max_size=24))
def test_levenshtein_kernel_matches_duckdb(a, b):
    from pdf_parser_ray.pipelines.queries import _levenshtein_bytes

    want = duckdb.execute("select levenshtein(?, ?)", [a, b]).fetchone()[0]
    assert _levenshtein_bytes(a.encode(), b.encode()) == want


# clean-corpus strategy: letter-word runs (shareable 8-grams) + stopword
# filler (passes the 30-token/alpha/stopword gate) + optional PII tokens;
# exact duplicates, span-sharing near-dups, and sub-30-token junk docs
# exercise all four composed stages
_LWORD = st.text(alphabet="abcdefg", min_size=1, max_size=5)
_RUNL = st.lists(_LWORD, min_size=8, max_size=8).map(" ".join)
_FILL = "the and of to in the and of to in the and of to in"


def _clean_doc(run_a, run_b, pii):
    tail = " a@b.co 123456789" if pii else ""
    return f"{run_a} {_FILL} {run_b} {_FILL}{tail}"


_CLEAN_DOCS = st.tuples(_RUNL, _RUNL, st.booleans(), _LWORD).map(
    lambda t: [_clean_doc(t[0], t[1], t[2]),
               _clean_doc(t[0], t[1], t[2]),          # exact duplicate
               _clean_doc(t[0], "x " * 7 + "y", False),  # shares run_a
               t[3]])                                  # junk (< 30 tokens)


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=15, deadline=None)
@given(texts=_CLEAN_DOCS)
def test_docs_clean_corpus_fuzz(texts):
    # the composed pipeline: dedup drops the copy, the gate drops the
    # junk doc, redaction rewrites PII, surgery cuts the shared run
    _check("docs_clean_corpus", texts)


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=20, deadline=None)
@given(texts=_DOCS)
def test_docs_token_lift_fuzz(texts):
    # exact integer co-occurrence counts; one double division per pair
    _check("docs_token_lift", texts)


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=20, deadline=None)
@given(texts=_DOCS)
def test_docs_bin_pack_fuzz(texts):
    # distributed prefix scan vs the SQL window cumsum — empty docs
    # (0 tokens) and budget-boundary hits included
    _check("docs_bin_pack", texts)


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=20, deadline=None)
@given(texts=st.lists(st.lists(st.one_of(_WORD, _MARKER),
                               min_size=0, max_size=70).map(" ".join),
                      min_size=1, max_size=6))
def test_docs_anchor_positive_fuzz(texts):
    # chunk-boundary docs (exactly 2 chunks, 1 chunk, empty) and the
    # md5(doc_id) positive choice vs md5_number_upper
    _check("docs_anchor_positive", texts)


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=25, deadline=None)
@given(texts=_DOCS)
def test_docs_charclass_profile_fuzz(texts):
    # RE2 char-class counts + one division; unicode beyond the ASCII
    # classes lands in n_other identically on both engines
    _check("docs_charclass_profile", texts)


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=25, deadline=None)
@given(texts=_DOCS)
def test_docs_bpe_pretokens_fuzz(texts):
    # the GPT-2-ish pretokenizer regex runs on RE2 on both engines;
    # contractions, unicode letters and digit runs all split identically
    _check("docs_bpe_pretokens", texts)


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=10, deadline=None)
@given(texts=_SPAN_DOCS)
def test_dup_spans_join_path_matches_broadcast(texts):
    """The size-gate fallback (positioned gram join, no driver set) must
    reproduce the broadcast path exactly — forced via broadcast_max=0."""
    import ray.data

    from pdf_parser_ray.pipelines import queries as q

    tbl = _table(texts)
    orig = q.rel.load
    q.rel.load = lambda sf, t, columns=None: ray.data.from_arrow(
        tbl.select(columns) if columns else tbl).repartition(3)
    try:
        spans_b = q.docs_dup_spans("fuzz")
        spans_j = q.docs_dup_spans("fuzz", broadcast_max=0)
        cut_b = q.docs_cut_dup_spans("fuzz")
        cut_j = q.docs_cut_dup_spans("fuzz", broadcast_max=0)
    finally:
        q.rel.load = orig
    pd.testing.assert_frame_equal(spans_b, spans_j)
    pd.testing.assert_frame_equal(cut_b, cut_j)


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=20, deadline=None)
@given(texts=_DOCS)
def test_token_entropy_fuzz(texts):
    # micro-nat integer terms make the per-doc sum order-free; empty
    # docs drop on both engines (undefined entropy)
    _check("docs_token_entropy", texts)


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=20, deadline=None)
@given(texts=_DOCS)
def test_quality_buckets_fuzz(texts):
    # tertile bounds on the score-micro histogram must replicate
    # quantile_disc under heavy ties (few docs -> many equal scores);
    # zero-token docs drop on both engines
    _check("docs_quality_buckets", texts)


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=20, deadline=None)
@given(texts=_DOCS)
def test_ngram_diversity_fuzz(texts):
    # both engines count DISTINCT over the identical md5 hash domain,
    # so collisions cannot diverge; sub-3-token docs contribute nothing
    _check("docs_ngram_diversity", texts)


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=20, deadline=None)
@given(texts=_DOCS)
def test_prefix_families_fuzz(texts):
    # md5 prefix fingerprints (DuckDB md5 lockstep over the joined
    # first-8 tokens); sub-8-token docs skip on both engines
    _check("docs_prefix_families", texts)


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=15, deadline=None)
@given(texts_a=_DOCS, texts_b=_DOCS)
def test_source_kl_fuzz(texts_a, texts_b):
    # nano-nat integer KL terms over the dense smoothed grid must match
    # the SQL twin for arbitrary two-source corpora (incl. empty-token
    # sources, which still smooth to the uniform distribution)
    import ray.data

    from pdf_parser_ray.pipelines import queries as q

    texts = list(texts_a) + list(texts_b)
    srcs = ["sa"] * len(texts_a) + ["sb"] * len(texts_b)
    tbl = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * len(texts), pa.string()),
        "source": pa.array(srcs, pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })
    q.clear_session_caches()
    orig = q.rel.load
    q.rel.load = lambda sf, t, columns=None: ray.data.from_arrow(
        tbl.select(columns) if columns else tbl)
    try:
        ray_df = entrymod.queries()["docs_source_kl"]("fuzz")
        a7 = q.docs_source_kl("fuzz")  # second run: determinism
    finally:
        q.rel.load = orig
    pd.testing.assert_frame_equal(ray_df.reset_index(drop=True),
                                  a7.reset_index(drop=True))
    con = duckdb.connect()
    con.register("documents", tbl)
    sql_df = con.execute(
        entrymod.oracle_sql()["docs_source_kl"]).df()
    sql_df = sql_df[list(ray_df.columns)].astype(ray_df.dtypes.to_dict())
    pd.testing.assert_frame_equal(
        ray_df.sort_values(["src_a", "src_b"]).reset_index(drop=True),
        sql_df.sort_values(["src_a", "src_b"]).reset_index(drop=True))


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=20, deadline=None)
@given(texts=_DOCS)
def test_zipf_slope_fuzz(texts):
    # rank tie-break by token + nano-unit integer regression moments
    # must match the SQL row_number formulation; all-empty corpora
    # yield the typed empty frame vs SQL's zero-row LIMIT
    import hypothesis
    hypothesis.assume(any(t.split() for t in texts))
    # degenerate single-token corpora divide 0/0 on both engines (NaN)
    _check("docs_zipf_slope", texts)


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=15, deadline=None)
@given(texts=_NEAR)
def test_docs_pmi_pairs_fuzz(texts):
    # the _NEAR duplicate/perturb shape guarantees real co-occurrence;
    # df-vocabulary cutoff ties and pair-rank ties both break on total
    # orders, and the nano-PMI double expression is evaluated with the
    # identical ln/product shape on both engines
    _check("docs_pmi_pairs", texts)


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=15, deadline=None)
@given(texts=_DOCS)
def test_docs_heaps_law_fuzz(texts):
    # bucket math is exact integer division; empty buckets stay on the
    # grid; empty-text docs contribute zero tokens; the first-bucket
    # reduction must agree with the DISTINCT-unnest SQL on any corpus
    _check("docs_heaps_law", texts)


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=10, deadline=None)
@given(texts=_NEAR)
def test_docs_dup_cluster_sizes_fuzz(texts):
    # histogram of recursive-CTE component sizes: duplicate/perturbed
    # corpora produce real multi-doc clusters; no pairs -> empty frame
    _check("docs_dup_cluster_sizes", texts)


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=20, deadline=None)
@given(texts=_DOCS)
def test_readability_fuzz(texts):
    # RE2 word/sentence counts + ratio-of-sums ARI vs the SQL fold;
    # corpora where every doc lacks a token or a terminator must agree
    # as zero rows
    _check("docs_readability", texts)
