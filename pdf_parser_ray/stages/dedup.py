"""Deduplication pipelines over the ``documents`` table.

* exact: md5 fingerprint -> hash-partitioned group -> keep the minimum
  doc_id per identical text. One shuffle of (fp, doc_id) pairs only —
  never the text itself.
* MinHash+LSH: shingle -> 64-perm minhash -> 16 band keys -> groupby(band)
  emits candidate pairs (hot bands capped) -> pair-dedup -> exact
  word-shingle Jaccard verification via a distributed double join.
  Shuffles tiny (band_key, doc_id) rows; candidate volume is
  data-dependent, not O(n^2).
* SimHash: md5-derived 64-bit signatures per doc; hamming-neighbor pairs
  via 16-bit chunk banding (EXACT for hamming <= 3 by pigeonhole).
  The md5 bit hash is chosen to equal DuckDB ``md5_number_upper`` so both
  stages have SQL oracles.
"""

from __future__ import annotations

import logging

import numpy as np
import pyarrow as pa
import ray
import ray.data

from pdf_parser_ray.functions import sketches
from pdf_parser_ray.functions.num import round_half_away
from pdf_parser_ray.stages.text import fingerprint_batch

logger = logging.getLogger(__name__)

# Hot-band guard: an LSH band bucket larger than this (boilerplate-heavy
# corpora) emits a star to its representative doc instead of all pairs —
# O(n) rows, not O(n^2) — with the drop logged. Never triggers on the
# testdata (max bucket ~ largest dup-group, < 10).
BAND_BUCKET_CAP = 256
# SimHash 16-bit chunks are far less selective than 64-bit minhash bands
# (2^16 values; correlated bits cluster real corpora), so hot buckets in
# the hundreds are NORMAL — and the in-bucket kernel is a vectorized XOR
# (4096^2/2 = 8M word ops ~ ms), so the cap can sit much higher before
# truncation (logged) trades exactness for boundedness. The exact upgrade
# path for pathological buckets is recursive banding over the remaining
# 48 bits (pigeonhole applies again); not needed at this corpus scale.
SIMHASH_BUCKET_CAP = 4096


def exact_dedup(docs: ray.data.Dataset) -> ray.data.Dataset:
    """-> (fp, doc_id): one row per distinct text, doc_id = min."""
    fps = docs.map_batches(fingerprint_batch, batch_format="pyarrow",
                           zero_copy_batch=True)
    # the fp key is corpus-cardinality (one group per distinct text):
    # exactly where the sort-free hash-partitioned combine beats Ray's
    # key-sorted aggregate (see relational.salted_agg)
    from pdf_parser_ray.pipelines.relational import salted_agg

    return salted_agg(fps, ["fp"], [("doc_id", "min", "doc_id")])


def _make_band_rows(band_fn=None):
    """Band-row stage; ``band_fn`` (text -> band keys) is injectable so
    tests can force hot buckets deterministically (a driver-side
    monkeypatch would not reach Ray workers)."""

    def band_rows(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        out_key, out_id = [], []
        for doc_id, text in zip(ids, texts):
            if band_fn is not None:
                keys = band_fn(text)
            else:
                keys = sketches.lsh_band_keys(sketches.minhash(text))
            for key in keys:
                out_key.append(key)
                out_id.append(doc_id)
        return pa.table({"band_key": pa.array(out_key, pa.string()),
                         "doc_id": pa.array(out_id, pa.int64())})

    return band_rows


def _make_emit_pairs(bucket_cap: int):
    def emit_pairs(group: pa.Table) -> pa.Table:
        ids = sorted(group.column("doc_id").to_pylist())
        if len(ids) > bucket_cap:
            # star to the representative (lowest id): keeps every doc
            # connected to its dup-group transitively while bounding the
            # emission at O(n); the dropped direct pairs are logged, and
            # the verified loop re-attaches members whose star edge fails
            # verification (see minhash_verified_pairs repair pass)
            dropped = len(ids) * (len(ids) - 1) // 2 - (len(ids) - 1)
            logger.warning(
                "minhash_candidates: hot band %s has %d docs; emitting "
                "star pairs only (dropping %d direct pairs)",
                group.column("band_key")[0].as_py(), len(ids), dropped)
            a = [ids[0]] * (len(ids) - 1)
            b = ids[1:]
            star = [1] * (len(ids) - 1)
        else:
            a, b = [], []
            for i in range(len(ids)):
                for j in range(i + 1, len(ids)):
                    a.append(ids[i])
                    b.append(ids[j])
            star = [0] * len(a)
        return pa.table({"doc_a": pa.array(a, pa.int64()),
                         "doc_b": pa.array(b, pa.int64()),
                         "star": pa.array(star, pa.int8())})

    return emit_pairs


def minhash_candidates(docs: ray.data.Dataset,
                       bucket_cap: int = BAND_BUCKET_CAP,
                       band_fn=None,
                       keep_star: bool = False) -> ray.data.Dataset:
    """-> distinct (doc_a, doc_b, n_bands) near-duplicate candidate pairs.
    ``keep_star=True`` additionally returns the max star flag per pair
    (1 when the pair exists ONLY as a hot-band star edge) for the
    verified loop's repair pass."""
    bands = docs.map_batches(_make_band_rows(band_fn),
                             batch_format="pyarrow",
                             zero_copy_batch=True)
    # band_key cardinality is 16x the corpus: exchange on the hashed
    # partition id instead of sorting the key (relational.salted_map_groups)
    from pdf_parser_ray.pipelines.relational import salted_map_groups

    pairs = salted_map_groups(bands, ["band_key"],
                              _make_emit_pairs(bucket_cap), "pyarrow")
    # same pair can surface from several bands: dedupe. A pair is a star
    # edge only if NO band emitted it directly -> Min over the flag.
    # Candidate-pair cardinality is dup-bounded but can be large on
    # boilerplate-heavy corpora: the sort-free combine applies.
    from pdf_parser_ray.pipelines.relational import salted_agg

    out = salted_agg(pairs, ["doc_a", "doc_b"],
                     [("doc_a", "count_all", "n_bands"),
                      ("star", "min", "star")])
    if keep_star:
        return out

    def strip(batch: pa.Table) -> pa.Table:
        if "star" in batch.schema.names:
            return batch.drop_columns(["star"])
        return batch

    return out.map_batches(strip, batch_format="pyarrow",
                           zero_copy_batch=True)


# Shingle-pack separator. Must be a character that can NEVER occur inside
# a shingle: RE2 tokens exclude exactly [\t\n\f\r ] and shingles join
# tokens with " ", so "\n" is collision-free. (\x1f is NOT safe: it is
# Python-split whitespace but RE2 token content.)
_SHINGLE_SEP = "\n"


# --- SQL-twinnable MinHash (the eval-harness variant) --------------------
# The production minhash (functions/sketches.py) hashes shingles with
# crc32, which DuckDB cannot replicate, so its LSH screen is rows-only.
# This variant is built ONLY from operations an oracle can replay exactly:
#   shingle hash  h = md5_number_upper(shingle) >> 33          (31 bits)
#   permutation   v_p = (a_p * h + b_p) mod (2^31 - 1)
# — the Carter-Wegman family over MERSENNE-31, with a_p in [1, M-1] and
# b_p in [0, M) md5-derived from the permutation index. Every product
# fits int64/BIGINT on both engines (a*h < 2^62) and the whole signature
# is one numpy (S, P) broadcast. The modulus choice is load-bearing: an
# earlier draft used mod 2^61-1 with the same 31-bit a, which the
# docs_lsh_recall_curve harness caught red-handed — a*h wraps that
# modulus at most twice, so each "permutation" is just a few monotone
# runs of h and minima correlate across ALL perms (a measured J=0.974
# subset pair agreed on only 8/64 perms where theory says ~62; under
# Mersenne-31 the same pair agrees on 62). Same geometry as production
# (64 perms, 16 bands x 4 rows): the measured screen quality transfers.
MH_MERSENNE = (1 << 31) - 1
_MH_A = np.array([sketches._md5_64(f"mh-a-{p}") % (MH_MERSENNE - 1) + 1
                  for p in range(sketches.N_PERM)], dtype=np.uint64)
_MH_B = np.array([sketches._md5_64(f"mh-b-{p}") % MH_MERSENNE
                  for p in range(sketches.N_PERM)], dtype=np.uint64)


def md5_minhash_band_keys(text: str) -> list[str]:
    """LSH band keys for the md5-based (SQL-twinnable) minhash. Empty for
    docs with no shingles (< 3 words) — the oracle's shingle CTE domain."""
    sh = _sql_shingles(text)
    if not sh:
        return []
    h = np.array([sketches._md5_64(s) >> 33 for s in sh], dtype=np.uint64)
    v = (_MH_A[None, :] * h[:, None] + _MH_B[None, :]) % np.uint64(MH_MERSENNE)
    sig = v.min(axis=0)
    r = sketches.ROWS_PER_BAND
    return [f"{b}:" + ",".join(str(int(sig[b * r + i])) for i in range(r))
            for b in range(sketches.N_BANDS)]


def _sql_shingles(text: str) -> set[str]:
    """Word 3-shingles with the SQL oracle's exact domain: docs with
    fewer than 3 words have NO shingles (the oracle's shingle CTE is
    gated on len(w) >= 3 — unlike sketches.word_shingles, whose
    whole-text fallback would let two identical 1-word docs score
    jaccard 1.0 while the oracle emits no such pair). Tokenization is
    RE2 \\S+ (sketches.re2_tokens), matching the oracle's
    regexp_extract_all exactly — including on NBSP/\\v whitespace."""
    words = sketches.re2_tokens(text)
    if len(words) < 3:
        return set()
    return {" ".join(words[i:i + 3]) for i in range(len(words) - 2)}


def _shingle_rows(batch: pa.Table) -> pa.Table:
    """-> (doc_id, shingles): distinct word 3-shingles per doc, joined
    into one separator-delimited string (Arrow hash joins reject
    list-typed payload columns; string shingles — not hashes — keep the
    SQL twin byte-identical)."""
    ids = batch.column("doc_id")
    texts = batch.column("text").to_pylist()
    return pa.table({
        "doc_id": ids,
        "shingles": pa.array(
            [_SHINGLE_SEP.join(sorted(_sql_shingles(t))) for t in texts],
            pa.large_string()),
    })


def _shingle_set(packed: str) -> set[str]:
    return set(packed.split(_SHINGLE_SEP)) if packed else set()


_EMPTY_VERIFIED = pa.table({
    "doc_a": pa.array([], pa.int64()),
    "doc_b": pa.array([], pa.int64()),
    "jaccard": pa.array([], pa.float64()),
})


def _score_candidates(cands: ray.data.Dataset, shingles: ray.data.Dataset,
                      n_parts: int, threshold: float) -> ray.data.Dataset:
    """(doc_a, doc_b, star) candidates x (doc_id, shingles) -> scored
    (doc_a, doc_b, star, jaccard, keep): each pair meets its two shingle
    sets through two hash joins on doc_id (the co-group pattern)."""

    def rename(col: str):
        def fn(batch: pa.Table) -> pa.Table:
            return batch.rename_columns(["doc_id", col])
        return fn

    sh_a = shingles.map_batches(rename("sh_a"), batch_format="pyarrow",
                                zero_copy_batch=True)
    sh_b = shingles.map_batches(rename("sh_b"), batch_format="pyarrow",
                                zero_copy_batch=True)
    j1 = cands.join(sh_a, "inner", n_parts, on=("doc_a",),
                    right_on=("doc_id",))
    j2 = j1.join(sh_b, "inner", n_parts, on=("doc_b",),
                 right_on=("doc_id",))

    def score(batch: pa.Table) -> pa.Table:
        a_lists = batch.column("sh_a").to_pylist()
        b_lists = batch.column("sh_b").to_pylist()
        sims = [sketches.jaccard(_shingle_set(a), _shingle_set(b))
                for a, b in zip(a_lists, b_lists)]
        # a shingle-less doc (< 3 words) can never qualify: the oracle's
        # inverted-index join has no rows for it (jaccard(empty, empty)
        # would otherwise report 1.0)
        keep = [s >= threshold and bool(a) and bool(b)
                for s, a, b in zip(sims, a_lists, b_lists)]
        return pa.table({
            "doc_a": batch.column("doc_a"),
            "doc_b": batch.column("doc_b"),
            "star": batch.column("star"),
            "jaccard": pa.array([round_half_away(s, 4) for s in sims],
                                pa.float64()),
            "keep": pa.array(keep, pa.bool_()),
        })

    return j2.map_batches(score, batch_format="pyarrow")


def _kept_only(scored: ray.data.Dataset) -> ray.data.Dataset:
    def fn(batch: pa.Table) -> pa.Table:
        kept = batch.filter(batch.column("keep"))
        return kept.select(["doc_a", "doc_b", "jaccard"])

    return scored.map_batches(fn, batch_format="pyarrow",
                              zero_copy_batch=True)


def minhash_verified_pairs(docs: ray.data.Dataset,
                           threshold: float = 0.8,
                           bucket_cap: int = BAND_BUCKET_CAP,
                           band_fn=None,
                           repair_partner_cap: int = 64,
                           repair_gather_cap: int = 100_000) -> ray.data.Dataset:
    """The full dedup loop, distributed end to end: LSH candidates ->
    exact word-shingle Jaccard -> pairs with jaccard >= threshold.

    Candidate texts are NEVER gathered on the driver: the candidate doc
    set filters the corpus via a broadcast semi-join (``pc.is_in``), the
    per-doc shingle sets are computed distributed, and each pair meets
    its two shingle sets through two hash joins on doc_id (the co-group
    pattern; candidate volume is LSH-bounded, so the joins are small).

    Hot-band star repair: when a band bucket overflows ``bucket_cap``,
    candidates degrade to star edges (rep—member). A member whose star
    edge FAILS verification could silently lose its true near-dup pairs
    (the rep may be an outlier), so failed star edges get a second pass:
    each failed member is re-paired against up to ``repair_partner_cap``
    members of the same star (failed and verified alike, lowest ids
    first — deterministic) and those pairs are verified with the same
    exact kernel. The gather of failed star edges is bounded by
    ``repair_gather_cap`` (logged when truncated) — the repair set is
    hot-band-sized, not corpus-sized. Output: (doc_a, doc_b, jaccard) —
    jaccard rounded half-away to 4.
    """
    cands = minhash_candidates(docs, bucket_cap=bucket_cap,
                               band_fn=band_fn,
                               keep_star=True).materialize()

    # candidate doc ids — a compact Arrow array on the driver (the
    # broadcast semi-join build side; no text, no rows)
    id_chunks: list[pa.Array] = []
    for ref in cands.select_columns(["doc_a", "doc_b"]).to_arrow_refs():
        t = ray.get(ref)
        if "doc_a" not in t.schema.names:  # empty shuffle partitions
            continue
        id_chunks.extend(t.column("doc_a").chunks)
        id_chunks.extend(t.column("doc_b").chunks)
    if not id_chunks:
        return ray.data.from_arrow(_EMPTY_VERIFIED)
    wanted = pa.compute.unique(pa.chunked_array(id_chunks).combine_chunks())
    wref = ray.put(wanted)

    def keep_candidates(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return batch.filter(pc.is_in(batch.column("doc_id"),
                                     value_set=ray.get(wref)))

    shingles = (docs.map_batches(keep_candidates, batch_format="pyarrow",
                                 zero_copy_batch=True)
                .map_batches(_shingle_rows, batch_format="pyarrow",
                             zero_copy_batch=True)
                .materialize())  # joined twice (+ repair): pin once

    # Ray 2.49 Dataset.join fails if any hash partition receives zero
    # rows (internal empty table is schema-less and Acero rejects it), so
    # size the partition count to the known candidate count: 1 partition
    # until the pair set is big enough that an empty bucket is impossible
    # in practice
    n_pairs = cands.count()
    from pdf_parser_ray.pipelines.relational import join_partitions

    n_parts = join_partitions(n_pairs)
    # normalize the aggregate output: its empty partitions are
    # schema-less blocks that crash the Acero join
    from pdf_parser_ray.pipelines.relational import ensure_schema

    cand_schema = pa.schema([
        ("doc_a", pa.int64()), ("doc_b", pa.int64()), ("star", pa.int8())])
    cands = ensure_schema(
        cands, pa.schema([("doc_a", pa.int64()), ("doc_b", pa.int64()),
                          ("n_bands", pa.int64()), ("star", pa.int8())])
    ).select_columns(["doc_a", "doc_b", "star"])
    scored = _score_candidates(cands, shingles, n_parts,
                               threshold).materialize()

    def failed_star_rows(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        kept = batch.filter(pc.and_(
            pc.equal(batch.column("star"), pa.scalar(1, pa.int8())),
            pc.invert(batch.column("keep"))))
        return kept.select(["doc_a", "doc_b"])

    failed = scored.map_batches(failed_star_rows, batch_format="pyarrow",
                                zero_copy_batch=True)
    n_failed = failed.count()
    if n_failed == 0:
        return _kept_only(scored)

    # ---- repair pass: re-attach members whose star edge failed ----
    if n_failed > repair_gather_cap:
        logger.warning(
            "minhash_verified_pairs: %d failed star edges exceed the "
            "repair gather cap %d; repairing a deterministic prefix",
            n_failed, repair_gather_cap)
    failed_df = failed.limit(repair_gather_cap).to_pandas()

    def verified_star_rows(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        kept = batch.filter(pc.and_(
            pc.equal(batch.column("star"), pa.scalar(1, pa.int8())),
            batch.column("keep")))
        return kept.select(["doc_a", "doc_b"])

    verified_df = (scored.map_batches(verified_star_rows,
                                      batch_format="pyarrow",
                                      zero_copy_batch=True)
                   .limit(repair_gather_cap).to_pandas())

    rep_members: dict[int, list[int]] = {}
    if "doc_a" in verified_df.columns:  # empty gathers lose their schema
        for rep, grp in verified_df.groupby("doc_a"):
            rep_members[int(rep)] = sorted(int(x) for x in grp["doc_b"])
    out_a, out_b = [], []
    seen: set[tuple[int, int]] = set()
    for rep, grp in failed_df.groupby("doc_a"):
        failed_members = sorted(int(x) for x in grp["doc_b"])
        partners = sorted(set(failed_members)
                          | set(rep_members.get(int(rep), [])))
        partners = partners[:repair_partner_cap]
        for m in failed_members:
            for p in partners:
                if p == m:
                    continue
                pair = (min(m, p), max(m, p))
                if pair not in seen:
                    seen.add(pair)
                    out_a.append(pair[0])
                    out_b.append(pair[1])
    if not out_a:
        return _kept_only(scored)
    repair_cands = ray.data.from_arrow(pa.table({
        "doc_a": pa.array(out_a, pa.int64()),
        "doc_b": pa.array(out_b, pa.int64()),
        "star": pa.array([0] * len(out_a), pa.int8()),
    }, schema=cand_schema))
    from pdf_parser_ray.pipelines.relational import join_partitions

    repair_parts = join_partitions(len(out_a))
    repaired = _score_candidates(repair_cands, shingles, repair_parts,
                                 threshold)

    # union + dedupe: a repaired pair may also exist as a direct
    # candidate from a non-hot band (identical jaccard either way; min
    # on float is order-insensitive, so the sort-free combine is exact)
    from pdf_parser_ray.pipelines.relational import salted_agg

    union = _kept_only(scored).union(_kept_only(repaired))
    deduped = salted_agg(union, ["doc_a", "doc_b"],
                         [("jaccard", "min", "jaccard")])
    return ensure_schema(deduped, pa.schema([
        ("doc_a", pa.int64()), ("doc_b", pa.int64()),
        ("jaccard", pa.float64())]))


def ngram_jaccard_pairs(docs: ray.data.Dataset, threshold: float = 0.6,
                        num_partitions: int | None = None) -> ray.data.Dataset:
    """EXACT n-gram (word 3-shingle) Jaccard near-dup pairs — the
    sketch-free dedup variant: a distributed inverted-index self-join,
    no LSH recall caveat at any threshold.

    Plan (all Dataset programs; nothing corpus-sized on the driver):
      1. (h, doc_id, n) rows: distinct md5-64 shingle hashes per doc,
         each row carrying |doc|'s shingle count n (8 B hashes cross the
         shuffle, never shingle strings; carrying n eliminates the two
         count-attach joins a naive plan needs).
      2. inverted-index self-join on h (ONE hash-shuffle join) ->
         co-occurrence rows, oriented doc_a < doc_b.
      3. LENGTH FILTER (set-similarity length bound, PPJoin family):
         J <= min(|A|,|B|) / max(|A|,|B|), so min/max >= threshold is a
         LOSSLESS necessary condition — size-dissimilar pairs drop
         before the wide step.
      4. pair groupby (id-packed int64 key when ids fit 32 bits):
         Sum(c) = exact intersection, Min(n_a)/Min(n_b) carry the set
         sizes (constant per pair); jaccard = i / (n_a + n_b - i),
         filter >= threshold, round half-away to 4.

    Pairs sharing no shingle have J = 0 and can never qualify, so the
    inverted index is exact. Cost is driven by shingle document
    frequency: a boilerplate shingle shared by d docs contributes
    O(d^2) candidate rows — at web scale you drop stop-shingles above a
    document-frequency cap FIRST (the standard trade; not triggered on
    the testdata, where the exact SQL twin must match bit-for-bit). The
    wide step is the pair groupby; a low-entropy vocabulary (sf0.1
    testdata: 31 tokens) makes ~half of all doc pairs co-occur, and its
    cost is then Ray's aggregate constant (~14 s / 1M groups at 32
    CPUs), not this plan — the length filter and the map-side combine
    are the available levers. Oracle: the inverted-index SQL at the
    same threshold."""
    return _ngram_metric_pairs(docs, threshold, num_partitions,
                               metric="jaccard")


def ngram_containment_pairs(docs: ray.data.Dataset, threshold: float = 0.8,
                            num_partitions: int | None = None,
                            ) -> ray.data.Dataset:
    """EXACT n-gram (word 3-shingle) CONTAINMENT pairs — the
    subset-inclusion dedup Jaccard cannot see: C = |A∩B| / min(|A|,|B|)
    is ~1 whenever the smaller doc's shingles are (almost) all inside
    the larger one — a quoted article inside a wrapper page, a snippet
    inside its full post — while the same pair's Jaccard shrinks with
    the size ratio and slips under any dedup threshold.

    Same inverted-index plan as ngram_jaccard_pairs with two deltas:
      * NO length filter — the PPJoin size bound (min/max >= t) is a
        Jaccard-specific necessary condition and is LOSSY here (a tiny
        doc fully contained in a huge page has min/max ~ 0 but C = 1),
        so every co-occurring pair reaches the pair groupby;
      * score = i / min(n_a, n_b), rounded half-away to 4.
    Cost therefore scales with raw shingle document frequency; at web
    scale drop stop-shingles above a df cap first (the same standard
    trade the Jaccard docstring describes). Oracle: the inverted-index
    SQL with least(n_a, n_b) as the denominator."""
    return _ngram_metric_pairs(docs, threshold, num_partitions,
                               metric="containment")


def _ngram_metric_pairs(docs: ray.data.Dataset, threshold: float,
                        num_partitions: int | None,
                        metric: str) -> ray.data.Dataset:
    from pdf_parser_ray.pipelines.relational import (
        ensure_schema,
        join_partitions,
    )

    def sh_rows(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        out_h, out_id, out_n = [], [], []
        for doc_id, text in zip(ids, texts):
            hs = [sketches._md5_64(s) for s in _sql_shingles(text)]
            out_h.extend(hs)
            out_id.extend([doc_id] * len(hs))
            out_n.extend([len(hs)] * len(hs))
        return pa.table({
            "h": pa.array(np.array(out_h, dtype=np.uint64), pa.uint64()),
            "doc_id": pa.array(out_id, pa.int64()),
            "n": pa.array(out_n, pa.int64()),
        })

    score_col = "jaccard" if metric == "jaccard" else "containment"
    sh = docs.map_batches(sh_rows, batch_format="pyarrow",
                          zero_copy_batch=True).materialize()
    n_rows = sh.count()
    if n_rows == 0:
        return ray.data.from_arrow(pa.table({
            "doc_a": pa.array([], pa.int64()),
            "doc_b": pa.array([], pa.int64()),
            score_col: pa.array([], pa.float64()),
        }))
    # partition count: bounded by rows AND by cluster CPUs — join
    # aggregator pools sized past the core count deadlock on small
    # clusters (a 4-CPU session hung at 16 partitions; 16 CPUs fine)
    n_parts = num_partitions or join_partitions(n_rows, rows_per_part=4000)
    # id-packing precondition for the pair groupby: ids must fit 32 bits
    # (4.3e9 docs). Beyond that — a 10^12-doc corpus — remap to dense
    # per-shard ids first, or the plan falls back to a two-column key
    # (2x the sort cost, no id bound).
    packable = 0 <= sh.min("doc_id") and sh.max("doc_id") < 2 ** 32

    def rename(cols: list[str]):
        def fn(batch: pa.Table) -> pa.Table:
            return batch.rename_columns(cols)
        return fn

    right = sh.map_batches(rename(["h", "doc_b", "n_b"]),
                           batch_format="pyarrow", zero_copy_batch=True)
    joined = sh.join(right, "inner", n_parts, on=("h",))

    def orient(batch: pa.Table) -> pa.Table:
        # orient + length-filter + map-side combine: one output row per
        # (batch x surviving pair), with the pair sizes carried along
        import pyarrow.compute as pc

        kept = batch.filter(pc.less(batch.column("doc_id"),
                                    batch.column("doc_b")))
        a = kept.column("doc_id").to_numpy(zero_copy_only=False)
        b = kept.column("doc_b").to_numpy(zero_copy_only=False)
        na = kept.column("n").to_numpy(zero_copy_only=False)
        nb = kept.column("n_b").to_numpy(zero_copy_only=False)
        if metric == "jaccard":
            # PPJoin length bound — lossless for Jaccard only
            ok = (np.minimum(na, nb).astype(np.float64)
                  >= threshold * np.maximum(na, nb))
            a, b, na, nb = a[ok], b[ok], na[ok], nb[ok]
        if packable:
            pk = (a.astype(np.int64) << np.int64(32)) | b.astype(np.int64)
            keys, idx, cnts = np.unique(pk, return_index=True,
                                        return_counts=True)
            return pa.table({"pk": pa.array(keys, pa.int64()),
                             "c": pa.array(cnts, pa.int64()),
                             "n_a": pa.array(na[idx], pa.int64()),
                             "n_b": pa.array(nb[idx], pa.int64())})
        import pandas as pd

        part = (pd.DataFrame({"doc_a": a, "doc_b": b,
                              "n_a": na, "n_b": nb})
                .groupby(["doc_a", "doc_b"], sort=False)
                .agg(c=("n_a", "size"), n_a=("n_a", "first"),
                     n_b=("n_b", "first")).reset_index())
        return pa.table({"doc_a": pa.array(part["doc_a"], pa.int64()),
                         "doc_b": pa.array(part["doc_b"], pa.int64()),
                         "c": pa.array(part["c"], pa.int64()),
                         "n_a": pa.array(part["n_a"], pa.int64()),
                         "n_b": pa.array(part["n_b"], pa.int64())})

    partials = joined.map_batches(orient, batch_format="pyarrow",
                                  zero_copy_batch=True)
    # sort-free hash-partitioned final combine: the pair key space is the
    # wide step here (sf0.1's dense vocabulary makes ~1M pair groups), and
    # all three ops are order-insensitive integer folds — exactly
    # salted_agg's contract (Ray's key-sorted aggregate was the measured
    # ~14 s/1M-group constant this stage used to pay)
    from pdf_parser_ray.pipelines.relational import salted_agg

    pair_aggs = [("c", "sum", "i"), ("n_a", "min", "n_a"),
                 ("n_b", "min", "n_b")]
    inter = salted_agg(partials, ["pk"] if packable else ["doc_a", "doc_b"],
                       pair_aggs, num_partitions=n_parts)

    def score(batch: pa.Table) -> pa.Table:
        empty = pa.table({"doc_a": pa.array([], pa.int64()),
                          "doc_b": pa.array([], pa.int64()),
                          score_col: pa.array([], pa.float64())})
        names = batch.schema.names
        if "i" not in names:  # schema-less empty shuffle block
            return empty
        if "pk" in names:
            pk = batch.column("pk").to_numpy(zero_copy_only=False)
            a = pk >> np.int64(32)
            b = pk & np.int64(0xFFFFFFFF)
        else:
            a = batch.column("doc_a").to_numpy(zero_copy_only=False)
            b = batch.column("doc_b").to_numpy(zero_copy_only=False)
        i = batch.column("i").to_numpy(zero_copy_only=False).astype(np.float64)
        na = batch.column("n_a").to_numpy(zero_copy_only=False)
        nb = batch.column("n_b").to_numpy(zero_copy_only=False)
        if metric == "jaccard":
            sim = i / (na + nb - i)
        else:
            sim = i / np.minimum(na, nb)
        keep = sim >= threshold
        from pdf_parser_ray.functions.num import np_round_half_away

        return pa.table({
            "doc_a": pa.array(a[keep], pa.int64()),
            "doc_b": pa.array(b[keep], pa.int64()),
            score_col: pa.array(np_round_half_away(sim[keep], 4),
                                pa.float64()),
        })

    out = inter.map_batches(score, batch_format="pyarrow",
                            zero_copy_batch=True)
    return ensure_schema(out, pa.schema([
        ("doc_a", pa.int64()), ("doc_b", pa.int64()),
        (score_col, pa.float64())]))


def simhash_signatures(docs: ray.data.Dataset) -> ray.data.Dataset:
    def sig_batch(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "simhash": pa.array([f"{sketches.simhash(t):016x}" for t in texts],
                                pa.string()),
        })

    return docs.map_batches(sig_batch, batch_format="pyarrow",
                            zero_copy_batch=True)


def simhash_pairs(docs: ray.data.Dataset, max_hamming: int = 3,
                  bucket_cap: int = SIMHASH_BUCKET_CAP) -> ray.data.Dataset:
    """-> (doc_a, doc_b, hamming) for all pairs with hamming distance <=
    ``max_hamming`` between 64-bit SimHash signatures.

    Candidates via 16-bit chunk banding — EXACT for max_hamming <= 3
    (pigeonhole over 4 chunks); in-bucket hamming is computed from the
    signatures carried with the band rows, pairs deduped by a
    (doc_a, doc_b) groupby. Hot buckets (identical chunks across > cap
    docs) are star-capped like the minhash bands."""
    if max_hamming >= sketches.SIMHASH_CHUNKS:
        raise ValueError(
            f"chunk banding is exact only for hamming < "
            f"{sketches.SIMHASH_CHUNKS}, got {max_hamming}")

    def band_rows(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        out_key, out_id, out_sig = [], [], []
        for doc_id, text in zip(ids, texts):
            sig = sketches.simhash(text)
            for key in sketches.simhash_band_keys(sig):
                out_key.append(key)
                out_id.append(doc_id)
                out_sig.append(sig)
        return pa.table({
            "chunk_key": pa.array(out_key, pa.string()),
            "doc_id": pa.array(out_id, pa.int64()),
            "sig": pa.array(np.array(out_sig, dtype=np.uint64),
                            pa.uint64()),
        })

    def bucket_pairs(group: pa.Table) -> pa.Table:
        n = group.num_rows
        empty = pa.table({"doc_a": pa.array([], pa.int64()),
                          "doc_b": pa.array([], pa.int64()),
                          "hamming": pa.array([], pa.int64())})
        if n < 2:
            return empty
        order = pa.compute.sort_indices(group.column("doc_id"))
        group = group.take(order)
        if n > bucket_cap:
            logger.warning(
                "simhash_pairs: hot chunk %s has %d docs; truncating to %d",
                group.column("chunk_key")[0].as_py(), n, bucket_cap)
            group = group.slice(0, bucket_cap)
            n = bucket_cap
        ids = group.column("doc_id").to_numpy(zero_copy_only=False)
        sigs = group.column("sig").to_numpy(zero_copy_only=False)
        ia, ib = np.triu_indices(n, 1)
        x = sigs[ia] ^ sigs[ib]
        ham = np.zeros(len(x), dtype=np.int64)
        for _ in range(64):  # popcount via shift-mask (vectorized)
            ham += (x & np.uint64(1)).astype(np.int64)
            x >>= np.uint64(1)
            if not x.any():
                break
        keep = ham <= max_hamming
        return pa.table({
            "doc_a": pa.array(ids[ia[keep]], pa.int64()),
            "doc_b": pa.array(ids[ib[keep]], pa.int64()),
            "hamming": pa.array(ham[keep], pa.int64()),
        })

    banded = docs.map_batches(band_rows, batch_format="pyarrow",
                              zero_copy_batch=True)
    from pdf_parser_ray.pipelines.relational import (
        salted_agg,
        salted_map_groups,
    )

    pairs = salted_map_groups(banded, ["chunk_key"], bucket_pairs,
                              "pyarrow")
    return salted_agg(pairs, ["doc_a", "doc_b"],
                      [("hamming", "min", "hamming")])


def verify_candidates_jaccard(docs: ray.data.Dataset,
                              pairs: list[tuple[int, int]],
                              threshold: float = 0.6) -> list[dict]:
    """Exact word-shingle Jaccard for an explicit (small) candidate list.
    The corpus filter is a broadcast semi-join (``pc.is_in``), never a
    per-row Python lambda; for the fully-distributed pipeline form see
    ``minhash_verified_pairs``."""
    wanted = pa.array(sorted({d for p in pairs for d in p}), pa.int64())
    wref = ray.put(wanted)

    def keep(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return batch.filter(pc.is_in(batch.column("doc_id"),
                                     value_set=ray.get(wref)))

    texts = {}
    sh = (docs.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)
          .map_batches(_shingle_rows, batch_format="pyarrow",
                       zero_copy_batch=True))
    for row in sh.take_all():
        texts[row["doc_id"]] = _shingle_set(row["shingles"])
    out = []
    for a, b in pairs:
        sim = sketches.jaccard(texts.get(a, set()), texts.get(b, set()))
        if sim >= threshold:
            out.append({"doc_a": a, "doc_b": b,
                        "jaccard": round_half_away(sim, 4)})
    return out


# ---- sorted-neighborhood (SNM) dedup --------------------------------------

SNM_WINDOW = 5       # each doc meets its 4 sort-order successors
SNM_KEY_LEN = 16     # blocking key: first 16 code points of the text


def _snm_cross_pairs(strips: list[dict], window: int) -> list[tuple[int, int]]:
    """Stitch cross-partition window pairs from the boundary strips.

    Strips carry (part, idx, size, doc_id) for every row within
    ``window - 1`` of a partition edge, so EVERY row that can form a
    cross-partition pair is present (a partition smaller than the strip
    width is entirely inside its own strips, so gaps spanning >2
    partitions are covered too). Global position = partition offset +
    in-partition index; emit (min, max) for strip rows in DIFFERENT
    partitions at global distance 1..window-1. Driver structure is
    O(n_partitions * window), never corpus-proportional."""
    sizes: dict[int, int] = {}
    for r in strips:
        sizes[int(r["part"])] = int(r["size"])
    offsets: dict[int, int] = {}
    acc = 0
    for p in sorted(sizes):
        offsets[p] = acc
        acc += sizes[p]
    rows = sorted(
        {(offsets[int(r["part"])] + int(r["idx"]), int(r["part"]),
          int(r["doc_a"])) for r in strips})
    out: list[tuple[int, int]] = []
    for i, (pos_i, part_i, id_i) in enumerate(rows):
        for j in range(i + 1, len(rows)):
            pos_j, part_j, id_j = rows[j]
            if pos_j - pos_i > window - 1:
                break
            if part_j != part_i:
                out.append((min(id_i, id_j), max(id_i, id_j)))
    return out


def snm_pairs(docs: ray.data.Dataset, threshold: float = 0.6,
              window: int = SNM_WINDOW, key_len: int = SNM_KEY_LEN,
              rows_per_part: int = 4096,
              sample_mod: int = 64) -> ray.data.Dataset:
    """Sorted-neighborhood dedup: sort all docs by a short blocking key
    (text prefix, ties by doc_id), slide a ``window``-row window over the
    sorted order, and keep the window pairs whose exact word-3-shingle
    Jaccard >= ``threshold``. A SORT-based blocking strategy — the
    classic complement to the hash blocking used by minhash/LSH and the
    inverted-index join: near-dups with a shared prefix land adjacent
    regardless of how rare their shingles are.

    Distributed plan (no global sort operator, no driver text):
      1. tiny projection (doc_id, key) — text never leaves the scan;
      2. deterministic 1/``sample_mod`` key sample (doc_id % mod == 0,
         RNG-free) -> contiguous range boundaries for
         ~corpus/``rows_per_part`` partitions (the sample, not the
         corpus, touches the driver — same contract as a range
         partitioner's boundary sampling);
      3. one hash exchange on the partition id (salted_map_groups), an
         in-partition mergesort + vectorized shifted-array window pair
         emission, plus (window-1)-row boundary strips;
      4. cross-partition pairs stitched on the driver from the strips
         (O(parts * window) rows — see _snm_cross_pairs);
      5. exact Jaccard via the shared distributed double-join verifier
         (_score_candidates), same oracle domain as ngram_jaccard_pairs.

    Scale levers: ``rows_per_part`` bounds per-task memory;
    ``sample_mod`` bounds the driver's boundary sample. Returns
    (doc_a, doc_b, jaccard) with doc_a < doc_b."""
    import bisect

    import pyarrow.compute as pc

    from pdf_parser_ray.pipelines.relational import (
        ensure_schema, join_partitions, salted_map_groups)

    def key_rows(batch: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "k": pc.cast(pc.utf8_slice_codeunits(
                batch.column("text"), 0, key_len), pa.large_string()),
        })

    proj = docs.map_batches(key_rows, batch_format="pyarrow",
                            zero_copy_batch=True)

    # -- boundary sample (deterministic, driver-bounded) --
    def sample_rows(batch: pa.Table) -> pa.Table:
        keep = pc.equal(pc.bit_wise_and(
            batch.column("doc_id"), pa.scalar(sample_mod - 1, pa.int64())),
            pa.scalar(0, pa.int64()))
        return batch.filter(keep)

    assert sample_mod & (sample_mod - 1) == 0, "sample_mod must be 2^k"
    sample = sorted((r["k"], r["doc_id"])
                    for r in proj.map_batches(
                        sample_rows, batch_format="pyarrow",
                        zero_copy_batch=True).take_all())
    est_n = max(1, len(sample)) * sample_mod
    n_parts_snm = max(1, min(4096, -(-est_n // rows_per_part)))
    if n_parts_snm > 1 and len(sample) >= n_parts_snm:
        step = len(sample) / n_parts_snm
        bounds = [sample[int(step * i)] for i in range(1, n_parts_snm)]
    else:
        bounds = []
        n_parts_snm = 1
    bkeys = [b[0] for b in bounds]
    bref = ray.put((bkeys, bounds))

    def assign(batch: pa.Table) -> pa.Table:
        bk, bnd = ray.get(bref)
        if not bnd:
            part = np.zeros(batch.num_rows, dtype=np.int64)
        else:
            keys = batch.column("k").to_pylist()
            ids = batch.column("doc_id").to_pylist()
            karr = np.array(keys, dtype=object)
            lo = np.searchsorted(bk, karr, side="left")
            hi = np.searchsorted(bk, karr, side="right")
            part = hi.astype(np.int64)
            for i in np.flatnonzero(lo < hi):  # key ties a boundary key
                part[i] = lo[i] + bisect.bisect_right(
                    bnd, (keys[i], ids[i]), lo=int(lo[i]), hi=int(hi[i])) \
                    - int(lo[i])
        return batch.append_column("snm_part", pa.array(part, pa.int64()))

    assigned = proj.map_batches(assign, batch_format="pyarrow",
                                zero_copy_batch=True)

    w = window - 1  # strip width / max in-window gap

    def per_part(g):
        import pandas as pd

        g = g.sort_values(["k", "doc_id"], kind="mergesort")
        ids = g["doc_id"].to_numpy(dtype="int64")
        n = len(ids)
        part = int(g["snm_part"].iloc[0])
        pa_list, pb_list = [], []
        for d in range(1, min(window, n)):
            pa_list.append(ids[:-d])
            pb_list.append(ids[d:])
        if pa_list:
            a = np.concatenate(pa_list)
            b = np.concatenate(pb_list)
            doc_a, doc_b = np.minimum(a, b), np.maximum(a, b)
        else:
            doc_a = doc_b = np.array([], dtype="int64")
        sidx = np.unique(np.concatenate(
            [np.arange(min(n, w)), np.arange(max(0, n - w), n)]))
        return pd.DataFrame({
            "kind": np.concatenate([np.zeros(len(doc_a), dtype="int8"),
                                    np.ones(len(sidx), dtype="int8")]),
            "doc_a": np.concatenate([doc_a, ids[sidx]]),
            "doc_b": np.concatenate([doc_b,
                                     np.full(len(sidx), -1, "int64")]),
            "part": np.full(len(doc_a) + len(sidx), part, "int64"),
            "idx": np.concatenate([np.full(len(doc_a), -1, "int64"), sidx]),
            "size": np.full(len(doc_a) + len(sidx), n, "int64"),
        })

    mixed = salted_map_groups(assigned, ["snm_part"], per_part)
    mixed = ensure_schema(mixed, pa.schema([
        ("kind", pa.int8()), ("doc_a", pa.int64()), ("doc_b", pa.int64()),
        ("part", pa.int64()), ("idx", pa.int64()), ("size", pa.int64()),
    ])).materialize()  # consumed twice (pairs + strips); int rows only

    def pair_rows(batch: pa.Table) -> pa.Table:
        kept = batch.filter(pc.equal(batch.column("kind"),
                                     pa.scalar(0, pa.int8())))
        return kept.select(["doc_a", "doc_b"])

    def strip_rows(batch: pa.Table) -> pa.Table:
        kept = batch.filter(pc.equal(batch.column("kind"),
                                     pa.scalar(1, pa.int8())))
        return kept.select(["doc_a", "part", "idx", "size"])

    strips = mixed.map_batches(strip_rows, batch_format="pyarrow",
                               zero_copy_batch=True).take_all()
    cross = _snm_cross_pairs(strips, window) if n_parts_snm > 1 else []

    pair_schema = pa.schema([("doc_a", pa.int64()), ("doc_b", pa.int64())])
    cands = mixed.map_batches(pair_rows, batch_format="pyarrow",
                              zero_copy_batch=True)
    if cross:
        cands = cands.union(ray.data.from_arrow(pa.table({
            "doc_a": pa.array([p[0] for p in cross], pa.int64()),
            "doc_b": pa.array([p[1] for p in cross], pa.int64()),
        }, schema=pair_schema)))

    def add_star(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "star", pa.array(np.zeros(batch.num_rows, dtype="int8"),
                             pa.int8()))

    cands = ensure_schema(cands, pair_schema).map_batches(
        add_star, batch_format="pyarrow", zero_copy_batch=True)

    n_cands = cands.count()
    if n_cands == 0:  # singleton corpus: nothing to verify, and an
        # empty Dataset.join input is schema-less (Acero rejects it)
        return ray.data.from_arrow(_EMPTY_VERIFIED)

    shingles = docs.map_batches(_shingle_rows, batch_format="pyarrow",
                                zero_copy_batch=True)
    n_parts = join_partitions(n_cands)
    scored = _score_candidates(cands, shingles, n_parts, threshold)
    return ensure_schema(_kept_only(scored), pa.schema([
        ("doc_a", pa.int64()), ("doc_b", pa.int64()),
        ("jaccard", pa.float64())]))


# ---- incremental (base vs incoming) near-dedup -----------------------------

def bipartite_jaccard_hits(base: ray.data.Dataset,
                           incoming: ray.data.Dataset,
                           threshold: float = 0.6,
                           num_partitions: int | None = None,
                           ) -> ray.data.Dataset:
    """Incoming docs that near-duplicate SOME base doc (word-3-shingle
    Jaccard >= threshold) — the incremental-crawl dedup primitive: a new
    shard is deduped AGAINST the standing corpus without re-pairing the
    corpus with itself. Same inverted-index plan as ngram_jaccard_pairs
    but BIPARTITE: the gram join crosses incoming x base only, so the
    base side never self-pairs — at web scale that is the whole point
    (|base| >> |incoming| per increment, and base x base is the O(n^2)
    term this avoids). Returns distinct incoming doc_ids with a hit.

    Doc ids must be disjoint across the two sides (same corpus split or
    globally unique ids). PPJoin length bound applies (Jaccard-lossless).
    Stop-shingle df capping is the same web-scale lever as the self-join
    variant."""
    from pdf_parser_ray.pipelines.relational import (
        ensure_schema, join_partitions, salted_agg)

    def sh_rows(cols: list[str]):
        def fn(batch: pa.Table) -> pa.Table:
            ids = batch.column("doc_id").to_pylist()
            texts = batch.column("text").to_pylist()
            out_h, out_id, out_n = [], [], []
            for doc_id, text in zip(ids, texts):
                hs = [sketches._md5_64(s) for s in _sql_shingles(text)]
                out_h.extend(hs)
                out_id.extend([doc_id] * len(hs))
                out_n.extend([len(hs)] * len(hs))
            return pa.table({
                cols[0]: pa.array(np.array(out_h, dtype=np.uint64),
                                  pa.uint64()),
                cols[1]: pa.array(out_id, pa.int64()),
                cols[2]: pa.array(out_n, pa.int64()),
            })
        return fn

    sh_inc = incoming.map_batches(sh_rows(["h", "inc_id", "n_i"]),
                                  batch_format="pyarrow",
                                  zero_copy_batch=True).materialize()
    n_inc_rows = sh_inc.count()
    empty = pa.table({"doc_id": pa.array([], pa.int64())})
    if n_inc_rows == 0:
        return ray.data.from_arrow(empty)
    sh_base = base.map_batches(sh_rows(["h", "base_id", "n_b"]),
                               batch_format="pyarrow",
                               zero_copy_batch=True).materialize()
    if sh_base.count() == 0:  # gram-less base: nothing can hit, and an
        # empty join side is schema-less (Acero rejects it)
        return ray.data.from_arrow(empty)
    n_parts = num_partitions or join_partitions(n_inc_rows,
                                                rows_per_part=4000)
    joined = sh_inc.join(sh_base, "inner", n_parts, on=("h",))

    packable = (0 <= sh_inc.min("inc_id")
                and sh_inc.max("inc_id") < 2 ** 31)

    def combine(batch: pa.Table) -> pa.Table:
        import pandas as pd

        a = batch.column("inc_id").to_numpy(zero_copy_only=False)
        b = batch.column("base_id").to_numpy(zero_copy_only=False)
        na = batch.column("n_i").to_numpy(zero_copy_only=False)
        nb = batch.column("n_b").to_numpy(zero_copy_only=False)
        ok = (np.minimum(na, nb).astype(np.float64)
              >= threshold * np.maximum(na, nb))  # PPJoin (lossless)
        a, b, na, nb = a[ok], b[ok], na[ok], nb[ok]
        if packable and len(b) and 0 <= b.min() and b.max() < 2 ** 32:
            pk = (a.astype(np.int64) << np.int64(32)) | b.astype(np.int64)
            keys, idx, cnts = np.unique(pk, return_index=True,
                                        return_counts=True)
            return pa.table({"pk": pa.array(keys, pa.int64()),
                             "c": pa.array(cnts, pa.int64()),
                             "n_a": pa.array(na[idx], pa.int64()),
                             "n_b": pa.array(nb[idx], pa.int64())})
        part = (pd.DataFrame({"pk": a, "base_id": b, "n_a": na, "n_b": nb})
                .groupby(["pk", "base_id"], sort=False)
                .agg(c=("n_a", "size"), n_a=("n_a", "first"),
                     n_b=("n_b", "first")).reset_index())
        return pa.table({"pk": pa.array(part["pk"], pa.int64()),
                         "base_id": pa.array(part["base_id"], pa.int64()),
                         "c": pa.array(part["c"], pa.int64()),
                         "n_a": pa.array(part["n_a"], pa.int64()),
                         "n_b": pa.array(part["n_b"], pa.int64())})

    partials = joined.map_batches(combine, batch_format="pyarrow",
                                  zero_copy_batch=True)
    keys = ["pk"] if packable else ["pk", "base_id"]
    inter = salted_agg(partials, keys,
                       [("c", "sum", "i"), ("n_a", "min", "n_a"),
                        ("n_b", "min", "n_b")],
                       num_partitions=n_parts)

    def hits(batch: pa.Table) -> pa.Table:
        if "i" not in batch.schema.names:  # schema-less empty block
            return empty
        pk = batch.column("pk").to_numpy(zero_copy_only=False)
        inc = pk >> np.int64(32) if "base_id" not in batch.schema.names \
            else pk
        i = (batch.column("i").to_numpy(zero_copy_only=False)
             .astype(np.float64))
        na = batch.column("n_a").to_numpy(zero_copy_only=False)
        nb = batch.column("n_b").to_numpy(zero_copy_only=False)
        keep = i / (na + nb - i) >= threshold
        return pa.table({"doc_id": pa.array(np.unique(inc[keep]),
                                            pa.int64())})

    out = inter.map_batches(hits, batch_format="pyarrow",
                            zero_copy_batch=True)
    # distinct across partitions (a hot incoming doc hits many base docs)
    distinct = salted_agg(ensure_schema(out, empty.schema),
                          ["doc_id"], [])
    # the trailing zero-row union pins a typed block even when the
    # shuffle emits NO blocks (ds.schema() would be None downstream)
    return (ensure_schema(distinct, empty.schema)
            .union(ray.data.from_arrow(empty)))




def url_dedup(pages: ray.data.Dataset, url_col: str = "url",
              broadcast_max: int = 5_000_000) -> ray.data.Dataset:
    """Canonical-URL exact dedup over a pages corpus: keep EXACTLY ONE
    row per canonical URL (functions/urlnorm.canonical_url — RFC 3986
    normalization + tracking-param strip), the crawl-hygiene pass that
    runs BEFORE any content dedup. The keeper is the lexicographically
    smallest raw spelling (null URLs coalesce to "" on BOTH gate paths,
    so a null-URL group behaves like any other); when several rows
    carry the identical keeper spelling (an exact re-crawl — the most
    common crawl duplicate), one is picked by a deterministic per-group
    rule, so output is parallelism-invariant.

    Plan: one projection pass emits (canon fp, raw url) — 8-byte keys,
    never page bytes; one salted combine builds per-fp (n, keep_url);
    only DUP groups (n > 1, dup-bounded) survive into the filter
    structure, SIZE-GATED like every dup artifact in this repo
    (broadcast below ``broadcast_max`` dup groups, hash joins above).
    The corpus is scanned ONCE into a materialized fp-annotated form
    (spillable object-store pin — the explode-path barrier precedent);
    non-dup rows filter through untouched, and the keeper-spelling rows
    of dup groups — dup-bounded — take ONE extra fp-keyed exchange
    where each group keeps its first row under a stable all-column
    ordering."""
    import pyarrow.compute as pc

    from pdf_parser_ray.functions.sketches import _md5_64
    from pdf_parser_ray.functions.urlnorm import canonical_url
    from pdf_parser_ray.pipelines import relational as rel

    def _fp(u) -> int:
        return _md5_64("url:" + canonical_url(u or "")) & ((1 << 63) - 1)

    def _u_col(batch: pa.Table) -> pa.ChunkedArray:
        # null URLs -> "" so grouping, keeper min and the spelling
        # compare see ONE total domain on both gate paths
        return pc.coalesce(pc.cast(batch.column(url_col), pa.string()),
                           pa.scalar("", pa.string()))

    def fp_rows(batch: pa.Table) -> pa.Table:
        u = _u_col(batch)
        return pa.table({
            "fp": pa.array([_fp(v) for v in u.to_pylist()], pa.int64()),
            "u": u})

    per_fp = rel.salted_agg(
        pages.map_batches(fp_rows, batch_format="pyarrow",
                          zero_copy_batch=True),
        ["fp"], [("u", "min", "keep_url"), ("", "count_all", "n")])

    def dups_only(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.greater(batch.column("n"),
                                       pa.scalar(1, pa.int64()))) \
            .select(["fp", "keep_url"])

    keep_schema = pa.schema([("fp", pa.int64()),
                             ("keep_url", pa.string())])
    dup_keepers = rel.ensure_schema(
        per_fp.map_batches(dups_only, batch_format="pyarrow",
                           zero_copy_batch=True), keep_schema).materialize()
    n_dup = dup_keepers.count()
    if n_dup == 0:
        return pages

    def pick_one(group: pa.Table) -> pa.Table:
        # deterministic pick among a dup group's keeper-spelling rows:
        # first row under a stable stringified all-column order (rows
        # may be byte-identical — any pick is then equal by definition)
        cols = [c for c in group.schema.names if c != "fp"]
        n = group.num_rows
        if n > 1:
            keys = sorted(range(n), key=lambda i: tuple(
                str(group.column(c)[i].as_py()) for c in cols))
            group = group.take(pa.array([keys[0]], pa.int64()))
        return group.select(cols)

    # ONE corpus scan: annotate every row with its fp, then pin the
    # annotated form so the pass/candidate branches don't re-read the
    # source (review catch: the draft scanned + re-hashed twice)
    def add_fp(batch: pa.Table) -> pa.Table:
        u = _u_col(batch)
        return batch.append_column(
            "fp", pa.array([_fp(v) for v in u.to_pylist()], pa.int64()))

    with_fp = pages.map_batches(add_fp, batch_format="pyarrow",
                                zero_copy_batch=True).materialize()

    if n_dup <= broadcast_max:
        kdf = dup_keepers.to_pandas()
        order = np.argsort(kdf["fp"].to_numpy(np.int64))
        ref = ray.put((kdf["fp"].to_numpy(np.int64)[order],
                       kdf["keep_url"].to_numpy()[order]))

        def classify(batch: pa.Table):
            fps_s, keeps = ray.get(ref)
            fps = batch.column("fp").to_numpy(zero_copy_only=False)
            u = np.asarray(_u_col(batch).to_pylist(), dtype=object)
            pos = np.clip(np.searchsorted(fps_s, fps), 0, len(fps_s) - 1)
            in_dup = fps_s[pos] == fps
            is_keep = in_dup & (u == keeps[pos])
            return in_dup, is_keep

        def pass_through(batch: pa.Table) -> pa.Table:
            in_dup, _ = classify(batch)
            return batch.filter(pa.array(~in_dup)).drop_columns(["fp"])

        def candidates(batch: pa.Table) -> pa.Table:
            _, is_keep = classify(batch)
            return batch.filter(pa.array(is_keep))

        passed = with_fp.map_batches(pass_through, batch_format="pyarrow",
                                     zero_copy_batch=True)
        cands = with_fp.map_batches(candidates, batch_format="pyarrow",
                                    zero_copy_batch=True)
    else:
        fact_schema = pa.schema(
            list(zip(pages.schema().base_schema.names,
                     pages.schema().base_schema.types))
        ).append(pa.field("fp", pa.int64()))
        n_parts = rel.join_partitions(n_dup)
        # anti join: rows outside every dup group stream through
        passed = rel.hash_join_guarded(
            with_fp, dup_keepers.select_columns(["fp"]), "fp", "fp",
            n_parts, fact_schema, pa.schema([("fp", pa.int64())]),
            join_type="left_anti").map_batches(
            lambda b: b.drop_columns(["fp"]), batch_format="pyarrow",
            zero_copy_batch=True)
        # inner join: dup-group rows learn their keeper spelling
        in_dup = rel.hash_join_guarded(
            with_fp, dup_keepers, "fp", "fp", n_parts,
            fact_schema, keep_schema, join_type="inner")

        def keeper_spelling(batch: pa.Table) -> pa.Table:
            mask = pc.equal(_u_col(batch), batch.column("keep_url"))
            return batch.filter(mask).drop_columns(["keep_url"])

        cands = in_dup.map_batches(keeper_spelling, batch_format="pyarrow",
                                   zero_copy_batch=True)

    picked = rel.salted_map_groups(cands, ["fp"], pick_one, "pyarrow")
    return passed.union(picked)
