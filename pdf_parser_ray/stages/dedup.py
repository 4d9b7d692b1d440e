"""Deduplication pipelines over the ``documents`` table.

* exact: md5 fingerprint -> hash-partitioned group -> keep the minimum
  doc_id per identical text. One shuffle of (fp, doc_id) pairs only —
  never the text itself.
* MinHash+LSH: shingle -> 64-perm minhash -> 16 band keys -> groupby(band)
  emits candidate pairs -> pair-dedup. Shuffles tiny (band_key, doc_id)
  rows; candidate volume is data-dependent, not O(n^2).
* SimHash: 64-bit signatures per doc (pairing/hamming filters downstream).
* n-gram Jaccard verification of LSH candidates.
"""

from __future__ import annotations

import pyarrow as pa
import ray.data

from pdf_parser_ray.functions import sketches
from pdf_parser_ray.functions.num import round_half_away
from pdf_parser_ray.stages.text import fingerprint_batch


def exact_dedup(docs: ray.data.Dataset) -> ray.data.Dataset:
    """-> (fp, doc_id): one row per distinct text, doc_id = min."""
    fps = docs.map_batches(fingerprint_batch, batch_format="pyarrow",
                           zero_copy_batch=True)
    from ray.data.aggregate import Min

    return fps.groupby("fp").aggregate(Min("doc_id", alias_name="doc_id"))


def _band_rows(batch: pa.Table) -> pa.Table:
    ids = batch.column("doc_id").to_pylist()
    texts = batch.column("text").to_pylist()
    out_key, out_id = [], []
    for doc_id, text in zip(ids, texts):
        sig = sketches.minhash(text)
        for key in sketches.lsh_band_keys(sig):
            out_key.append(key)
            out_id.append(doc_id)
    return pa.table({"band_key": pa.array(out_key, pa.string()),
                     "doc_id": pa.array(out_id, pa.int64())})


def _emit_pairs(group: pa.Table) -> pa.Table:
    ids = sorted(group.column("doc_id").to_pylist())
    a, b = [], []
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            a.append(ids[i])
            b.append(ids[j])
    return pa.table({"doc_a": pa.array(a, pa.int64()),
                     "doc_b": pa.array(b, pa.int64())})


def minhash_candidates(docs: ray.data.Dataset) -> ray.data.Dataset:
    """-> distinct (doc_a, doc_b) near-duplicate candidate pairs."""
    bands = docs.map_batches(_band_rows, batch_format="pyarrow",
                             zero_copy_batch=True)
    pairs = bands.groupby("band_key").map_groups(_emit_pairs,
                                                batch_format="pyarrow")
    # same pair can surface from several bands: dedupe
    from ray.data.aggregate import Count

    return (pairs.groupby(["doc_a", "doc_b"])
            .aggregate(Count(alias_name="n_bands")))


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


def verify_candidates_jaccard(docs: ray.data.Dataset,
                              pairs: list[tuple[int, int]],
                              threshold: float = 0.6) -> list[dict]:
    """Exact word-shingle Jaccard for candidate pairs. Sandbox path
    broadcasts the candidate docs' texts; at corpus scale the same check
    runs as a double broadcast-semi + co-group join keyed on doc_id."""
    import ray

    wanted = {d for p in pairs for d in p}
    texts = {}
    for row in docs.filter(lambda r: r["doc_id"] in wanted).take_all():
        texts[row["doc_id"]] = row["text"]
    out = []
    for a, b in pairs:
        sim = sketches.jaccard(
            sketches.word_shingles(texts.get(a, "")),
            sketches.word_shingles(texts.get(b, "")),
        )
        if sim >= threshold:
            out.append({"doc_a": a, "doc_b": b,
                        "jaccard": round_half_away(sim, 4)})
    return out
