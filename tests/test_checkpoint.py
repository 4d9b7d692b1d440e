"""Checkpoint/resume semantics: completed partitions are skipped, dead
partial output is cleared, config changes invalidate old manifests, and the
resumed run's bytes equal a clean run's bytes."""

from __future__ import annotations

import json
import os

import pytest

from pdf_parser_ray.sources import synth
from pdf_parser_ray.state import checkpoint as ckpt


@pytest.fixture(scope="module")
def shards(tmp_path_factory):
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("shards")
    files = []
    for shard in range(3):
        path = d / f"pages-{shard}.parquet"
        pq.write_table(synth.corpus_table(30, seed=31, start=shard * 30), path)
        files.append(str(path))
    return files


def _read_all(out_dir):
    import pyarrow.dataset as pads

    parts = sorted(
        os.path.join(out_dir, p) for p in os.listdir(out_dir) if p.startswith("part-")
    )
    tables = [pads.dataset(p).to_table() for p in parts]
    rows = {}
    for t in tables:
        for r in t.to_pylist():
            rows[r["url"]] = r["text"]
    return rows


@pytest.mark.usefixtures("ray_session")
def test_checkpoint_resume(shards, tmp_path):
    out_a = str(tmp_path / "clean")
    summary = ckpt.run_checkpointed(shards, out_a, files_per_part=1)
    assert summary == {"parts_total": 3, "parts_skipped": 0, "parts_run": 3,
                       "rows": 90}

    # resume with nothing to do
    summary2 = ckpt.run_checkpointed(shards, out_a, files_per_part=1)
    assert summary2["parts_skipped"] == 3 and summary2["parts_run"] == 0

    # simulate a kill: drop one manifest and scribble into its part dir
    out_b = str(tmp_path / "resumed")
    ckpt.run_checkpointed(shards, out_b, files_per_part=1)
    os.remove(os.path.join(out_b, "_manifest", "part-0001.json"))
    with open(os.path.join(out_b, "part-0001", "garbage"), "w") as f:
        f.write("partial")
    summary3 = ckpt.run_checkpointed(shards, out_b, files_per_part=1)
    assert summary3["parts_skipped"] == 2 and summary3["parts_run"] == 1
    assert _read_all(out_b) == _read_all(out_a)

    # manifests carry lineage + counters
    with open(os.path.join(out_a, "_manifest", "part-0000.json")) as f:
        m = json.load(f)
    assert m["status"] == "complete"
    assert m["input_lineage"] == [shards[0]]
    assert m["counters"]["rows"] == 30
    assert m["counters"]["bytes_out"] > 0


@pytest.mark.usefixtures("ray_session")
def test_config_change_invalidates(shards, tmp_path):
    out = str(tmp_path / "cfg")
    ckpt.run_checkpointed(shards[:1], out, files_per_part=1)
    s = ckpt.run_checkpointed(
        shards[:1], out, files_per_part=1,
        pipeline_kwargs={"explode_threshold": 1024},
    )
    assert s["parts_run"] == 1  # fingerprint changed -> re-ran


@pytest.mark.usefixtures("ray_session")
def test_checkpoint_over_pyarrow_fs(shards, tmp_path):
    """Round-5 multi-node story: the ``filesystem=`` path routes every
    operation through a public pyarrow.fs.FileSystem (here a
    SubTreeFileSystem standing in for an object store) under the
    manifest-commit protocol — no staging rename; an uncommitted part
    dir (data present, no valid manifest) is garbage to delete and
    redo."""
    from pyarrow.fs import LocalFileSystem, SubTreeFileSystem

    root = tmp_path / "objstore"
    root.mkdir()
    fs = SubTreeFileSystem(str(root), LocalFileSystem())

    s1 = ckpt.run_checkpointed(shards, "run", files_per_part=1,
                               filesystem=fs)
    assert s1 == {"parts_total": 3, "parts_skipped": 0, "parts_run": 3,
                  "rows": 90}
    # resume skips everything
    s2 = ckpt.run_checkpointed(shards, "run", files_per_part=1,
                               filesystem=fs)
    assert s2["parts_skipped"] == 3 and s2["parts_run"] == 0

    # simulate a mid-write kill: part data exists but the manifest
    # (the commit record) is gone -> that partition is redone
    os.remove(root / "run" / "_manifest" / "part-0001.json")
    with open(root / "run" / "part-0001" / "garbage", "w") as f:
        f.write("partial")
    s3 = ckpt.run_checkpointed(shards, "run", files_per_part=1,
                               filesystem=fs)
    assert s3["parts_skipped"] == 2 and s3["parts_run"] == 1
    assert not (root / "run" / "part-0001" / "garbage").exists()

    # fs output equals the local-path output byte-for-byte
    out_local = str(tmp_path / "local_twin")
    ckpt.run_checkpointed(shards, out_local, files_per_part=1)
    assert _read_all(str(root / "run")) == _read_all(out_local)

    # manifests on the fs carry lineage + counters
    m = json.loads((root / "run" / "_manifest" / "part-0000.json")
                   .read_text())
    assert m["status"] == "complete"
    assert m["counters"]["rows"] == 30
    assert m["counters"]["bytes_out"] > 0

    # a shorter input plan removes stale fs parts beyond the new plan
    s4 = ckpt.run_checkpointed(shards[:2], "run", files_per_part=1,
                               filesystem=fs)
    assert s4["parts_total"] == 2
    assert not (root / "run" / "part-0002").exists()


@pytest.mark.usefixtures("ray_session")
def test_legacy_fingerprint_accepted_on_resume(shards, tmp_path):
    """Round-5 review catch: manifests written by the pre-round-5 binary
    (fingerprint over ALL kwargs, new flags absent) must still be
    skipped on resume — the fingerprint-rule change itself must not
    trigger the full re-run it exists to prevent."""
    out = str(tmp_path / "legacy")
    ckpt.run_checkpointed(shards[:1], out, files_per_part=1)
    # rewrite the manifest's config to the LEGACY spelling: hash over
    # the old kwargs dict (defaults included, new flags absent)
    legacy = ckpt._config_fingerprint({
        "want_markdown": True, "want_json": False,
        "explode_threshold": None, "parse_mode": "tasks",
        "start_page": 1, "end_page": None,
        "json_coordinates": False} | {"v": 1})
    mpath = os.path.join(out, "_manifest", "part-0000.json")
    m = json.load(open(mpath))
    m["config"] = legacy
    with open(mpath, "w") as f:
        json.dump(m, f)
    s = ckpt.run_checkpointed(
        shards[:1], out, files_per_part=1,
        pipeline_kwargs={
            "want_markdown": True, "want_json": False,
            "explode_threshold": None, "parse_mode": "tasks",
            "start_page": 1, "end_page": None,
            "json_coordinates": False,
            "detect_lang": False, "quality_signals": False})
    assert s["parts_skipped"] == 1 and s["parts_run"] == 0
