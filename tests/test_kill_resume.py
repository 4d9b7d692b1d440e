"""Hard-kill resume test: a checkpointed run killed with SIGKILL mid-job
resumes at partition granularity and produces byte-identical output."""

from __future__ import annotations

import os
import signal
import subprocess
import sys
import time

import pytest

from pdf_parser_ray.sources import synth

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

RUNNER = """
import sys
sys.path.insert(0, {repo!r})
import ray
ray.init(address="local", num_cpus=4, include_dashboard=False,
         ignore_reinit_error=True, logging_level="ERROR")
from pdf_parser_ray.state.checkpoint import run_checkpointed
summary = run_checkpointed({files!r}, {out!r}, files_per_part=1)
print("SUMMARY", summary)
ray.shutdown()
"""


@pytest.fixture(scope="module")
def shards(tmp_path_factory):
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("killshards")
    files = []
    for shard in range(4):
        path = d / f"pages-{shard}.parquet"
        pq.write_table(synth.corpus_table(25, seed=60, start=shard * 25), path)
        files.append(str(path))
    return files


def _read_texts(out_dir):
    import pyarrow.dataset as pads

    rows = {}
    for p in sorted(os.listdir(out_dir)):
        if p.startswith("part-"):
            for r in pads.dataset(os.path.join(out_dir, p)).to_table().to_pylist():
                rows[r["url"]] = r["text"]
    return rows


@pytest.mark.usefixtures("ray_session")
def test_sigkill_then_resume(shards, tmp_path):
    out_killed = str(tmp_path / "killed")
    script = RUNNER.format(repo=REPO, files=shards, out=out_killed)
    # new session so the WHOLE child ray cluster can be killed as a group —
    # a SIGKILLed driver alone leaves workers flushing writes for a while
    proc = subprocess.Popen([sys.executable, "-c", script],
                            stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
                            start_new_session=True)
    # wait until at least one partition manifest lands, then SIGKILL
    manifest_dir = os.path.join(out_killed, "_manifest")
    deadline = time.time() + 120
    while time.time() < deadline:
        if os.path.isdir(manifest_dir) and any(
            f.endswith(".json") for f in os.listdir(manifest_dir)
        ):
            break
        if proc.poll() is not None:
            break  # finished before we could kill — still a valid (trivial) run
        time.sleep(0.2)
    if proc.poll() is None:
        try:
            os.killpg(os.getpgid(proc.pid), signal.SIGKILL)
        except ProcessLookupError:
            pass
        proc.wait()
        time.sleep(1.0)  # let any orphaned worker file handles settle

    done_before = len([f for f in os.listdir(manifest_dir)
                       if f.endswith(".json")]) if os.path.isdir(manifest_dir) else 0

    # resume in-process (shares the session fixture's Ray)
    from pdf_parser_ray.state.checkpoint import run_checkpointed

    summary = run_checkpointed(shards, out_killed, files_per_part=1)
    assert summary["parts_total"] == 4
    assert summary["parts_skipped"] >= min(done_before, 4)
    assert summary["rows"] == 100

    # identical bytes to a clean run
    out_clean = str(tmp_path / "clean")
    run_checkpointed(shards, out_clean, files_per_part=1)
    assert _read_texts(out_killed) == _read_texts(out_clean)
