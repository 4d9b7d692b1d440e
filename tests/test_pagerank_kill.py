"""Worker-SIGKILL retry through the iterative graph pipeline:
`docs_pagerank` crosses a hash join + sort-shuffle aggregate FOUR times
(with per-round materialize barriers) — a worker killed mid-run must be
replayed by Ray's task retry with byte-identical scores (the
integer-exact spec makes any drift a hard failure, not a tolerance
question)."""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

RUNNER = """
import os, random, signal, sys, threading, time
sys.path.insert(0, {repo!r})
import ray
ray.init(address="local", num_cpus=4, include_dashboard=False,
         ignore_reinit_error=True, logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False

def killer():
    deadline = time.time() + 20
    while time.time() < deadline:
        time.sleep(0.05)
        try:
            out = os.popen("pgrep -f 'ray::Map'").read().split()
            victims = [int(p) for p in out if int(p) != os.getpid()]
            if victims:
                os.kill(random.Random(5).choice(sorted(victims)),
                        signal.SIGKILL)
                print("KILLED_WORKER", flush=True)
                return
        except (ValueError, ProcessLookupError):
            pass

{kill_line}
from pdf_parser_ray.pipelines.queries import docs_pagerank
df = docs_pagerank({sf_dir!r}, broadcast_max=0)  # force the join path
import json
print("RESULT", json.dumps(df.values.tolist(), default=str))
ray.shutdown()
"""


@pytest.fixture(scope="module")
def pr_sf_dir(tmp_path_factory):
    import pyarrow as pa
    import pyarrow.parquet as pq

    n = 2000
    tbl = pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "text": pa.array([f"doc {i}" for i in range(n)], pa.string()),
        "lang": pa.array(["en"] * n, pa.string()),
        "source": pa.array(["ft"] * n, pa.string()),
        "n_chars": pa.array([7] * n, pa.int64()),
    })
    d = tmp_path_factory.mktemp("prft")
    pq.write_table(tbl, d / "documents.parquet")
    return str(d)


def _run(sf_dir: str, kill: bool) -> str:
    script = RUNNER.format(
        repo=REPO, sf_dir=sf_dir,
        kill_line=("threading.Thread(target=killer, daemon=True).start()"
                   if kill else "pass"))
    proc = subprocess.run([sys.executable, "-c", script],
                          capture_output=True, text=True, timeout=300,
                          cwd=REPO)
    assert proc.returncode == 0, proc.stderr[-2000:]
    if kill:
        assert "KILLED_WORKER" in proc.stdout, proc.stdout[-2000:]
    line = [ln for ln in proc.stdout.splitlines()
            if ln.startswith("RESULT ")]
    assert line, proc.stdout[-2000:]
    return line[0]


@pytest.mark.usefixtures("ray_session")
def test_pagerank_survives_worker_kill(pr_sf_dir):
    baseline = _run(pr_sf_dir, kill=False)
    killed = _run(pr_sf_dir, kill=True)
    assert killed == baseline
