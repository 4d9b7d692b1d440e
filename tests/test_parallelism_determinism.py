"""SURVEY §5.2(4): runs under different parallelism levels produce
identical per-url bytes. Two fresh subprocesses (own Ray sessions,
num_cpus=2 and 4) extract the same corpus to parquet; outputs compared
byte-for-byte."""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

from pdf_parser_ray.sources import synth

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

RUNNER = """
import sys
sys.path.insert(0, {repo!r})
import ray
ray.init(address="local", num_cpus={cpus}, include_dashboard=False,
         ignore_reinit_error=True, logging_level="ERROR")
from pdf_parser_ray.pipelines.extraction import extract_paths
out = extract_paths([{corpus!r}], explode_threshold=64 * 1024,
                    parse_batch_size={batch})
out.write_parquet({dest!r})
ray.shutdown()
"""


@pytest.mark.usefixtures("ray_session")
def test_identical_bytes_across_parallelism(tmp_path):
    import pyarrow.dataset as pads
    import pyarrow.parquet as pq

    corpus = str(tmp_path / "pages.parquet")
    pq.write_table(synth.corpus_table(60, seed=77), corpus)

    results = {}
    for cpus, batch in ((2, 16), (4, 64)):
        dest = str(tmp_path / f"out{cpus}")
        script = RUNNER.format(repo=REPO, cpus=cpus, corpus=corpus,
                               dest=dest, batch=batch)
        subprocess.run([sys.executable, "-c", script], check=True,
                       capture_output=True, timeout=240)
        rows = pads.dataset(dest).to_table().to_pylist()
        results[cpus] = {r["url"]: (r["text"], r["markdown"], r["n_blocks"])
                         for r in rows}

    assert results[2] == results[4]
    assert len(results[2]) == 60
