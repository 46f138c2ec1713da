"""North-rule determinism: the index must be byte-identical when built at
different parallelism levels (the num_cpus stand-in for cluster sizes)."""

import json
import os
import subprocess
import sys

import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SNIPPET = """
import sys; sys.path.insert(0, {repo!r})
import ray
ray.init(address="local", num_cpus={ncpu}, include_dashboard=False,
         logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
import ray.data as rd
from prosearch_ray.fixtures.gen import generate_corpus
from prosearch_ray.index.build import build_index
corpus = generate_corpus(800)
build_index(rd.from_arrow(corpus), {idx!r}, docs_per_bucket=64)
ray.shutdown()
"""


def _index_content(index_dir):
    out = {}
    for sub in ("postings", "positions", "docmeta", "dict"):
        d = os.path.join(index_dir, sub)
        for f in sorted(os.listdir(d)):
            if f.endswith(".parquet"):
                t = pq.read_table(os.path.join(d, f))
                out[f"{sub}/{f}"] = t
    return out


def test_index_identical_at_2_and_8_cpus(tmp_path):
    dirs = {}
    for ncpu in (2, 8):
        idx = str(tmp_path / f"idx{ncpu}")
        subprocess.run(
            [sys.executable, "-c",
             SNIPPET.format(repo=REPO, ncpu=ncpu, idx=idx)],
            cwd=REPO, capture_output=True, text=True, check=True)
        dirs[ncpu] = idx
    a = _index_content(dirs[2])
    b = _index_content(dirs[8])
    assert a.keys() == b.keys()
    for name in a:
        assert a[name].equals(b[name]), f"{name} differs between cpu levels"
    s1 = json.load(open(os.path.join(dirs[2], "stats.json")))
    s2 = json.load(open(os.path.join(dirs[8], "stats.json")))
    assert s1 == s2
