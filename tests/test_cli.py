"""Smoke tests for the `ray job submit` CLI entry points (scripts/):
build (unsharded + sharded) and query (AND / raw / phrase / serp / sharded)
driven as real subprocesses — the job surface the north rule names."""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args):
    env = dict(os.environ, PYTHONPATH=REPO, RAY_GRAFT_CPUS="4")
    r = subprocess.run([sys.executable] + args, cwd=REPO, env=env,
                       capture_output=True, text=True, timeout=420)
    assert r.returncode == 0, r.stderr[-2000:]
    return r.stdout


@pytest.fixture(scope="module")
def cli_corpus(ray_session, tmp_path_factory):
    from prosearch_ray.fixtures import write_corpus

    base = tmp_path_factory.mktemp("cli")
    d = write_corpus(str(base / "c"), n_docs=400)
    return d + "/corpus", str(base)


def test_cli_build_and_query(cli_corpus):
    corpus, base = cli_corpus
    out = _run(["scripts/build_index.py", "--corpus", corpus,
                "--index", base + "/idx", "--docs-per-bucket", "128"])
    rep = json.loads(out.strip().splitlines()[-1])
    assert rep["n_docs"] > 300

    hits = _run(["scripts/query.py", "--index", base + "/idx", "merge hash"])
    rows = [json.loads(l) for l in hits.strip().splitlines()]
    assert rows and rows[0]["rank"] == 0 and rows[0]["score"] > 0

    raw = _run(["scripts/query.py", "--index", base + "/idx", "--raw",
                '+merge -hash parse'])
    assert raw.strip()

    serp = json.loads(_run(["scripts/query.py", "--index", base + "/idx",
                            "--serp", "merge hash"]))
    assert serp["hits"] and "snip" in serp["hits"][0]


def test_cli_sharded_build_and_query(cli_corpus):
    corpus, base = cli_corpus
    out = _run(["scripts/build_index.py", "--corpus", corpus,
                "--index", base + "/shards", "--num-shards", "2",
                "--docs-per-bucket", "128"])
    rep = json.loads(out.strip().splitlines()[-1])
    assert rep["num_shards"] == 2

    hits = _run(["scripts/query.py", "--index", base + "/shards",
                 "--sharded", "merge hash"])
    rows = [json.loads(l) for l in hits.strip().splitlines()]
    assert rows and rows[0]["score"] > 0

    raw = _run(["scripts/query.py", "--index", base + "/shards",
                "--sharded", "--raw", 'merge "hash value"'])
    assert raw.strip()
