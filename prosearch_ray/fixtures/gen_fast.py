"""Vectorized bench-tier corpus generator.

Same schema / distribution family as fixtures.gen.generate_corpus (Zipf
vocab, camel/snake identifiers, boost terms, rare uniq tokens, ~3% bin rows,
~2% content dups, ~1% upsert dups) but generated with array-at-once numpy
sampling so bench corpora (50k-500k docs) build in seconds.  Deterministic
for a given (n_docs, seed); used for throughput/scaling runs, while the
slower row-at-a-time generator stays the conformance fixture.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from prosearch_ray.fixtures.gen import (
    BOOST_POOL,
    DIRS,
    EXT,
    LANG_P,
    LANGS,
    PUNCT,
    STOPWORDISH,
    WORD_POOL,
    _commit_for,
    _zipf_probs,
    generate_queries,
)


def _identifier_pool(rng: np.random.Generator, n: int = 4096) -> np.ndarray:
    probs = _zipf_probs(len(WORD_POOL))
    parts = rng.choice(len(WORD_POOL), p=probs, size=(n, 3))
    camel = rng.random(n) < 0.5
    out = []
    wp = WORD_POOL
    for i in range(n):
        a, b, c = (wp[j] for j in parts[i])
        if camel[i]:
            out.append(a + b.capitalize() + c.capitalize())
        else:
            out.append(a + "_" + b + "_" + c)
    return np.asarray(out, dtype=object)


def generate_corpus_fast(n_docs: int, seed: int = 42) -> pa.Table:
    rng = np.random.default_rng(seed)
    vocab = np.asarray(STOPWORDISH + WORD_POOL, dtype=object)
    vocab_p = _zipf_probs(len(vocab))
    idents = _identifier_pool(rng)
    boosts = np.asarray(BOOST_POOL, dtype=object)
    puncts = np.asarray(PUNCT, dtype=object)

    n_repos = max(3, n_docs // 50)
    repo_names = np.asarray(
        [f"org{i // 10:04d}/repo{i % 10:03d}-{i:03d}" for i in range(n_repos)],
        dtype=object)
    repo_idx = rng.choice(n_repos, p=_zipf_probs(n_repos, s=1.2), size=n_docs)

    lang_all = np.asarray(LANGS + ["bin"], dtype=object)
    lang_p = np.asarray([p * 0.97 for p in LANG_P] + [0.03])
    lang_p /= lang_p.sum()
    lang_idx = rng.choice(len(lang_all), p=lang_p, size=n_docs)
    langs = lang_all[lang_idx]

    # token counts per doc and one flat token stream for all docs
    n_tok = rng.integers(40, 400, size=n_docs)
    offsets = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(n_tok, out=offsets[1:])
    total = int(offsets[-1])

    cat = rng.random(total)
    toks = np.empty(total, dtype=object)
    m = cat < 0.46
    toks[m] = vocab[rng.choice(len(vocab), p=vocab_p, size=int(m.sum()))]
    m2 = (cat >= 0.46) & (cat < 0.70)
    toks[m2] = idents[rng.integers(0, len(idents), size=int(m2.sum()))]
    m3 = (cat >= 0.70) & (cat < 0.80)
    toks[m3] = puncts[rng.integers(0, len(puncts), size=int(m3.sum()))]
    m4 = (cat >= 0.80) & (cat < 0.88)
    toks[m4] = np.char.mod("%d", rng.integers(0, 4096, size=int(m4.sum()))).astype(object)
    m5 = cat >= 0.88
    toks[m5] = boosts[rng.integers(0, len(boosts), size=int(m5.sum()))]

    uniq_mask = rng.random(n_docs) < 0.08
    contents = []
    for i in range(n_docs):
        body = " ".join(toks[offsets[i]:offsets[i + 1]])
        if uniq_mask[i]:
            body += f" uniq{i}token"
        contents.append(body)

    dir_idx = rng.integers(0, len(DIRS), size=(n_docs, 2))
    stem_idx = rng.integers(0, len(idents), size=n_docs)
    repos, paths, commits = [], [], []
    for i in range(n_docs):
        repo = repo_names[repo_idx[i]]
        ext = EXT[langs[i]]
        path = (f"{DIRS[dir_idx[i, 0]]}/{DIRS[dir_idx[i, 1]]}/"
                f"{idents[stem_idx[i]]}_{i}{ext}")
        repos.append(repo)
        paths.append(path)
        commits.append(_commit_for(repo))

    langs_list = list(langs)

    # ~2% exact content dups, ~1% upsert dups (same scheme as gen.py)
    n_base = n_docs
    for j in range(max(1, n_base // 50)):
        src = int(rng.integers(0, n_base))
        repos.append(repo_names[int(rng.integers(0, n_repos))])
        paths.append(f"vendor/copy_{j}/" + paths[src].rsplit("/", 1)[-1])
        commits.append(_commit_for(repos[-1]))
        langs_list.append(langs_list[src])
        contents.append(contents[src])
    for j in range(max(1, n_base // 100)):
        src = int(rng.integers(0, n_base))
        repos.append(repos[src])
        paths.append(paths[src])
        commits.append("ffffffff" + _commit_for(repos[src] + "/" + paths[src])[8:])
        langs_list.append(langs_list[src])
        contents.append(contents[src] + " updated_rev")

    return pa.table({
        "repo": pa.array(repos, pa.string()),
        "path": pa.array(paths, pa.string()),
        "commit": pa.array(commits, pa.string()),
        "lang": pa.array(langs_list, pa.string()),
        "content": pa.array(contents, pa.string()),
    })


def write_bench_corpus(out_dir: str, n_docs: int, seed: int = 42,
                       rows_per_file: int = 8192) -> str:
    """Idempotent bench corpus writer (multi-file parquet + queries)."""
    marker = os.path.join(out_dir, f"_bench_{n_docs}_{seed}.done")
    if os.path.exists(marker):
        return out_dir
    corpus_dir = os.path.join(out_dir, "corpus")
    os.makedirs(corpus_dir, exist_ok=True)
    for f in os.listdir(corpus_dir):  # drop leftovers from other sizes
        os.remove(os.path.join(corpus_dir, f))
    for f in os.listdir(out_dir):     # invalidate old size markers
        if f.startswith("_bench_") and f.endswith(".done"):
            os.remove(os.path.join(out_dir, f))
    table = generate_corpus_fast(n_docs, seed=seed)
    n_files = max(1, -(-table.num_rows // rows_per_file))
    step = -(-table.num_rows // n_files)
    for i in range(n_files):
        chunk = table.slice(i * step, step)
        if chunk.num_rows:
            pq.write_table(chunk, os.path.join(corpus_dir, f"corpus-{i:05d}.parquet"))
    pq.write_table(generate_queries(), os.path.join(out_dir, "queries.parquet"))
    with open(marker, "w") as f:
        f.write("ok")
    return out_dir
