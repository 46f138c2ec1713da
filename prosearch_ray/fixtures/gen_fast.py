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


# Above this size the corpus is generated in independent chunks across a
# process pool (the monolithic path peaks at ~60 GB RSS at 8M docs and is
# single-threaded); below it the original single-table path is kept
# bit-identical so recorded bench corpora don't shift.
_CHUNKED_THRESHOLD = 1_000_000
_CHUNK_DOCS = 250_000


def _generate_chunk(n_docs_total: int, base_start: int, n_chunk: int,
                    seed: int, chunk_idx: int) -> pa.Table:
    """One deterministic slice [base_start, base_start+n_chunk) of a large
    corpus.  Same schema and distribution family as generate_corpus_fast;
    each chunk is seeded independently by (seed, chunk_idx) so chunks can be
    generated in parallel with bounded memory.  Dup rows (2% content / 1%
    upsert) reference sources within the same chunk."""
    rng = np.random.default_rng([seed, chunk_idx])
    vocab = np.asarray(STOPWORDISH + WORD_POOL, dtype=object)
    vocab_p = _zipf_probs(len(vocab))
    idents = _identifier_pool(rng)
    boosts = np.asarray(BOOST_POOL, dtype=object)
    puncts = np.asarray(PUNCT, dtype=object)

    # repo pool is GLOBAL (shared across chunks) so repo-level skew spans
    # the whole corpus; names are formatted lazily for drawn indices only
    n_repos = max(3, n_docs_total // 50)
    repo_idx = rng.choice(n_repos, p=_zipf_probs(n_repos, s=1.2), size=n_chunk)
    _repo_cache: dict = {}

    def _repo_name(i: int) -> str:
        r = _repo_cache.get(i)
        if r is None:
            r = f"org{i // 10:04d}/repo{i % 10:03d}-{i:03d}"
            _repo_cache[i] = r
        return r

    lang_all = np.asarray(LANGS + ["bin"], dtype=object)
    lang_p = np.asarray([p * 0.97 for p in LANG_P] + [0.03])
    lang_p /= lang_p.sum()
    langs = lang_all[rng.choice(len(lang_all), p=lang_p, size=n_chunk)]

    n_tok = rng.integers(40, 400, size=n_chunk)
    offsets = np.zeros(n_chunk + 1, dtype=np.int64)
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

    uniq_mask = rng.random(n_chunk) < 0.08
    contents = []
    for i in range(n_chunk):
        body = " ".join(toks[offsets[i]:offsets[i + 1]])
        if uniq_mask[i]:
            body += f" uniq{base_start + i}token"
        contents.append(body)

    dir_idx = rng.integers(0, len(DIRS), size=(n_chunk, 2))
    stem_idx = rng.integers(0, len(idents), size=n_chunk)
    repos, paths, commits = [], [], []
    for i in range(n_chunk):
        repo = _repo_name(int(repo_idx[i]))
        ext = EXT[langs[i]]
        path = (f"{DIRS[dir_idx[i, 0]]}/{DIRS[dir_idx[i, 1]]}/"
                f"{idents[stem_idx[i]]}_{base_start + i}{ext}")
        repos.append(repo)
        paths.append(path)
        commits.append(_commit_for(repo))

    langs_list = list(langs)

    # ~2% exact content dups, ~1% upsert dups (chunk-local sources; copy
    # dirs carry a global counter so (repo, path) stays corpus-unique)
    j_base = base_start // 50
    for j in range(max(1, n_chunk // 50)):
        src = int(rng.integers(0, n_chunk))
        repos.append(_repo_name(int(rng.integers(0, n_repos))))
        paths.append(f"vendor/copy_{j_base + j}/" + paths[src].rsplit("/", 1)[-1])
        commits.append(_commit_for(repos[-1]))
        langs_list.append(langs_list[src])
        contents.append(contents[src])
    for j in range(max(1, n_chunk // 100)):
        src = int(rng.integers(0, n_chunk))
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


def _write_chunk_files(args) -> int:
    (corpus_dir, n_docs_total, chunk_idx, base_start, n_chunk, seed,
     rows_per_file) = args
    t = _generate_chunk(n_docs_total, base_start, n_chunk, seed, chunk_idx)
    k = 0
    for off in range(0, t.num_rows, rows_per_file):
        part = t.slice(off, rows_per_file)
        pq.write_table(part, os.path.join(
            corpus_dir, f"corpus-{chunk_idx:04d}-{k:04d}.parquet"))
        k += 1
    return t.num_rows


def _write_chunked_corpus(corpus_dir: str, n_docs: int, seed: int,
                          rows_per_file: int) -> None:
    import multiprocessing as mp

    jobs = []
    start = 0
    chunk_idx = 0
    while start < n_docs:
        n_chunk = min(_CHUNK_DOCS, n_docs - start)
        jobs.append((corpus_dir, n_docs, chunk_idx, start, n_chunk, seed,
                     rows_per_file))
        start += n_chunk
        chunk_idx += 1
    # each worker peaks at ~2-3 GB RSS per 250k-doc chunk; 12 workers keeps
    # the box under ~35 GB while saturating the Python-join bottleneck
    procs = min(12, max(1, (os.cpu_count() or 8) - 2), len(jobs))
    ctx = mp.get_context("fork")
    with ctx.Pool(procs) as pool:
        for _ in pool.imap_unordered(_write_chunk_files, jobs, chunksize=1):
            pass


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
    if n_docs > _CHUNKED_THRESHOLD:
        _write_chunked_corpus(corpus_dir, n_docs, seed, rows_per_file)
    else:
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
