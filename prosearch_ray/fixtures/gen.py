"""Deterministic synthetic source-code corpus + query set (FIXTURES.md).

Everything is derived from ``numpy.random.default_rng(seed)`` (PCG64) and
fixed pools — no wall clock, no machine dependence, no external data.  The
corpus matches BASELINE.json's input_hint schema exactly:
``(repo:string, path:string, commit:string, lang:string, content:string)``.

Guarantees (FIXTURES.md §1):
- doc key ``repo + "/" + path`` unique in the base set; ~2% appended rows are
  exact-content duplicates under a different path (sha256 dedup exercise);
  ~1% appended rows duplicate an existing (repo, path) with a
  lexicographically LATER commit and different content (last-write-wins
  upsert exercise);
- token frequencies Zipfian; ~20 stopword-like tokens appear in >50% of docs
  (salted-shuffle / skew exercise);
- "bin" lang rows (~3%) exercise the lang filter;
- content mixes camelCase / snake_case identifiers, keywords, literals,
  punctuation, indentation and newlines.

Scale tiers: tiny=500 (unit tests), small=5000 (conformance), bench=50k+.
"""

from __future__ import annotations

import hashlib
import os
from typing import List, Optional

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 42

STOPWORDISH = [
    "the", "return", "self", "void", "result", "value", "data", "get", "set",
    "new", "name", "type", "list", "index", "count", "size", "key", "node",
    "item", "string",
]

WORD_POOL = [
    "parse", "buffer", "stream", "query", "token", "merge", "hash", "batch",
    "shard", "field", "score", "doc", "term", "read", "write", "cache",
    "file", "path", "util", "config", "client", "server", "handler",
    "manager", "builder", "factory", "worker", "queue", "pool", "block",
    "offset", "cursor", "vector", "matrix", "graph", "edge", "layer",
    "model", "train", "split", "join", "filter", "map", "reduce", "fold",
    "emit", "flush", "spill", "commit", "segment", "posting", "norm",
    "weight", "boost", "limit", "range", "scan", "seek", "codec", "delta",
]

KEYWORDS = {
    "java": ["public", "static", "final", "class", "import", "extends", "throws", "int"],
    "py": ["def", "return", "import", "class", "lambda", "yield", "with", "async"],
    "rs": ["fn", "let", "mut", "pub", "impl", "struct", "match", "trait"],
    "js": ["function", "const", "let", "var", "async", "await", "export", "class"],
    "go": ["func", "var", "type", "struct", "interface", "defer", "chan", "go"],
    "md": ["note", "usage", "example", "install", "license", "api", "see", "docs"],
    "txt": ["todo", "fixme", "changelog", "release", "notes", "draft", "spec", "plan"],
}
EXT = {"java": ".java", "py": ".py", "rs": ".rs", "js": ".js", "go": ".go",
       "md": ".md", "txt": ".txt", "bin": ".bin"}
LANGS = ["java", "py", "rs", "js", "go", "md", "txt"]
LANG_P = [0.22, 0.22, 0.14, 0.14, 0.12, 0.08, 0.08]

BOOST_POOL = ["rust", "python", "react", "redis", "linux", "git",
              "java", "go", "node", "npm", "swift", "kotlin"]

DIRS = ["src", "lib", "core", "internal", "pkg", "cmd", "tests", "docs",
        "util", "io", "net", "api"]

PUNCT = ["=", "+", "(", ")", "{", "}", ";", "->", "==", "&&", ":", ","]


def _zipf_probs(n: int, s: float = 1.07) -> np.ndarray:
    w = 1.0 / np.arange(1, n + 1) ** s
    return w / w.sum()


def _commit_for(repo: str, gen: int = 0) -> str:
    return hashlib.md5(f"{repo}@{gen}".encode()).hexdigest() + hashlib.md5(
        f"{repo}#{gen}".encode()
    ).hexdigest()[:8]


def _camel(parts: List[str]) -> str:
    return parts[0] + "".join(p.capitalize() for p in parts[1:])


def _make_content(rng: np.random.Generator, lang: str, doc_idx: int) -> str:
    vocab = STOPWORDISH + WORD_POOL
    probs = _zipf_probs(len(vocab))
    n_lines = int(rng.integers(4, 40))
    lines: List[str] = []
    for _ in range(n_lines):
        n_tok = int(rng.integers(3, 11))
        toks: List[str] = []
        for _ in range(n_tok):
            r = rng.random()
            if r < 0.42:
                toks.append(vocab[int(rng.choice(len(vocab), p=probs))])
            elif r < 0.62:  # identifier
                k = int(rng.integers(2, 4))
                parts = [WORD_POOL[int(rng.choice(len(WORD_POOL), p=_zipf_probs(len(WORD_POOL))))]
                         for _ in range(k)]
                toks.append(_camel(parts) if rng.random() < 0.5 else "_".join(parts))
            elif r < 0.74:
                toks.append(KEYWORDS.get(lang, KEYWORDS["txt"])[int(rng.integers(0, 8))])
            elif r < 0.80:
                toks.append(str(PUNCT[int(rng.integers(0, len(PUNCT)))]))
            elif r < 0.86:
                toks.append(str(int(rng.integers(0, 4096))))
            elif r < 0.90:
                toks.append(BOOST_POOL[int(rng.integers(0, len(BOOST_POOL)))])
            elif r < 0.94:
                toks.append('"%s"' % WORD_POOL[int(rng.integers(0, len(WORD_POOL)))])
            else:
                w = WORD_POOL[int(rng.integers(0, len(WORD_POOL)))]
                toks.append(w + str(int(rng.integers(0, 99))))
        indent = "    " * int(rng.integers(0, 3))
        lines.append(indent + " ".join(toks))
    # ~8% of docs carry a unique rare token (rare-term / single-hit queries)
    if rng.random() < 0.08:
        lines.append(f"uniq{doc_idx}token")
    return "\n".join(lines)


def _bin_content(rng: np.random.Generator) -> str:
    chars = np.array(list("ABCDEFabcdef0123456789+/"))
    n = int(rng.integers(40, 400))
    return "".join(chars[rng.integers(0, len(chars), size=n)])


def generate_corpus(n_docs: int, seed: int = SEED) -> pa.Table:
    """Generate the synthetic corpus; ``n_docs`` counts base docs (duplicate
    rows are appended on top: ~2% content-dups, ~1% upsert-dups, so the table
    has ~1.03*n_docs rows)."""
    rng = np.random.default_rng(seed)
    n_repos = max(3, n_docs // 50)
    repo_names = [f"org{i // 10:04d}/repo{i % 10:03d}-{i:03d}" for i in range(n_repos)]
    repo_probs = _zipf_probs(n_repos, s=1.2)

    repos: List[str] = []
    paths: List[str] = []
    commits: List[str] = []
    langs: List[str] = []
    contents: List[str] = []
    seen_keys = set()

    for i in range(n_docs):
        repo = repo_names[int(rng.choice(n_repos, p=repo_probs))]
        if rng.random() < 0.03:
            lang = "bin"
        else:
            lang = LANGS[int(rng.choice(len(LANGS), p=LANG_P))]
        depth = int(rng.integers(1, 4))
        dirs = [DIRS[int(rng.integers(0, len(DIRS)))] for _ in range(depth)]
        stem_parts = [WORD_POOL[int(rng.integers(0, len(WORD_POOL)))]
                      for _ in range(int(rng.integers(1, 3)))]
        stem = _camel([p.capitalize().lower() for p in stem_parts]) if lang == "java" \
            else "_".join(stem_parts)
        if lang == "java":
            stem = "".join(p.capitalize() for p in stem_parts)
        path = "/".join(dirs) + "/" + stem + EXT[lang]
        key = repo + "/" + path
        if key in seen_keys:
            path = "/".join(dirs) + f"/{stem}_{i}" + EXT[lang]
            key = repo + "/" + path
        seen_keys.add(key)
        repos.append(repo)
        paths.append(path)
        commits.append(_commit_for(repo))
        langs.append(lang)
        contents.append(_bin_content(rng) if lang == "bin"
                        else _make_content(rng, lang, i))

    n_base = len(repos)
    # ~2% exact-content duplicates (same content, different path)
    for j in range(max(1, n_base // 50)):
        src = int(rng.integers(0, n_base))
        repo = repo_names[int(rng.choice(n_repos, p=repo_probs))]
        path = f"vendor/copy_{j}/" + paths[src].rsplit("/", 1)[-1]
        key = repo + "/" + path
        if key in seen_keys:
            continue
        seen_keys.add(key)
        repos.append(repo)
        paths.append(path)
        commits.append(_commit_for(repo))
        langs.append(langs[src])
        contents.append(contents[src])

    # ~1% upsert duplicates: same (repo,path), LATER commit, new content.
    # The "ffffffff" prefix makes the new commit lexicographically greater
    # than any md5-derived base commit, so last-write-wins is unambiguous.
    for j in range(max(1, n_base // 100)):
        src = int(rng.integers(0, n_base))
        if langs[src] == "bin":
            continue
        repos.append(repos[src])
        paths.append(paths[src])
        commits.append("ffffffff" + _commit_for(repos[src] + "/" + paths[src])[8:])
        langs.append(langs[src])
        contents.append(_make_content(rng, langs[src], n_base + j))

    return pa.table({
        "repo": pa.array(repos, pa.string()),
        "path": pa.array(paths, pa.string()),
        "commit": pa.array(commits, pa.string()),
        "lang": pa.array(langs, pa.string()),
        "content": pa.array(contents, pa.string()),
    })


def generate_queries(seed: int = SEED + 1, n_rare: int = 8) -> pa.Table:
    """~60 queries over the fixed pools (corpus-independent, deterministic);
    categories per FIXTURES.md §2. Columns: qid:int32, query:string, k:int32."""
    rng = np.random.default_rng(seed)
    qs: List[str] = []
    ks: List[int] = []

    def add(q: str, k: int = 10):
        qs.append(q)
        ks.append(k)

    for t in STOPWORDISH[:6]:                       # single common term
        add(t)
    for i in range(n_rare):                         # single rare term
        add(f"uniq{int(rng.integers(0, 400))}token")
    for _ in range(8):                              # AND of 2-4 terms
        n = int(rng.integers(2, 5))
        terms = [WORD_POOL[int(rng.integers(0, len(WORD_POOL)))] for _ in range(n)]
        add(" ".join(terms))
    for t in BOOST_POOL[:6]:                        # boost-set terms
        add(t)
        add(t + " " + STOPWORDISH[int(rng.integers(0, len(STOPWORDISH)))])
    for _ in range(5):                              # camelCase / snake_case ids
        parts = [WORD_POOL[int(rng.integers(0, len(WORD_POOL)))] for _ in range(2)]
        add(_camel(parts))
        add("_".join(parts))
    for _ in range(4):                              # path fragments
        add(DIRS[int(rng.integers(0, len(DIRS)))] + "/" +
            WORD_POOL[int(rng.integers(0, len(WORD_POOL)))])
    add("zzznothing")                               # zero hits
    add("zzznothing merge")                         # AND with a zero-hit term
    add("QUERY Batch MERGE")                        # uppercase input
    add('merge AND hash')                           # operator literals = plain terms
    add('"batch" +stream -cache')
    add("parse OR scan")
    add(STOPWORDISH[0], k=1)                        # k variants
    add(STOPWORDISH[1], k=100)
    add("merge hash", k=1)
    return pa.table({
        "qid": pa.array(range(len(qs)), pa.int32()),
        "query": pa.array(qs, pa.string()),
        "k": pa.array(ks, pa.int32()),
    })


def write_corpus(out_dir: str, n_docs: int, seed: int = SEED,
                 rows_per_file: int = 8192, n_files: Optional[int] = None) -> str:
    """Write the corpus as a directory of Parquet files (multiple files so the
    read parallelizes) + queries.parquet. Returns ``out_dir``. Idempotent: if
    the directory already holds a corpus with the same parameters it is reused
    (cheap warm-start for bench runs)."""
    marker = os.path.join(out_dir, f"_corpus_{n_docs}_{seed}.done")
    if os.path.exists(marker):
        return out_dir
    corpus_dir = os.path.join(out_dir, "corpus")  # keep queries.parquet out of
    os.makedirs(corpus_dir, exist_ok=True)        # the corpus read glob
    table = generate_corpus(n_docs, seed=seed)
    if n_files is None:
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
