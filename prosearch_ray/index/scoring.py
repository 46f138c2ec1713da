"""BM25 scoring semantics shared by the engine and the brute-force oracle.

Pinned to the reference's tantivy defaults (SURVEY.md §2.4;
/root/reference/tantivy-cli/src/commands/serve.rs:336-419,
/root/reference/tantivy-cli/index-init/meta.json):

- k1 = 1.2, b = 0.75
- idf(t)  = ln(1 + (N - df + 0.5) / (df + 0.5)), per field
- tf_norm = tf * (k1 + 1) / (tf + k1 * (1 - b + b * |d|/avgdl))
  with |d| = the QUANTIZED field length (fieldnorm byte decoded) and
  avgdl = exact total_tokens(field) / N
- query = AND across terms; each term is an OR over {title^1.5, body^1.0};
  title is indexed ``record: basic`` so tf == 1 for every title match
  (meta.json:13); per-term user boost ×2.5 when the RAW whitespace query
  token is in the boost set (serve.rs:362-369,388-405 — membership is
  checked on the unsplit, case-sensitive token)
- ties broken by ascending doc_id.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np

from prosearch_ray.text.tokenizer import expand_token

K1 = 1.2
B = 0.75
TITLE_BOOST = 1.5
BODY_BOOST = 1.0
TERM_BOOST = 2.5
DEFAULT_K = 10  # serve.rs:573-576

# The reference's production boost set: ~190 tech keywords hardcoded at
# serve.rs:362-369 (duplicates in the Rust array collapse in the set).
DEFAULT_BOOST_TERMS = frozenset([
    "amazon", "angular", "apache", "apple", "arch", "astro", "aws", "babel",
    "babeljs", "backbone", "backbonejs", "bazel", "bluebird", "bluebirdjs",
    "bootstrap", "bower", "brew", "c++", "cfdocs", "cfml", "chai", "chaijs",
    "chef", "clojure", "cobol", "codecept", "codeception", "codeigniter",
    "coffeescript", "composer", "cpp", "cran.r-project", "crystal",
    "cypress", "dart", "deno", "doctrine", "drupal", "eigen", "electron",
    "electronjs", "elixir", "elm", "embarcadero", "enzyme", "enzymejs",
    "erights", "erlang", "esbuild", "eslint", "express", "expressjs",
    "fastapi", "flow", "fortran", "fortran90", "fsharp", "git", "gnu", "go",
    "golang", "hammerspoon", "handlebars", "handlebarsjs", "haskell", "haxe",
    "hex", "hexdocs", "httpd", "i3", "i3wm", "influxdata", "influxdb",
    "jasmine", "javascript", "jekyll", "jekyllrb", "jsdoc", "julia",
    "julialang", "khronos", "knockout", "knockoutjs", "kotlin", "kotlinlang",
    "laravel", "latex", "latexref", "less", "lesscss", "linux", "love2d",
    "lua", "man7", "mariadb", "mdn", "microsoft", "mocha", "mochajs",
    "modernizr", "moment", "momentjs", "mongoose", "mongoosejs", "mozilla",
    "mysql", "nginx", "nim", "nixos", "node", "nodejs", "npm", "npmjs",
    "ocaml", "odin", "openjdk", "opentsdb", "oracle", "perl", "phalcon",
    "phalconphp", "php", "playwright", "pointclouds", "pony", "ponylang",
    "postgresql", "prettier", "pug", "pugjs", "pydata", "pygame", "python",
    "pytorch", "qt", "qunit", "qunitjs", "r", "r-project", "react",
    "react-bootstrap", "reactivex", "reactjs", "reactnative", "reactrouter",
    "readthedocs", "redis", "redux", "redux.js", "requirejs", "rethinkdb",
    "ruby", "rubydoc", "rust", "rust-lang", "rxjs", "salt", "saltproject",
    "sass", "scala", "scikit", "scikit-image", "scikit-learn", "spring",
    "sqlite", "statsmodels", "superuser", "svelte", "swift", "symfony",
    "tailwind", "tailwindcss", "tcl", "terraform", "twig", "typescript",
    "underscore", "underscorejs", "vagrant", "vagrantup", "vite", "vitejs",
    "vitest", "vue", "vuejs", "vueuse", "vuex", "wagtail", "webpack",
    "webpack.js", "wordpress", "yarn", "yarnpkg", "yii", "yiiframework"
])

# Fixture boost set (12 terms) — the reference hardcodes ~190 tech keywords in
# serve.rs:362-369; fixtures define their own small set per FIXTURES.md §2.
FIXTURE_BOOST_TERMS = frozenset(
    ["rust", "python", "react", "redis", "linux", "git",
     "java", "go", "node", "npm", "swift", "kotlin"]
)


def idf(df, n_docs: int) -> np.ndarray:
    """ln(1 + (N - df + 0.5)/(df + 0.5)) — vectorized over df."""
    df = np.asarray(df, dtype=np.float64)
    return np.log1p((n_docs - df + 0.5) / (df + 0.5))


def tf_factor(tf, quantized_len, avgdl: float) -> np.ndarray:
    """tf*(k1+1)/(tf + k1*(1 - b + b*len/avgdl)) — vectorized."""
    tf = np.asarray(tf, dtype=np.float64)
    ql = np.asarray(quantized_len, dtype=np.float64)
    return tf * (K1 + 1.0) / (tf + K1 * (1.0 - B + B * ql / avgdl))


def query_plan(
    query: str, boost_terms: frozenset = DEFAULT_BOOST_TERMS
) -> List[Tuple[str, float]]:
    """Tokenize a query into ``[(term, boost), ...]`` with duplicates removed
    (first occurrence wins; conjunctive semantics make repeats redundant).

    The ×2.5 boost attaches to every token expanded from a raw whitespace
    token that is a (case-sensitive) member of ``boost_terms``, mirroring the
    reference's pre-tokenization membership check (serve.rs:388-405).
    """
    plan: Dict[str, float] = {}
    for raw in query.split():
        boost = TERM_BOOST if raw in boost_terms else 1.0
        for term in expand_token(raw):
            if term not in plan:
                plan[term] = boost
    return list(plan.items())


def score_components(
    tf_body, in_title, norm_title, norm_body,
    idf_title: float, idf_body: float,
    avgdl_title: float, avgdl_body: float, boost: float,
) -> np.ndarray:
    """Per-doc score contribution of one term (vectorized over candidate docs).

    ``norm_*`` are the QUANTIZED lengths (already decoded), ``tf_body`` may be
    0 (term present only in title), ``in_title`` is a bool array.
    """
    body = np.where(
        np.asarray(tf_body) > 0,
        idf_body * tf_factor(tf_body, norm_body, avgdl_body) * BODY_BOOST,
        0.0,
    )
    title = np.where(
        np.asarray(in_title, dtype=bool),
        idf_title * tf_factor(1.0, norm_title, avgdl_title) * TITLE_BOOST,
        0.0,
    )
    return boost * (body + title)


def top_k_indices(scores: np.ndarray, doc_ids: np.ndarray, k: int) -> np.ndarray:
    """Indices of the top-k by (-score, doc_id) — deterministic tie-break.

    For k << n uses argpartition to avoid a full lexsort: select everything
    scoring at or above the k-th value (ties included), then order just that
    slice."""
    n = len(scores)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    k = min(k, n)
    if n > 4 * k and k > 0:
        kth = np.partition(scores, n - k)[n - k]
        sel = np.nonzero(scores >= kth)[0]
        order = sel[np.lexsort((doc_ids[sel], -scores[sel]))]
        return order[:k]
    order = np.lexsort((doc_ids, -scores))
    return order[:k]
