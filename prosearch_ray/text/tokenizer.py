"""Tokenizer spec — the single module shared by the corpus generator, the
brute-force oracle, and the distributed engine (FIXTURES.md §4).

Reference semantics: prosearch's ``white-lowercaser`` tokenizer is
``WhitespaceTokenizer`` + ``LowerCaser`` — split on Unicode whitespace,
lowercase, no stemming / stopwords / punctuation stripping
(/root/reference/tantivy-cli/src/commands/serve.rs:326-330,
/root/reference/tantivy-cli/index-init/meta.json:14,27).

The north-star extends this with code-aware identifier splitting
(camelCase / snake_case / digit boundaries) and path tokenization.  The exact
deterministic spec implemented here (and pinned by tests/test_tokenizer.py):

1. Split the text on Unicode whitespace (``str.split()``).
2. For each raw whitespace token:
   a. strip leading/trailing punctuation (anything not alphanumeric);
      drop the token if nothing remains;
   b. emit ``core.lower()`` (the original unsplit identifier, lowercased);
   c. split ``core`` on every internal non-alphanumeric run (covers ``_``,
      ``/``, ``.``, ``-``, and all other punctuation — i.e. both snake_case
      and path segmentation), then split each piece on camelCase and
      letter<->digit boundaries; if the resulting lowercased part list is not
      exactly ``[core.lower()]``, emit every part as an additional token.
3. No stemming, no stopword removal; empty tokens are never emitted.
4. ``n_tokens`` of a field is the count of ALL emitted tokens (feeds avgdl and
   the fieldnorm id).

``simple_tokenize`` is the reduced, SQL-expressible variant used by the
driver-checked pipelines over the ``documents`` table: lowercase + split on
non-alphanumeric runs.  It matches DuckDB's
``list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')``
exactly (for ASCII inputs), which is what makes the oracle-SQL comparison
byte-exact.
"""

from __future__ import annotations

import re
from functools import lru_cache
from typing import List

# Camel / acronym / digit splitter: "HTTPServer2x" -> HTTP, Server, 2, x
_CAMEL_RE = re.compile(r"[A-Z]+(?![a-z])|[A-Z][a-z]*|[a-z]+|[0-9]+")
# Internal separator runs (snake_case, paths, dotted names, punctuation).
_SEP_RE = re.compile(r"[^0-9A-Za-z]+")
# Leading/trailing punctuation strip.
_EDGE_RE = re.compile(r"^[^0-9A-Za-z]+|[^0-9A-Za-z]+$")

_SIMPLE_RE = re.compile(r"[^a-z0-9]+")


def camel_digit_split(token: str) -> List[str]:
    """Split one separator-free token on camelCase / acronym / letter<->digit
    boundaries. Pure ASCII-classed; non-ASCII letters fall out of the classes
    and simply don't split (they were already separated by ``_SEP_RE``)."""
    parts = _CAMEL_RE.findall(token)
    return parts if parts else [token]


@lru_cache(maxsize=262144)
def expand_token(raw: str) -> List[str]:
    """Emit the token list for one raw whitespace-delimited token (spec 2a-2c).

    Memoized per process: raw-token frequency is Zipfian, so in a hot build
    loop the cache turns three regex passes per token into a dict hit for the
    overwhelming majority of tokens. The returned list is shared — callers
    must not mutate it."""
    core = _EDGE_RE.sub("", raw)
    if not core:
        return []
    low = core.lower()
    out = [low]
    parts: List[str] = []
    for piece in _SEP_RE.split(core):
        if piece:
            parts.extend(p.lower() for p in camel_digit_split(piece))
    if parts != [low]:
        out.extend(parts)
    return out


def tokenize(text: str) -> List[str]:
    """Full code-aware tokenization of a field value (spec above)."""
    out: List[str] = []
    for raw in text.split():
        out.extend(expand_token(raw))
    return out


def tokenize_query(query: str) -> List[str]:
    """Query-side tokenization.

    prosearch neutralizes all query-operator syntax by escaping and
    individually quoting every whitespace token
    (/root/reference/tantivy-cli/src/commands/serve.rs:270-299), so ``AND`` /
    ``OR`` / ``+`` / ``-`` / quotes reach the index as plain terms.  Running
    the same tokenizer over the query reproduces exactly that: punctuation is
    stripped/split, text lowercased.  Duplicate terms are removed
    (conjunctive semantics make them redundant), order preserved.
    """
    seen = set()
    out: List[str] = []
    for tok in tokenize(query):
        if tok not in seen:
            seen.add(tok)
            out.append(tok)
    return out


def simple_tokenize(text: str) -> List[str]:
    """Reduced tokenizer for SQL-checkable pipelines: lowercase, split on
    non-[a-z0-9] runs, drop empties. Mirrors the DuckDB expression in the
    module docstring."""
    return [t for t in _SIMPLE_RE.split(text.lower()) if t]


def phrase_tokens(text: str):
    """Phrase-query tokenization shared by every phrase entry point
    (searcher.search_phrase, the raw-syntax parser, the sharded shard
    worker): lowercased raw whitespace tokens with non-alphanumeric edges
    stripped, empties dropped.  One definition — sharded-vs-unsharded
    phrase parity depends on these sites never diverging."""
    return [c.lower() for c in
            (_EDGE_RE.sub("", raw) for raw in text.split()) if c]
