"""The full-engine SQL oracles re-implement the code-aware tokenizer in
DuckDB (RE2 boundary-insertion instead of lookahead).  This pins the two
implementations token-for-token, so a tokenizer edit that forgets the SQL
side fails here rather than as a driver value-mismatch."""

import duckdb
import pytest

from prosearch_ray.text.tokenizer import expand_token, tokenize

# Built from the REAL __ray_entry__._expand_cte — a hand-maintained copy
# here once drifted from the oracle template (the copy had correct '\\1'
# backrefs while the template shipped doubled ones, so this suite stayed
# green while every oracle title length was wrong; caught by the first
# title-matching driver entry, code_search_lazy_topk).
import __ray_entry__ as _entry

_EXPAND_SQL = f"""
WITH raws(doc, raw) AS (SELECT * FROM inp),
exp AS {_entry._expand_cte('raws')}
SELECT doc, toks FROM exp ORDER BY doc
"""

CASES = [
    "hello", "Hello", "HTTPServer2x", "parseURL", "XMLHttpRequest",
    "snake_case_name", "a/b/c.txt", "doc0000123", "__dunder__", "x",
    "...", "a..b", "MixedCase_with/path.v2", "UPPER", "iOS9Beta",
    "org0001/repo007-017/pkg/docs/hashTokenMerge_330327.py",
    "2fast4you", "A1b2C3", "trailing...", "--leading", "mid--dle",
]


@pytest.mark.parametrize("raw", CASES)
def test_expand_token_matches_sql(raw):
    con = duckdb.connect()
    con.execute("CREATE TABLE inp(doc INTEGER, raw VARCHAR)")
    con.execute("INSERT INTO inp VALUES (0, ?)", [raw])
    rows = con.execute(_EXPAND_SQL).fetchall()
    toks = rows[0][1] if rows else []  # all-punctuation core emits nothing
    assert toks == expand_token(raw), raw


def test_full_text_expansion_matches_sql_on_fixture_corpus():
    from prosearch_ray.fixtures.gen import generate_corpus

    corpus = generate_corpus(64)
    texts = corpus.column("content").to_pylist()[:64]
    con = duckdb.connect()
    con.execute("CREATE TABLE inp(doc INTEGER, raw VARCHAR)")
    rows = [(i, r) for i, t in enumerate(texts) for r in t.split()]
    con.executemany("INSERT INTO inp VALUES (?, ?)", rows)
    got = {}
    for doc, toks in con.execute(_EXPAND_SQL).fetchall():
        got.setdefault(doc, []).extend(toks)
    for i, t in enumerate(texts):
        assert got.get(i, []) == tokenize(t), f"doc {i}"
