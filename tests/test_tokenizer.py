"""Pins the tokenizer spec (FIXTURES.md §4) — shared by oracle and engine."""

from prosearch_ray.text.tokenizer import (
    camel_digit_split,
    expand_token,
    simple_tokenize,
    tokenize,
    tokenize_query,
)

# ~hand-checked (fragment -> token list) pairs, the expected_tokens analog.
CASES = [
    ("hello world", ["hello", "world"]),
    ("Hello", ["hello"]),
    ("getHTTPResponse", ["gethttpresponse", "get", "http", "response"]),
    ("snake_case_name", ["snake_case_name", "snake", "case", "name"]),
    ("src/main/App.java", ["src/main/app.java", "src", "main", "app", "java"]),
    ("x2y", ["x2y", "x", "2", "y"]),
    ('"quoted"', ["quoted"]),
    ("+foo-bar", ["foo-bar", "foo", "bar"]),
    ("...", []),
    ("", []),
    ("a", ["a"]),
    ("A", ["a"]),
    ("foo()", ["foo"]),
    ("foo(bar)", ["foo(bar", "foo", "bar"]),
    ("CamelCase", ["camelcase", "camel", "case"]),
    ("UPPER", ["upper"]),
    ("HTTPServer2xOK", ["httpserver2xok", "http", "server", "2", "x", "ok"]),
    ("tab\tsep\nnewline", ["tab", "sep", "newline"]),
    ("a_b", ["a_b", "a", "b"]),
    ("42", ["42"]),
    ("v1.2.3", ["v1.2.3", "v", "1", "2", "3"]),
]


def test_cases():
    for text, want in CASES:
        assert tokenize(text) == want, (text, tokenize(text), want)


def test_camel_digit_split():
    assert camel_digit_split("parseTokenStream") == ["parse", "Token", "Stream"]
    assert camel_digit_split("HTTP") == ["HTTP"]
    assert camel_digit_split("a1b2") == ["a", "1", "b", "2"]


def test_no_stemming_no_stopwords():
    assert tokenize("the running foxes") == ["the", "running", "foxes"]


def test_expand_token_emits_original_first():
    assert expand_token("FooBar")[0] == "foobar"


def test_query_tokenizer_neutralizes_operators():
    # serve.rs:270-299 quoting kills operator syntax -> plain lowercased terms
    assert tokenize_query("foo AND bar") == ["foo", "and", "bar"]
    assert tokenize_query('"phrase query"') == ["phrase", "query"]
    assert tokenize_query("+must -not") == ["must", "not"]
    assert tokenize_query("dup dup DUP") == ["dup"]


def test_simple_tokenizer_matches_sql_semantics():
    assert simple_tokenize("Hello, World_Foo 42x!") == ["hello", "world", "foo", "42x"]
    assert simple_tokenize("") == []
    assert simple_tokenize("---") == []


def test_determinism():
    text = "MergeHashBatch foo_bar src/lib/x.py 12ab"
    assert tokenize(text) == tokenize(text)


def test_index_split_matches_python_split_on_control_chars():
    """The segment kernel's Arrow whitespace split (after \\x1c-\\x1f
    normalization) must agree with Python str.split() — the query/oracle
    tokenizer — for every char in the control/latin-1 range."""
    import pyarrow as pa
    import pyarrow.compute as pc

    texts = [f"a{chr(c)}b" for c in list(range(0x00, 0x21)) + [0x7F, 0x85, 0xA0]]
    texts += ["a\x1c\x1d b\x1e\x1fc", "\x1cx\x1f", "  spaced  out  "]
    col = pc.replace_substring_regex(pa.array(texts, pa.string()),
                                     r"[\x1c-\x1f]", " ")
    arrow_split = pc.utf8_split_whitespace(col).to_pylist()
    py_split = [t.split() for t in texts]
    for t, a, p in zip(texts, arrow_split, py_split):
        # Arrow emits empty strings for leading/trailing whitespace; they
        # expand to no terms and shift positions uniformly (adjacency is
        # preserved), so the meaningful invariant is the non-empty sequence
        assert [x for x in a if x] == p, \
            f"divergence on {t!r}: arrow={a} python={p}"
