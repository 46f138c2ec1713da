"""Property tests for the shared within-doc n-gram kernel
(trainprep.doc_ngrams) — the single definition under decontaminate /
boilerplate_flags / MinHash-SimHash shingling / pmi_bigrams.  Pure Arrow +
numpy; no Ray session needed."""

import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from prosearch_ray.pipelines.trainprep import _split_tokens, doc_ngrams
from prosearch_ray.text.tokenizer import simple_tokenize

TEXT = st.text(alphabet="abz19 .,_-\tABC", max_size=40)


def _reference(texts, n):
    grams, doc_of = [], []
    for i, t in enumerate(texts):
        toks = simple_tokenize(t)
        for j in range(len(toks) - n + 1):
            grams.append(" ".join(toks[j:j + n]))
            doc_of.append(i)
    return grams, doc_of


@settings(max_examples=200, deadline=None)
@given(st.lists(TEXT, max_size=8), st.integers(2, 4))
def test_doc_ngrams_matches_per_doc_reference(texts, n):
    grams, doc_of = doc_ngrams(pa.array(texts, pa.string()), n)
    want_g, want_d = _reference(texts, n)
    assert grams.to_pylist() == want_g
    assert doc_of.tolist() == want_d


@settings(max_examples=100, deadline=None)
@given(st.lists(TEXT, max_size=6))
def test_doc_ngrams_pre_equals_direct(texts):
    col = pa.array(texts, pa.string())
    pre = _split_tokens(col)
    g1, d1 = doc_ngrams(col, 2)
    g2, d2 = doc_ngrams(None, 2, pre=pre)
    assert g1.to_pylist() == g2.to_pylist()
    assert d1.tolist() == d2.tolist()
