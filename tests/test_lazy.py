"""Lazy delta segments (the tantivy freshly-committed-segment + merge-policy
analog, index.rs semantics): ``add_documents_lazy`` builds each delta as a
tiny self-contained index under ``lazysegs/`` instead of folding it into
every term-hash part of its target shards.  These tests pin the controlling
claim — lazy and eager folds score BIT-identically on every query surface —
plus shadowing across segments, deletes, the merge-policy fold (which
expunges segment tombstones like a tantivy merge — parity pinned through
compaction), the auto-fold cap, and crash-heal of an interrupted fold."""

import shutil

import numpy as np
import pyarrow as pa
import pytest


def _delta(rows):
    return pa.table({
        "repo": [r[0] for r in rows],
        "path": [r[1] for r in rows],
        "commit": [r[2] for r in rows],
        "lang": [r[3] for r in rows],
        "content": [r[4] for r in rows],
    })


def _row(corpus: pa.Table, i: int):
    return [corpus.column(c)[i].as_py()
            for c in ("repo", "path", "commit", "lang", "content")]


DELTA3_TOKEN = "qqlazythird"


@pytest.fixture(scope="module")
def lazy_vs_eager(ray_session, tmp_path_factory):
    """Two roots from one build (copytree): deltas applied EAGERLY to one
    and LAZILY to the other.  delta1 = 2 upserts of base docs + 2 new docs;
    delta2 = 1 re-upsert of a delta1 doc (segment shadows segment) + 1 new
    doc."""
    import ray.data as rd

    from prosearch_ray.fixtures.gen import generate_corpus
    from prosearch_ray.index.sharded import (add_documents_lazy,
                                             add_documents_sharded,
                                             build_sharded_index)

    base = tmp_path_factory.mktemp("lazysegs")
    corpus = generate_corpus(600)
    root_e, root_l = str(base / "eager"), str(base / "lazy")
    build_sharded_index(rd.from_arrow(corpus), root_e, num_shards=3,
                        docs_per_bucket=128)
    shutil.copytree(root_e, root_l)

    up1, up2 = _row(corpus, 5), _row(corpus, 17)
    up1[4] += " qqlazyupdated extra tokens"
    up2[4] += " qqlazyupdated more"
    d1 = _delta([
        up1, up2,
        ["lazyorg/one", "src/a_new.py", "c1", "py",
         "def qqlazynew(): return qqlazyv1"],
        ["lazyorg/one", "src/b_new.py", "c1", "py",
         "class QqLazyNew: qqlazynew marker"],
    ])
    d2 = _delta([
        # re-upsert of a delta1 doc: the OLD copy lives in seg=00000, not in
        # any hash shard — the new segment must shadow it
        ["lazyorg/one", "src/a_new.py", "c2", "py",
         "def qqlazynew(): return qqlazyv2"],
        ["lazyorg/two", "src/c_new.py", "c1", "py",
         "qqlazynew number three"],
    ])
    for d in (d1, d2):
        add_documents_sharded(root_e, d)
        add_documents_lazy(root_l, d)
    return root_e, root_l, corpus


def _open(root):
    from prosearch_ray.query.sharded import ShardedSearcher

    return ShardedSearcher(root)


def _assert_parity(se, sl, queries):
    for q in queries:
        ek, es = se.search(q, 20)
        lk, ls = sl.search(q, 20)
        assert se.last_count == sl.last_count, q
        assert ek == lk, q
        assert es == ls, q  # bit-identical scores, not just close


def test_lazyseg_layout(lazy_vs_eager):
    import json
    import os

    from prosearch_ray.index.sharded import lazyseg_dirs

    root_e, root_l, _ = lazy_vs_eager
    assert lazyseg_dirs(root_e) == []
    segs = lazyseg_dirs(root_l)
    assert [s.rsplit("=", 1)[1] for s in segs] == ["00000", "00001"]
    ge = json.load(open(os.path.join(root_e, "global_stats.json")))
    gl = json.load(open(os.path.join(root_l, "global_stats.json")))
    # identical corpus accounting (tombstoned old versions count until
    # compaction on BOTH paths)
    assert ge["n_docs"] == gl["n_docs"]
    assert ge["avgdl_title"] == gl["avgdl_title"]
    assert ge["avgdl_body"] == gl["avgdl_body"]


def test_search_parity(lazy_vs_eager):
    from prosearch_ray.fixtures.gen import generate_queries

    root_e, root_l, _ = lazy_vs_eager
    se, sl = _open(root_e), _open(root_l)
    try:
        qs = [r["query"] for r in generate_queries().to_pylist()]
        qs += ["qqlazynew", "qqlazyupdated", "qqlazyv2", "marker"]
        _assert_parity(se, sl, qs)
        # the segment docs are actually reachable (not just absent-on-both)
        sl.search("qqlazynew", 10)
        assert sl.last_count == 3
    finally:
        se.shutdown()
        sl.shutdown()


def test_raw_and_phrase_parity(lazy_vs_eager):
    root_e, root_l, _ = lazy_vs_eager
    se, sl = _open(root_e), _open(root_l)
    try:
        for q in ['+qqlazynew -qqlazyv2', 'qqlazynew qqlazyupdated',
                  '+class "qqlazynew marker"', '"return qqlazyv2"']:
            ek, es = se.search_raw(q, 20)
            lk, ls = sl.search_raw(q, 20)
            assert (se.last_count, ek, es) == (sl.last_count, lk, ls), q
        for q in ["qqlazynew marker", "return qqlazyv2"]:
            ek, es = se.search_phrase(q, 20)
            lk, ls = sl.search_phrase(q, 20)
            assert (se.last_count, ek, es) == (sl.last_count, lk, ls), q
    finally:
        se.shutdown()
        sl.shutdown()


def test_upsert_shadowing_across_segments(lazy_vs_eager):
    """delta2 re-upserted src/a_new.py: its delta1 copy (in seg=00000) must
    be tombstoned — qqlazyv1 is gone, qqlazyv2 matches once, and the key
    appears exactly once in the union."""
    root_e, root_l, _ = lazy_vs_eager
    for root in (root_e, root_l):
        s = _open(root)
        try:
            s.search("qqlazyv1", 10)
            assert s.last_count == 0
            keys, _ = s.search("qqlazyv2", 10)
            assert s.last_count == 1
            assert keys == ["lazyorg/one/src/a_new.py"]
        finally:
            s.shutdown()


def test_delete_probes_lazysegs(lazy_vs_eager):
    from prosearch_ray.index.sharded import delete_docs_sharded

    root_e, root_l, _ = lazy_vs_eager
    for root in (root_e, root_l):
        n = delete_docs_sharded(root, ["lazyorg/two/src/c_new.py"])
        assert n == 1
    se, sl = _open(root_e), _open(root_l)
    try:
        _assert_parity(se, sl, ["qqlazynew"])
        sl.search("qqlazynew", 10)
        assert sl.last_count == 2
    finally:
        se.shutdown()
        sl.shutdown()


def test_eager_add_shadows_lazyseg_copy(lazy_vs_eager):
    """Mixed usage: an EAGER upsert on a root with unfolded segments must
    tombstone the segment-resident old copy (applied to both roots to keep
    them in lockstep for the fold test)."""
    from prosearch_ray.index.sharded import add_documents_lazy, \
        add_documents_sharded

    root_e, root_l, _ = lazy_vs_eager
    d3 = _delta([
        ["lazyorg/one", "src/b_new.py", "c3", "py",
         f"def rewritten(): {DELTA3_TOKEN}"],
    ])
    add_documents_sharded(root_e, d3)
    add_documents_sharded(root_l, d3)  # eager onto the lazy root
    se, sl = _open(root_e), _open(root_l)
    try:
        _assert_parity(se, sl, ["qqlazynew", DELTA3_TOKEN, "marker"])
        sl.search(DELTA3_TOKEN, 10)
        assert sl.last_count == 1
        sl.search("qqlazynew", 10)  # the b_new.py v1 body is shadowed
        assert sl.last_count == 1
    finally:
        se.shutdown()
        sl.shutdown()


def test_filtered_parity_with_sidecars(lazy_vs_eager):
    """Typed fast-field sidecars over a lazy root: the root-level sidecar
    build covers segment docs (search_dirs), and filtered scatter-gather
    matches the eager root bit-for-bit."""
    from prosearch_ray.index.fastfields import build_fast_fields_sharded

    root_e, root_l, corpus = lazy_vs_eager
    typed = corpus.select(["repo", "path", "commit", "lang"])
    extra = pa.table({
        "repo": ["lazyorg/one", "lazyorg/one", "lazyorg/two"],
        "path": ["src/a_new.py", "src/b_new.py", "src/c_new.py"],
        "commit": ["c9", "c9", "c9"],
        "lang": ["py", "py", "py"],
    })
    import ray.data as rd

    src = pa.concat_tables([typed, extra])
    for root in (root_e, root_l):
        build_fast_fields_sharded(root, rd.from_arrow(src), ["lang"])
    se, sl = _open(root_e), _open(root_l)
    try:
        for q, flt in [("qqlazynew", [("lang", "==", "py")]),
                       ("qqlazynew", [("lang", "==", "rs")]),
                       ("def", [("lang", "==", "py")])]:
            ek, es = se.search(q, 20, filter=flt)
            lk, ls = sl.search(q, 20, filter=flt)
            assert (se.last_count, ek, es) == (sl.last_count, lk, ls), (q, flt)
        sl.search("qqlazynew", 10, filter=[("lang", "==", "py")])
        assert sl.last_count == 1  # the segment doc IS filterable
    finally:
        se.shutdown()
        sl.shutdown()


def test_empty_sidecar_seeded_on_lazy_add(lazy_vs_eager, tmp_path):
    """A lazy add AFTER sidecars exist seeds the new segment with a
    zero-row sidecar: filtered queries neither raise nor match the new doc
    (the eager fold's delta-doc semantics)."""
    from prosearch_ray.index.sharded import (add_documents_lazy,
                                             add_documents_sharded,
                                             lazyseg_dirs)

    root_e, root_l, _ = lazy_vs_eager
    d4 = _delta([["lazyorg/three", "src/d_new.py", "c1", "py",
                  "qqlazyfourth content"]])
    add_documents_sharded(root_e, d4)  # lockstep for the fold test
    rep = add_documents_lazy(root_l, d4)
    assert rep["added"] == 1 and not rep["folded"]
    sl = _open(root_l)
    try:
        sl.search("qqlazyfourth", 10)
        assert sl.last_count == 1
        keys, _ = sl.search("qqlazyfourth", 10, filter=[("lang", "==", "py")])
        assert sl.last_count == 0 and keys == []
    finally:
        sl.shutdown()


def test_fold_converges_to_eager(lazy_vs_eager, tmp_path):
    """The merge policy (tantivy segment merge analog): fold_lazysegs
    expunges segment-resident tombstones, so corpus stats/idf shift toward
    compaction semantics and raw BM25 scores are NOT bit-stable across the
    fold — same as any tantivy merge.  The pinned contract instead:
      1. live match counts and result KEY sets are unchanged by the fold
         (deletes/upserts stay applied; nothing resurrects or vanishes);
      2. compacting the folded root is BIT-identical to compacting the
         equivalent eagerly-maintained root (counts, keys, scores) — both
         converge to the same pure-live corpus."""
    from prosearch_ray.fixtures.gen import generate_queries
    from prosearch_ray.index.sharded import (compact_sharded, fold_lazysegs,
                                             lazyseg_dirs)

    root_e, root_l, _ = lazy_vs_eager
    rep = fold_lazysegs(root_l)
    assert rep["folded_segs"] == 3
    assert lazyseg_dirs(root_l) == []
    se, sl = _open(root_e), _open(root_l)
    try:
        qs = [r["query"] for r in generate_queries().to_pylist()]
        for q in qs:
            se.search(q, 20)
            sl.search(q, 20)
            assert se.last_count == sl.last_count, q
        # exact results on the fold-affected tokens (few matches, k covers
        # all: rank flips at the k boundary can't mask a membership bug)
        for q in ["qqlazynew", "qqlazyupdated", "qqlazyv2", DELTA3_TOKEN,
                  "qqlazyfourth"]:
            ek, _ = se.search(q, 20)
            lk, _ = sl.search(q, 20)
            assert (se.last_count, sorted(ek)) == (sl.last_count, sorted(lk)), q
        for q in ['+qqlazynew -qqlazyv2', '"return qqlazyv2"']:
            ek, _ = se.search_raw(q, 20)
            lk, _ = sl.search_raw(q, 20)
            assert (se.last_count, sorted(ek)) == (sl.last_count, sorted(lk)), q
    finally:
        se.shutdown()
        sl.shutdown()

    # post-compaction both roots are the same pure-live corpus: bit parity
    ce, cl = str(tmp_path / "ce"), str(tmp_path / "cl")
    compact_sharded(root_e, ce)
    compact_sharded(root_l, cl)
    se, sl = _open(ce), _open(cl)
    try:
        _assert_parity(se, sl, qs + ["qqlazynew", "qqlazyupdated",
                                     "qqlazyv2", DELTA3_TOKEN,
                                     "qqlazyfourth"])
    finally:
        se.shutdown()
        sl.shutdown()


def test_autofold_cap_and_heal(ray_session, tmp_path):
    """lazy_max_segs caps unfolded segments (the add that crosses it folds
    everything), and a dangling _folding.json marker is healed by the next
    maintenance call."""
    import os

    import ray.data as rd

    from prosearch_ray.fixtures.gen import generate_corpus
    from prosearch_ray.index.build import _atomic_write_json
    from prosearch_ray.index.sharded import (add_documents_lazy,
                                             build_sharded_index,
                                             lazyseg_dirs)

    root = str(tmp_path / "root")
    build_sharded_index(rd.from_arrow(generate_corpus(200)), root,
                        num_shards=2, docs_per_bucket=64)
    d1 = _delta([["caporg/r", "src/one.py", "c1", "py", "qqcapone body"]])
    rep = add_documents_lazy(root, d1, lazy_max_segs=1)
    assert not rep["folded"] and len(lazyseg_dirs(root)) == 1
    d2 = _delta([["caporg/r", "src/two.py", "c1", "py", "qqcaptwo body"]])
    rep = add_documents_lazy(root, d2, lazy_max_segs=1)
    assert rep["folded"] and lazyseg_dirs(root) == []

    # dangling marker (a fold that died before deleting anything): the next
    # lazy add completes the fold first, then proceeds
    d3 = _delta([["caporg/r", "src/three.py", "c1", "py", "qqcapthree x"]])
    add_documents_lazy(root, d3, lazy_max_segs=8)
    assert len(lazyseg_dirs(root)) == 1
    _atomic_write_json({"segs": ["seg=00000"]},
                       os.path.join(root, "lazysegs", "_folding.json"))
    d4 = _delta([["caporg/r", "src/four.py", "c1", "py", "qqcapfour y"]])
    add_documents_lazy(root, d4, lazy_max_segs=8)
    # heal folded seg=00000 (the d3 doc) into the shards; d4 got a fresh seg
    assert [os.path.basename(s) for s in lazyseg_dirs(root)] == ["seg=00000"]
    s = _open(root)
    try:
        for tok in ("qqcapone", "qqcaptwo", "qqcapthree", "qqcapfour"):
            s.search(tok, 5)
            assert s.last_count == 1, tok
    finally:
        s.shutdown()
