"""Typed fast-field sidecar + filtered search (tantivy typed-schema parity:
new.rs:83-95 field types, range/term filters over fast fields; filters mask
candidates without touching BM25 statistics)."""

import numpy as np
import pyarrow as pa
import pytest


@pytest.fixture(scope="module")
def ff_index(ray_session, tmp_path_factory):
    import ray.data as rd

    from prosearch_ray.fixtures import write_corpus
    from prosearch_ray.index.build import build_index
    from prosearch_ray.index.fastfields import build_fast_fields

    base = tmp_path_factory.mktemp("ff")
    d = write_corpus(str(base / "corpus"), n_docs=400)
    index_dir = str(base / "idx")
    build_index(d + "/corpus", index_dir, docs_per_bucket=64)

    def add_typed(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return t.append_column(
            "n_chars", pc.cast(pc.utf8_length(t.column("content")),
                               pa.int64()))

    src = rd.read_parquet(d + "/corpus").map_batches(
        add_typed, batch_format="pyarrow")
    rep = build_fast_fields(index_dir, src, columns=["lang", "n_chars"])
    return index_dir, rep


def _brute_filtered(searcher, query, mask, k):
    ids, scores = searcher.search(query, 10 ** 6)
    keep = mask[ids]
    ids, scores = ids[keep], scores[keep]
    order = np.lexsort((ids, -scores))[:k]
    return ids[order], scores[order], int(keep.sum())


def test_sidecar_covers_every_doc(ff_index):
    from prosearch_ray.index.fastfields import load_fast_fields
    from prosearch_ray.query.searcher import IndexSearcher

    index_dir, rep = ff_index
    s = IndexSearcher(index_dir)
    ff = load_fast_fields(index_dir, s.n_docs)
    assert rep["n_rows"] == s.n_docs
    assert ff["_valid"].all()
    # typed columns populated for every doc
    assert all(isinstance(v, str) and v for v in ff["lang"])
    assert (ff["n_chars"] > 0).all()
    # values come from the right corpus row: for every doc whose doc_key
    # has exactly ONE corpus row (no upsert ambiguity — the dup tie-break
    # is the build's own pinned rule), the sidecar lang equals that row's
    import pyarrow.dataset as pads

    from prosearch_ray.index import docid

    corpus_dir = index_dir.rsplit("/idx", 1)[0] + "/corpus/corpus"
    ct = pads.dataset(corpus_dir).to_table(columns=["repo", "path", "lang"])
    lang_of: dict = {}
    for r, p, lg in zip(ct.column("repo").to_pylist(),
                        ct.column("path").to_pylist(),
                        ct.column("lang").to_pylist()):
        key = docid.doc_key(r, p)
        lang_of[key] = None if key in lang_of else lg  # None = ambiguous
    checked = 0
    for d in range(s.n_docs):
        want = lang_of[str(s.doc_keys[d])]
        if want is not None:
            assert ff["lang"][d] == want
            checked += 1
    assert checked > 300


@pytest.mark.parametrize("query,predicates", [
    ("the", [("lang", "in", ("py", "rs"))]),                 # single term
    ("merge hash", [("n_chars", ">=", 400)]),                # conjunctive
    ("merge hash", [("lang", "==", "py"),
                    ("n_chars", "<", 900)]),                 # ANDed typed
    ("the", [("lang", "not_in", ("py",))]),
])
def test_filtered_search_matches_brute_force(ff_index, query, predicates):
    from prosearch_ray.index.fastfields import eval_filter, load_fast_fields
    from prosearch_ray.query.searcher import IndexSearcher

    index_dir, _ = ff_index
    s = IndexSearcher(index_dir)
    mask = eval_filter(load_fast_fields(index_dir, s.n_docs), predicates)
    want_ids, want_scores, want_count = _brute_filtered(s, query, mask, 10)
    got_ids, got_scores = s.search(query, 10, filter=predicates)
    assert got_ids.tolist() == want_ids.tolist()
    assert np.allclose(got_scores, want_scores, rtol=0, atol=1e-12)
    assert s.last_count == want_count
    assert 0 < want_count < (s.search(query, 1) and s.last_count)  # binds


def test_filtered_excludes_delta_docs(ff_index):
    import ray

    from prosearch_ray.index.delta import add_documents
    from prosearch_ray.query.searcher import IndexSearcher

    index_dir, _ = ff_index
    delta = pa.table({
        "repo": ["fforg/ffrepo"], "path": ["src/ff_delta.py"],
        "commit": ["a" * 40], "lang": ["py"],
        "content": ["zzffdelta merge hash stream"],
    })
    add_documents(index_dir, ray.data.from_arrow(delta))
    s = IndexSearcher(index_dir)
    ids, _ = s.search("zzffdelta", 10)
    assert len(ids) == 1  # unfiltered: delta doc found
    # filtered: the delta doc has no sidecar row -> never matches a typed
    # predicate (tantivy missing-fast-field semantics)
    ids, _ = s.search("zzffdelta", 10, filter=[("lang", "==", "py")])
    assert len(ids) == 0 and s.last_count == 0


def test_filter_errors(ff_index):
    from prosearch_ray.query.searcher import IndexSearcher

    index_dir, _ = ff_index
    s = IndexSearcher(index_dir)
    with pytest.raises(KeyError):
        s.search("the", 10, filter=[("nope", "==", 1)])
    with pytest.raises(ValueError):
        s.search("the", 10, filter=[("lang", "~", 1)])


def test_sharded_filter_matches_unsharded(ray_session, tmp_path):
    """Per-shard sidecars + filter push-down: the scatter-gather filtered
    top-k must equal the unsharded filtered top-k (scores bit-identical,
    doc_key tie-break)."""
    import ray.data as rd

    from prosearch_ray.fixtures import write_corpus
    from prosearch_ray.index.build import build_index
    from prosearch_ray.index.fastfields import (build_fast_fields,
                                                build_fast_fields_sharded)
    from prosearch_ray.index.sharded import build_sharded_index
    from prosearch_ray.query.searcher import IndexSearcher
    from prosearch_ray.query.sharded import ShardedSearcher

    d = write_corpus(str(tmp_path / "corpus"), n_docs=400)

    def add_typed(t):
        import pyarrow.compute as pc
        return t.append_column(
            "n_chars", pc.cast(pc.utf8_length(t.column("content")),
                               pa.int64()))

    src = rd.read_parquet(d + "/corpus").map_batches(
        add_typed, batch_format="pyarrow")
    single = str(tmp_path / "single")
    root = str(tmp_path / "shards")
    build_index(d + "/corpus", single, docs_per_bucket=64)
    build_sharded_index(d + "/corpus", root, num_shards=3,
                        docs_per_bucket=64)
    build_fast_fields(single, src, columns=["lang", "n_chars"])
    rep = build_fast_fields_sharded(root, src, columns=["lang", "n_chars"])
    s = IndexSearcher(single)
    assert rep["n_rows"] == s.n_docs and rep["num_shards"] == 3
    m = ShardedSearcher(root)
    try:
        for q, pred in [("the", [("lang", "in", ("py", "rs"))]),
                        ("merge hash", [("n_chars", ">=", 400)])]:
            ids, scs = s.search(q, 10, filter=pred)
            want = [(str(s.doc_keys[int(i)]), float(x))
                    for i, x in zip(ids, scs)]
            want.sort(key=lambda r: (-r[1], r[0]))
            keys, mscs = m.search(q, 10, filter=pred)
            assert [k for k, _ in want] == list(keys)
            assert np.allclose([x for _, x in want], mscs,
                               rtol=0, atol=1e-12)
            assert m.last_count == s.last_count > 0
    finally:
        m.shutdown()


def test_facet_counts(ff_index):
    """Facet counting: counts over ALL matching docs per fast-field value,
    consistent with brute-force; typed filter composes."""
    from prosearch_ray.index.fastfields import load_fast_fields
    from prosearch_ray.query.searcher import IndexSearcher

    index_dir, _ = ff_index
    s = IndexSearcher(index_dir)
    ff = load_fast_fields(index_dir, s.n_docs)
    ids, _ = s.search("merge hash", 10 ** 6)
    want: dict = {}
    for d in ids:
        if not ff["_valid"][d]:  # delta-added doc: no sidecar row
            continue
        want[ff["lang"][d]] = want.get(ff["lang"][d], 0) + 1
    got = s.facet_counts("merge hash", "lang")
    assert dict(got) == want
    assert [n for _, n in got] == sorted((n for n in want.values()),
                                         reverse=True)
    flt = s.facet_counts("merge hash", "lang",
                         filter=[("lang", "in", ("py", "rs"))])
    assert dict(flt) == {k: v for k, v in want.items() if k in ("py", "rs")}


def test_update_fast_fields_covers_delta(ff_index):
    """After the sidecar maintenance pass, delta-added docs match typed
    predicates (runs after test_filtered_excludes_delta_docs added the
    delta doc to this module's shared index)."""
    import pyarrow.compute as pc

    import ray.data as rd

    from prosearch_ray.index.fastfields import update_fast_fields
    from prosearch_ray.query.searcher import IndexSearcher

    index_dir, _ = ff_index
    delta = pa.table({
        "repo": ["fforg/ffrepo"], "path": ["src/ff_delta.py"],
        "commit": ["a" * 40], "lang": ["py"],
        "content": ["zzffdelta merge hash stream"],
    })
    delta = delta.append_column(
        "n_chars", pc.cast(pc.utf8_length(delta.column("content")),
                           pa.int64()))
    rep = update_fast_fields(index_dir, rd.from_arrow(delta))
    assert rep["added"] == 1
    s = IndexSearcher(index_dir)
    ids, _ = s.search("zzffdelta", 10, filter=[("lang", "==", "py")])
    assert len(ids) == 1 and s.last_count == 1
    ids, _ = s.search("zzffdelta", 10, filter=[("lang", "==", "rs")])
    assert len(ids) == 0
    # idempotent: a second pass adds nothing
    assert update_fast_fields(index_dir, rd.from_arrow(delta))["added"] == 0


def test_raw_and_phrase_filters(ff_index):
    """Typed filters compose with raw-syntax and phrase search: survivors'
    scores are bit-identical to their unfiltered scores (clause BM25 and
    phrase idf keep corpus-wide statistics)."""
    from prosearch_ray.index.fastfields import eval_filter, load_fast_fields
    from prosearch_ray.query.searcher import IndexSearcher

    index_dir, _ = ff_index
    s = IndexSearcher(index_dir)
    pred = [("lang", "in", ("py", "rs"))]
    mask = eval_filter(load_fast_fields(index_dir, s.n_docs), pred)
    for call in [lambda f: s.search_raw('+merge hash -batch', 10 ** 6,
                                        filter=f),
                 lambda f: s.search_raw('"merge hash" table', 10 ** 6,
                                        filter=f),
                 lambda f: s.search_phrase("the merge", 10 ** 6, filter=f)]:
        full_ids, full_scores = call(None)
        if not len(full_ids):
            continue
        by_id = dict(zip(full_ids.tolist(), full_scores.tolist()))
        keep = mask[full_ids]
        want_ids = full_ids[keep]
        got_ids, got_scores = call(pred)
        assert sorted(got_ids.tolist()) == sorted(want_ids.tolist())
        assert all(abs(by_id[int(i)] - float(x)) < 1e-12
                   for i, x in zip(got_ids, got_scores))
        assert s.last_count == int(keep.sum())
        assert 0 < s.last_count < len(full_ids)  # the filter binds


def test_sharded_raw_phrase_filters_match_unsharded(ray_session, tmp_path):
    from prosearch_ray.fixtures import write_corpus
    from prosearch_ray.index.build import build_index
    from prosearch_ray.index.fastfields import (build_fast_fields,
                                                build_fast_fields_sharded)
    from prosearch_ray.index.sharded import build_sharded_index
    from prosearch_ray.query.searcher import IndexSearcher
    from prosearch_ray.query.sharded import ShardedSearcher

    d = write_corpus(str(tmp_path / "corpus"), n_docs=400)
    single = str(tmp_path / "single")
    root = str(tmp_path / "shards")
    build_index(d + "/corpus", single, docs_per_bucket=64)
    build_sharded_index(d + "/corpus", root, num_shards=2,
                        docs_per_bucket=64)
    build_fast_fields(single, d + "/corpus", columns=["lang"])
    build_fast_fields_sharded(root, d + "/corpus", columns=["lang"])
    s = IndexSearcher(single)
    m = ShardedSearcher(root)
    pred = [("lang", "in", ("py", "rs"))]
    try:
        for call_s, call_m in [
            (lambda: s.search_raw('+merge "hash value" -batch', 10,
                                  filter=pred),
             lambda: m.search_raw('+merge "hash value" -batch', 10,
                                  filter=pred)),
            (lambda: s.search_phrase("hash value", 10, filter=pred),
             lambda: m.search_phrase("hash value", 10, filter=pred)),
        ]:
            ids, scs = call_s()
            want = sorted(
                ((str(s.doc_keys[int(i)]), float(x))
                 for i, x in zip(ids, scs)), key=lambda r: (-r[1], r[0]))
            count_s = s.last_count
            keys, mscs = call_m()
            assert [k for k, _ in want] == list(keys)
            assert np.allclose([x for _, x in want], mscs,
                               rtol=0, atol=1e-12)
            assert m.last_count == count_s
    finally:
        m.shutdown()


def test_timestamp_fast_field_filter(ff_index):
    """Date/timestamp-typed fast field (tantivy new.rs:83-95 declares date
    fields): an arrow timestamp column rides the generic sidecar path and
    range predicates over it match brute force.  Runs LAST against the
    module index — it rebuilds the sidecar with a different column set."""
    import pyarrow.compute as pc

    import ray.data as rd

    from prosearch_ray.index.fastfields import (build_fast_fields,
                                                load_fast_fields)
    from prosearch_ray.query.searcher import IndexSearcher

    index_dir, _ = ff_index
    corpus = str(__import__("pathlib").Path(index_dir).parent / "corpus")

    def add_ts(t: pa.Table) -> pa.Table:
        n = pc.utf8_length(t.column("content")).to_numpy(
            zero_copy_only=False).astype("int64")
        ts = (np.datetime64("2026-01-01T00:00:00", "us")
              + n * np.timedelta64(1, "s"))
        return t.append_column("indexed_at", pa.array(ts, pa.timestamp("us")))

    src = rd.read_parquet(corpus + "/corpus").map_batches(
        add_ts, batch_format="pyarrow")
    rep = build_fast_fields(index_dir, src, columns=["indexed_at"])
    s = IndexSearcher(index_dir)
    ff = load_fast_fields(index_dir, s.n_docs)
    assert ff["indexed_at"].dtype.kind == "M"
    assert rep["n_rows"] > 0
    cut = np.datetime64("2026-01-01T00:06:40", "us")  # 400 chars
    for op, mask in [(">=", ff["indexed_at"] >= cut),
                     ("<", ff["indexed_at"] < cut)]:
        want_ids, want_scs, want_n = _brute_filtered(
            s, "merge hash", mask & ff["_valid"], 10)
        ids, scs = s.search("merge hash", 10,
                            filter=[("indexed_at", op, cut)])
        assert list(ids) == list(want_ids)
        assert np.allclose(scs, want_scs, rtol=0, atol=0)
        assert s.last_count == want_n > 0


def test_sharded_sidecar_streams_and_handles_empty_shards(ray_session,
                                                          tmp_path):
    """The sharded sidecar build streams through a shard-partitioned write:
    every shard dir gets the exact unsharded layout (_meta.json + parquet
    parts WITHOUT a shard column), per-shard n_rows sum to the report, and
    a source that joins into only one shard leaves the others with valid
    EMPTY sidecars (typed predicates simply never match there)."""
    import json
    import os

    import pyarrow.parquet as pq
    import ray.data as rd

    from prosearch_ray.fixtures import write_corpus
    from prosearch_ray.index.fastfields import (FASTFIELD_DIR,
                                                build_fast_fields_sharded,
                                                load_fast_fields)
    from prosearch_ray.index.sharded import build_sharded_index, shard_dirs
    from prosearch_ray.query.sharded import ShardedSearcher

    d = write_corpus(str(tmp_path / "corpus"), n_docs=300)
    root = str(tmp_path / "shards")
    build_sharded_index(d + "/corpus", root, num_shards=3,
                        docs_per_bucket=64)
    rep = build_fast_fields_sharded(root, d + "/corpus", columns=["lang"])
    dirs = shard_dirs(root)
    assert rep["num_shards"] == 3
    total = 0
    for sd in dirs:
        ffd = os.path.join(sd, FASTFIELD_DIR)
        with open(os.path.join(ffd, "_meta.json")) as f:
            meta = json.load(f)
        parts = [os.path.join(ffd, f) for f in os.listdir(ffd)
                 if f.endswith(".parquet")]
        assert parts, "every shard must get a sidecar"
        for p in parts:
            assert "shard" not in pq.read_schema(p).names
        n = sum(pq.read_metadata(p).num_rows for p in parts)
        assert n == meta["n_rows"]
        total += n
    assert total == rep["n_rows"] > 0

    # single-row source -> exactly one shard joins; the rest write EMPTY
    # sidecars that load cleanly and never match
    one = rd.read_parquet(d + "/corpus").limit(1)
    rep1 = build_fast_fields_sharded(root, one, columns=["lang"])
    assert rep1["n_rows"] == 1
    n_nonempty = 0
    for sd in dirs:
        ff = load_fast_fields(sd, 10 ** 6)
        assert ff is not None
        n_nonempty += int(ff["_valid"].any())
    assert n_nonempty == 1
    m = ShardedSearcher(root)
    try:
        m.search("the", 5, filter=[("lang", "==", "zz-nolang")])
        assert m.last_count == 0
    finally:
        m.shutdown()


def test_bytes_fast_field_filter(ff_index):
    """Bytes-typed fast field (tantivy new.rs:83-95 declares bytes fields):
    an arrow binary column rides the generic sidecar path (object-dtype
    numpy on the query side) and equality / set predicates over it match
    brute force.  Rebuilds the module index's sidecar — runs after the
    timestamp test, same convention."""
    import hashlib

    import pyarrow.compute as pc

    import ray.data as rd

    from prosearch_ray.index.fastfields import (build_fast_fields,
                                                load_fast_fields)
    from prosearch_ray.query.searcher import IndexSearcher

    index_dir, _ = ff_index
    corpus = str(__import__("pathlib").Path(index_dir).parent / "corpus")

    def add_digest(t: pa.Table) -> pa.Table:
        # 2-byte deterministic content digest: a small value domain so
        # equality predicates bind on a 400-doc corpus
        dig = [hashlib.md5(x.encode()).digest()[:2]
               for x in t.column("content").to_pylist()]
        return t.append_column("digest2", pa.array(dig, pa.binary()))

    src = rd.read_parquet(corpus + "/corpus").map_batches(
        add_digest, batch_format="pyarrow")
    rep = build_fast_fields(index_dir, src, columns=["digest2"])
    assert rep["n_rows"] > 0
    s = IndexSearcher(index_dir)
    ff = load_fast_fields(index_dir, s.n_docs)
    assert ff["digest2"].dtype.kind == "O"
    vals = [v for v, m in zip(ff["digest2"], ff["_valid"]) if m]
    probe = vals[0]
    assert isinstance(probe, bytes) and len(probe) == 2
    for pred, mask in [
        ([("digest2", "==", probe)], ff["digest2"] == probe),
        ([("digest2", "!=", probe)], ff["digest2"] != probe),
    ]:
        want_ids, want_scs, want_n = _brute_filtered(
            s, "the", np.asarray(mask, bool) & ff["_valid"], 10)
        ids, scs = s.search("the", 10, filter=pred)
        assert list(ids) == list(want_ids)
        assert np.allclose(scs, want_scs, rtol=0, atol=0)
        assert s.last_count == want_n
    assert s.last_count > 0  # != side binds; == side checked below
    ids, _ = s.search("the", 10, filter=[("digest2", "==", probe)])
    assert s.last_count >= 1
