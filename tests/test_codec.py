import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from prosearch_ray.index.codec import (
    decode_bitset,
    decode_deltas,
    decode_varints,
    encode_bitset,
    encode_deltas,
    encode_varints,
)


@given(st.lists(st.integers(min_value=0, max_value=2**64 - 1), max_size=300))
@settings(max_examples=200, deadline=None)
def test_varint_roundtrip(vals):
    arr = np.asarray(vals, dtype=np.uint64)
    assert (decode_varints(encode_varints(arr)) == arr).all()


@given(st.sets(st.integers(min_value=0, max_value=2**62), max_size=300))
@settings(max_examples=200, deadline=None)
def test_delta_roundtrip(ids):
    arr = np.asarray(sorted(ids), dtype=np.uint64)
    assert (decode_deltas(encode_deltas(arr)) == arr).all()


@given(st.lists(st.booleans(), max_size=300))
@settings(max_examples=100, deadline=None)
def test_bitset_roundtrip(flags):
    arr = np.asarray(flags, dtype=bool)
    assert (decode_bitset(encode_bitset(arr), len(arr)) == arr).all()


def test_empty():
    assert encode_varints([]) == b""
    assert len(decode_varints(b"")) == 0
    assert len(decode_deltas(b"")) == 0


def test_single_byte_values_stay_single_byte():
    assert len(encode_varints([0, 1, 127])) == 3
    assert len(encode_varints([128])) == 2


def test_gap_compression_is_tight():
    # consecutive ids -> 1 byte per gap after the first id
    ids = np.arange(1000, 2000, dtype=np.uint64)
    assert len(encode_deltas(ids)) == 2 + 999


def test_decode_deltas_grouped_matches_per_group():
    import numpy as np

    from prosearch_ray.index.codec import (decode_deltas,
                                           decode_deltas_grouped,
                                           encode_deltas_grouped)

    rng = np.random.default_rng(3)
    glens = np.array([0, 1, 5, 0, 700, 3, 0], dtype=np.int64)
    total = int(glens.sum())
    # strictly increasing within each group, arbitrary across groups
    vals = []
    for n in glens:
        if n:
            vals.append(np.cumsum(rng.integers(1, 1000, size=n, dtype=np.int64))
                        + int(rng.integers(0, 10**9)))
    flat = np.concatenate(vals).astype(np.uint64)
    blobs = encode_deltas_grouped(flat, glens)
    got = decode_deltas_grouped(b"".join(blobs), glens)
    assert np.array_equal(got, flat)
    # agrees with the per-group scalar decoder
    per = np.concatenate([decode_deltas(b) for b in blobs if b]) \
        if any(blobs) else np.empty(0, np.uint64)
    assert np.array_equal(got, per)


def test_decode_bitset_grouped_matches_per_group():
    import numpy as np

    from prosearch_ray.index.codec import (decode_bitset,
                                           decode_bitset_grouped,
                                           encode_bitset)

    rng = np.random.default_rng(4)
    glens = np.array([0, 3, 8, 17, 0, 1, 64, 5], dtype=np.int64)
    groups = [rng.integers(0, 2, size=n).astype(bool) for n in glens]
    buf = b"".join(encode_bitset(g) for g in groups)
    got = decode_bitset_grouped(buf, glens)
    want = np.concatenate([decode_bitset(encode_bitset(g), len(g))
                           for g in groups]) if glens.sum() else np.empty(0, bool)
    assert np.array_equal(got, want)


def test_decode_varints_sparse_continuation_paths():
    """Pin the 1-byte and sparse-continuation fast paths against the general
    decoder semantics (encode-decode identity over adversarial mixes)."""
    import numpy as np

    from prosearch_ray.index.codec import decode_varints, encode_varints

    rng = np.random.default_rng(9)
    cases = [
        np.arange(127, dtype=np.uint64),                       # all 1-byte
        np.array([300], dtype=np.uint64),                      # single multi
        np.array([1, 1, 1, 40_000_000, 1, 1], dtype=np.uint64),
        np.concatenate([np.ones(1000, np.uint64),
                        [np.uint64(2**56 + 3)],
                        np.ones(1000, np.uint64) * 5,
                        [np.uint64(2**31)],
                        np.ones(30, np.uint64)]),              # sparse runs
        rng.integers(0, 2**60, size=500).astype(np.uint64),    # dense multi
        np.array([127, 128, 129, 16383, 16384], dtype=np.uint64),  # borders
    ]
    for vals in cases:
        assert np.array_equal(decode_varints(encode_varints(vals)), vals)


def test_decode_varints_truncated_stream_raises():
    """A buffer ending on a continuation byte is corrupt: every decode path
    must fail with a descriptive codec error, not an IndexError (sparse
    patch path) or a silently dropped tail (general path)."""
    import numpy as np
    import pytest

    from prosearch_ray.index.codec import decode_varints, encode_varints

    for vals in (
        np.array([1, 300, 5], dtype=np.uint64),           # sparse-cont path
        np.arange(1, 400, dtype=np.uint64) * 257,          # dense-cont path
    ):
        buf = encode_varints(vals)
        with pytest.raises(ValueError, match="truncated varint"):
            decode_varints(buf[:-1] + bytes([0x80]))
