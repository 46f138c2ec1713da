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
