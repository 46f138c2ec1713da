"""Posting-list codec: delta-gap + LEB128 varint, numpy-vectorized.

The reference's postings live inside tantivy segments (bitpacked blocks of
128); here postings are opaque ``binary`` columns in Parquet so that blocks
move zero-copy through the Ray object store.  Encoding:

- ``encode_deltas(doc_ids)``  — strictly-increasing uint64 doc ids stored as
  ``[first, gap, gap, ...]`` varints (gap = id[i] - id[i-1], >= 1).
- ``encode_varints(values)``  — plain varint stream (term frequencies; 0 is
  legal and means "present only in the other field").
- ``encode_bitset(flags)``    — LSB-first bitset (title-presence flags).

All encoders/decoders are vectorized with numpy (no per-int Python loop):
encoding splits every value into its 7-bit groups with shifts, decoding
reconstructs values from continuation-bit runs via cumulative group indices.
Property tests in tests/test_codec.py pin encode∘decode == identity.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "encode_varints",
    "decode_varints",
    "encode_deltas",
    "decode_deltas",
    "encode_bitset",
    "decode_bitset",
    "decode_deltas_grouped",
    "decode_bitset_grouped",
    "encode_varints_grouped_raw",
    "encode_deltas_grouped_raw",
    "encode_bitsets_grouped_raw",
]

_MAX_GROUPS = 10  # ceil(64 / 7)


def _varint_lengths(vals: np.ndarray) -> np.ndarray:
    """Per-value encoded byte length via 9 vectorized compares — no dense
    (n, 10) group matrix."""
    n = np.ones(len(vals), dtype=np.int64)
    for k in range(1, _MAX_GROUPS):
        thresh = np.uint64(1) << np.uint64(7 * k)
        n += (vals >= thresh).astype(np.int64)
    return n


def _encode_varints_with_lens(vals: np.ndarray):
    """(encoded bytes, per-value byte lengths) in one pass: fill the output
    byte-position by byte-position (iterations = max encoded length, each
    over a shrinking subset) instead of materializing an (n, 10) matrix."""
    blens = _varint_lengths(vals)
    ends = np.cumsum(blens)
    starts = ends - blens
    out = np.empty(int(ends[-1]) if len(ends) else 0, dtype=np.uint8)
    for g in range(int(blens.max()) if len(blens) else 0):
        mask = blens > g
        idx = starts[mask] + g
        b = ((vals[mask] >> np.uint64(7 * g)) & np.uint64(0x7F)).astype(np.uint8)
        cont = (blens[mask] - 1 > g).astype(np.uint8)
        out[idx] = b | (cont << 7)
    return out.tobytes(), blens


def encode_varints(values) -> bytes:
    """LEB128-encode a uint64 array into one byte string (vectorized)."""
    vals = np.asarray(values, dtype=np.uint64)
    if len(vals) == 0:
        return b""
    return _encode_varints_with_lens(vals)[0]


def decode_varints(buf: bytes) -> np.ndarray:
    """Decode a LEB128 byte string into a uint64 array (vectorized)."""
    raw = np.frombuffer(buf, dtype=np.uint8)
    if raw.size == 0:
        return np.empty(0, dtype=np.uint64)
    is_last = (raw & 0x80) == 0
    if not is_last[-1]:
        # truncated/corrupt stream ending mid-value: fail loudly with a
        # codec-level message instead of an IndexError from the vectorized
        # patch below (or a silently dropped tail in the general path)
        raise ValueError(
            f"truncated varint stream: buffer of {raw.size} bytes ends on a "
            "continuation byte")
    cont_idx = np.flatnonzero(~is_last)
    if cont_idx.size == 0:
        # fast path: every value fits one byte (typical for tf streams and
        # dense-term gap streams) — the bytes ARE the values
        return raw.astype(np.uint64)
    if cont_idx.size * 16 < raw.size:
        # sparse-continuation path (hot terms: a handful of multi-byte group
        # heads in a sea of 1-byte gaps): start from the terminal bytes and
        # patch the few multi-byte values scalar — avoids the full-stream
        # cumsum + scattered add.at of the general path
        last_pos = np.flatnonzero(is_last)
        out = raw[is_last].astype(np.uint64)
        splits = np.flatnonzero(np.diff(cont_idx) > 1) + 1
        run_starts = cont_idx[np.concatenate(([0], splits))]
        run_lasts = cont_idx[np.concatenate((splits - 1, [cont_idx.size - 1]))]
        vidx = np.searchsorted(last_pos, run_starts)
        # rebuild the multi-byte values vectorized over byte position: run r
        # spans raw[run_starts[r] : run_lasts[r] + 2] (continuation bytes plus
        # the terminal byte); iterate over the (tiny) max run length instead
        # of a per-run Python loop
        run_len = run_lasts + 2 - run_starts
        vals = np.zeros(len(run_starts), dtype=np.uint64)
        for k in range(int(run_len.max())):
            m = run_len > k
            vals[m] |= ((raw[run_starts[m] + k] & np.uint64(0x7F)).astype(
                np.uint64) << np.uint64(7 * k))
        out[vidx] = vals
        return out
    # value index of every byte = count of terminated values before it
    value_idx = np.concatenate(([0], np.cumsum(is_last)[:-1]))
    # position of the byte within its value
    starts = np.concatenate(([0], np.nonzero(is_last)[0][:-1] + 1))
    pos = np.arange(raw.size) - starts[value_idx]
    contrib = (raw & 0x7F).astype(np.uint64) << (pos.astype(np.uint64) * np.uint64(7))
    nvals = int(is_last.sum())
    out = np.zeros(nvals, dtype=np.uint64)
    np.add.at(out, value_idx, contrib)
    return out


def encode_deltas(doc_ids) -> bytes:
    """Delta-gap encode a strictly increasing uint64 id sequence."""
    ids = np.asarray(doc_ids, dtype=np.uint64)
    if len(ids) == 0:
        return b""
    gaps = np.empty_like(ids)
    gaps[0] = ids[0]
    np.subtract(ids[1:], ids[:-1], out=gaps[1:])
    return encode_varints(gaps)


def decode_deltas(buf: bytes) -> np.ndarray:
    gaps = decode_varints(buf)
    return np.cumsum(gaps, dtype=np.uint64)


def encode_varints_grouped_raw(values: np.ndarray,
                               group_lengths: np.ndarray):
    """Encode a concatenation of groups in ONE vectorized pass.  Returns
    ``(buffer_bytes, byte_bounds)`` where group g's encoding is
    ``buffer[byte_bounds[g]:byte_bounds[g+1]]`` — callers build Arrow
    binary columns zero-copy from these instead of materializing one
    Python bytes object per group."""
    vals = np.asarray(values, dtype=np.uint64)
    glens = np.asarray(group_lengths, dtype=np.int64)
    if len(vals) == 0:
        return b"", np.zeros(len(glens) + 1, dtype=np.int64)
    buf, blens = _encode_varints_with_lens(vals)
    ends = np.cumsum(blens)
    val_ends = np.cumsum(glens)
    bounds = np.concatenate(([0], np.concatenate(([0], ends))[val_ends]))
    return buf, bounds


def encode_varints_grouped(values: np.ndarray, group_lengths: np.ndarray):
    """List-of-bytes convenience wrapper over
    ``encode_varints_grouped_raw`` (equivalent to
    ``[encode_varints(g) for g in split(values, group_lengths)]``)."""
    buf, bounds = encode_varints_grouped_raw(values, group_lengths)
    mv = memoryview(buf)
    return [bytes(mv[s:e]) for s, e in zip(bounds[:-1], bounds[1:])]


def encode_deltas_grouped(doc_ids: np.ndarray, group_lengths: np.ndarray):
    """Per-group delta-gap varint encoding of a concatenated id array (each
    group strictly increasing), vectorized: gaps computed globally, group
    heads reset to their absolute id."""
    ids = np.asarray(doc_ids, dtype=np.uint64)
    glens = np.asarray(group_lengths, dtype=np.int64)
    if len(ids) == 0:
        return [b""] * len(glens)
    gaps = np.empty_like(ids)
    gaps[0] = ids[0]
    np.subtract(ids[1:], ids[:-1], out=gaps[1:])
    starts = np.concatenate(([0], np.cumsum(glens)[:-1]))
    starts = starts[glens > 0]
    gaps[starts] = ids[starts]
    return encode_varints_grouped(gaps, glens)


def encode_deltas_grouped_raw(doc_ids: np.ndarray,
                              group_lengths: np.ndarray):
    """``encode_deltas_grouped`` returning ``(buffer, byte_bounds)`` (see
    ``encode_varints_grouped_raw``)."""
    ids = np.asarray(doc_ids, dtype=np.uint64)
    glens = np.asarray(group_lengths, dtype=np.int64)
    if len(ids) == 0:
        return b"", np.zeros(len(glens) + 1, dtype=np.int64)
    gaps = np.empty_like(ids)
    gaps[0] = ids[0]
    np.subtract(ids[1:], ids[:-1], out=gaps[1:])
    starts = np.concatenate(([0], np.cumsum(glens)[:-1]))
    starts = starts[glens > 0]
    gaps[starts] = ids[starts]
    return encode_varints_grouped_raw(gaps, glens)


def encode_bitsets_grouped_raw(flags: np.ndarray,
                               group_lengths: np.ndarray):
    """Per-group LSB-first bitsets (each padded to a byte boundary) in one
    vectorized pass.  Returns ``(buffer, byte_bounds)``; equivalent to
    ``[encode_bitset(g) for g in split(flags, group_lengths)]``."""
    f = np.asarray(flags, dtype=bool)
    glens = np.asarray(group_lengths, dtype=np.int64)
    nbytes = (glens + 7) // 8
    bounds = np.concatenate(([0], np.cumsum(nbytes)))
    out = np.zeros(int(bounds[-1]), dtype=np.uint8)
    if len(f):
        val_starts = np.cumsum(glens) - glens
        nz = glens > 0
        # bit position of value j of group g = 8*byte_start[g] + (j - vs[g])
        bitpos = (np.repeat(bounds[:-1][nz] * 8, glens[nz])
                  + np.arange(int(glens.sum()), dtype=np.int64)
                  - np.repeat(val_starts[nz], glens[nz]))
        on = bitpos[f]
        # each (byte, bit) is unique, so add == bitwise-or
        np.add.at(out, on >> 3, (1 << (on & 7)).astype(np.uint8))
    return out.tobytes(), bounds


def decode_deltas_grouped(buf: bytes, group_lengths) -> np.ndarray:
    """Decode CONCATENATED per-group delta blobs (as produced by
    ``encode_deltas_grouped`` and joined back-to-back) into one flat array of
    ABSOLUTE ids, in one vectorized pass.  ``group_lengths`` gives the value
    count of each group (a group's head gap is its absolute id)."""
    gaps = decode_varints(buf)
    glens = np.asarray(group_lengths, dtype=np.int64)
    if gaps.size == 0:
        return gaps
    c = np.cumsum(gaps, dtype=np.uint64)
    starts = np.concatenate(([0], np.cumsum(glens)[:-1]))
    nz = glens > 0
    starts_nz = starts[nz]
    base = np.where(starts_nz > 0, c[np.maximum(starts_nz - 1, 0)],
                    np.uint64(0))
    shift = np.repeat(base, glens[nz])
    return c - shift


def decode_bitset_grouped(buf: bytes, group_bit_counts) -> np.ndarray:
    """Decode CONCATENATED per-group LSB-first bitsets (each group padded to
    a byte boundary) into one flat bool array, in one vectorized pass."""
    glens = np.asarray(group_bit_counts, dtype=np.int64)
    total = int(glens.sum())
    if total == 0:
        return np.empty(0, dtype=bool)
    bits = np.unpackbits(np.frombuffer(buf, dtype=np.uint8),
                         bitorder="little")
    nbytes = (glens + 7) // 8
    byte_starts = np.concatenate(([0], np.cumsum(nbytes)[:-1]))
    nz = glens > 0
    # bit index of value j of group g = 8*byte_starts[g] + (j - value_start[g])
    val_starts = np.concatenate(([0], np.cumsum(glens)[:-1]))
    idx = (np.repeat(byte_starts[nz] * 8, glens[nz])
           + np.arange(total, dtype=np.int64)
           - np.repeat(val_starts[nz], glens[nz]))
    # unpackbits yields 0/1 uint8 — reinterpret as bool without a copy
    return bits[idx].view(np.bool_)


def encode_bitset(flags) -> bytes:
    """Pack a boolean array LSB-first into bytes."""
    arr = np.asarray(flags, dtype=bool)
    return np.packbits(arr, bitorder="little").tobytes()


def decode_bitset(buf: bytes, n: int) -> np.ndarray:
    return np.unpackbits(np.frombuffer(buf, dtype=np.uint8), count=n, bitorder="little").astype(bool)
