"""Byte fieldnorm quantization (tantivy-style; SURVEY.md §2.4).

tantivy stores one byte per document per field and decodes doc length through
a 256-entry table that is exact for small lengths and geometrically coarser
beyond (fieldnorms declared per field in
/root/reference/tantivy-cli/index-init/meta.json:15,28; consumed by the BM25
scorer).  The engine and the brute-force oracle share THIS table, so ranking
conformance is defined against it bit-for-bit.

Construction (deterministic, documented here and pinned by
tests/test_fieldnorm.py):

- ids 0..=40 decode to the exact lengths 0..=40;
- beyond 40 each successive entry is the previous multiplied by 9/8 and
  rounded down, bumped by at least 1 so the table stays strictly increasing.

``fieldnorm_to_id(length)`` floors: it returns the largest id whose decoded
value is <= length (lengths below the first entry clamp to id 0).  This is the
same floor-search contract as tantivy's ``fieldnorm_to_id`` /
``id_to_fieldnorm`` pair.
"""

from __future__ import annotations

import numpy as np

__all__ = ["FIELD_NORMS_TABLE", "fieldnorm_to_id", "id_to_fieldnorm"]


def _build_table() -> np.ndarray:
    vals = list(range(41))
    while len(vals) < 256:
        nxt = max(vals[-1] + 1, (vals[-1] * 9) // 8)
        vals.append(nxt)
    return np.asarray(vals, dtype=np.uint64)


FIELD_NORMS_TABLE: np.ndarray = _build_table()


def fieldnorm_to_id(lengths) -> np.ndarray:
    """Vectorized floor-quantization: length(s) -> uint8 norm id(s)."""
    arr = np.asarray(lengths, dtype=np.uint64)
    ids = np.searchsorted(FIELD_NORMS_TABLE, arr, side="right") - 1
    return np.clip(ids, 0, 255).astype(np.uint8)


def id_to_fieldnorm(ids) -> np.ndarray:
    """Vectorized decode: uint8 norm id(s) -> quantized length(s)."""
    return FIELD_NORMS_TABLE[np.asarray(ids, dtype=np.uint8)]
