import numpy as np

from prosearch_ray.index.fieldnorm import (
    FIELD_NORMS_TABLE,
    fieldnorm_to_id,
    id_to_fieldnorm,
)


def test_table_shape_and_monotone():
    assert len(FIELD_NORMS_TABLE) == 256
    assert (np.diff(FIELD_NORMS_TABLE.astype(np.int64)) > 0).all()


def test_exact_below_41():
    assert (FIELD_NORMS_TABLE[:41] == np.arange(41)).all()
    assert (id_to_fieldnorm(fieldnorm_to_id(np.arange(41))) == np.arange(41)).all()


def test_floor_contract():
    lens = np.array([0, 1, 40, 41, 44, 45, 46, 10_000, 10**9])
    ids = fieldnorm_to_id(lens)
    decoded = id_to_fieldnorm(ids)
    assert (decoded <= lens).all()
    # next table entry is strictly greater than the length (floor semantics)
    for l, i in zip(lens, ids):
        if i < 255:
            assert FIELD_NORMS_TABLE[i + 1] > l


def test_geometric_growth():
    tail = FIELD_NORMS_TABLE[41:].astype(np.float64)
    ratios = tail[1:] / tail[:-1]
    assert ratios.max() <= 9 / 8 + 1e-9
