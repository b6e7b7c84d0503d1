"""Behavioral-contract layer: dtype policy, rejection rules, empty
short-circuits.

Same contract as the reference's policy layer
(``/root/reference/sparse_dot_mkl/_mkl_interface/_common.py:773-866``,
``:1003-1024``) — float32/float64/complex64/complex128 only, equal
dtypes pass by reference, cast=True upcasts along the documented table,
invalid inputs raise — expressed as a parametrized table rather than
one class per dtype pair.
"""

import numpy as np
import numpy.testing as npt
import pytest
import scipy.sparse as sps

from sparse_dot_tpu import dot_product, to_device
from sparse_dot_tpu.policy import (
    empty_result_dtype,
    output_dtype,
    type_check,
)

from .common import MATRIX_1, MATRIX_2, MATRIX_1_EMPTY, VECTOR


# ---------------------------------------------------------------------------
# dtype policy table
# ---------------------------------------------------------------------------

# (a_dtype, b_dtype, expected result dtype with cast=True,
#  a copied?, b copied?)
CAST_TABLE = [
    (np.float32, np.float32, np.float32, False, False),
    (np.float64, np.float64, np.float64, False, False),
    (np.complex64, np.complex64, np.complex64, False, False),
    (np.complex128, np.complex128, np.complex128, False, False),
    # mixed reals -> float64
    (np.float32, np.float64, np.float64, True, False),
    (np.float64, np.float32, np.float64, False, True),
    # mixed complex -> complex128
    (np.complex64, np.complex128, np.complex128, True, False),
    # real + complex -> the complex operand's dtype
    (np.float32, np.complex128, np.complex128, True, False),
    (np.float64, np.complex64, np.complex64, True, False),
    (np.complex64, np.float64, np.complex64, False, True),
    # non-float dtypes cast to float64 even when equal
    (np.int32, np.int32, np.float64, True, True),
    (np.int32, np.int64, np.float64, True, True),
    (np.int64, np.float32, np.float64, True, True),
    # unsupported float widths normalize to the double variants
    (np.clongdouble, np.clongdouble, np.complex128, True, True),
]


@pytest.mark.parametrize(
    "a_dt,b_dt,want,a_copied,b_copied", CAST_TABLE,
    ids=lambda v: getattr(v, "__name__", str(v)),
)
def test_cast_table(a_dt, b_dt, want, a_copied, b_copied):
    a = MATRIX_1.astype(a_dt)
    b = MATRIX_2.astype(b_dt)
    out_a, out_b = type_check(a, b, cast=True)
    assert out_a.dtype == np.dtype(want)
    assert out_b.dtype == np.dtype(want)
    # no-copy paths really return the same object (the reference's
    # id()-identity contract)
    assert (out_a is not a) == a_copied
    assert (out_b is not b) == b_copied


@pytest.mark.parametrize(
    "a_dt,b_dt",
    [p[:2] for p in CAST_TABLE if p[3] or p[4]],
    ids=lambda v: getattr(v, "__name__", str(v)),
)
def test_mismatch_without_cast_raises(a_dt, b_dt):
    with pytest.raises(ValueError):
        type_check(MATRIX_1.astype(a_dt), MATRIX_2.astype(b_dt),
                   cast=False)


def test_single_operand_policy():
    a64 = MATRIX_1.astype(np.float64)
    assert type_check(a64) is a64
    assert type_check(MATRIX_1.astype(np.int32), cast=True).dtype == (
        np.float64
    )
    with pytest.raises(ValueError):
        type_check(MATRIX_1.astype(np.int32))
    with pytest.raises(ValueError):
        type_check(MATRIX_1.astype(np.complex128), allow_complex=False)


def test_output_dtype_rule():
    assert output_dtype(
        MATRIX_1.astype(np.float32), MATRIX_2.astype(np.float64)
    ) == np.float64
    assert output_dtype(
        MATRIX_1.astype(np.float32), MATRIX_2.astype(np.complex64)
    ) == np.complex64
    assert empty_result_dtype(
        MATRIX_1.astype(np.float32), MATRIX_2.astype(np.float32)
    ) == np.float32
    assert empty_result_dtype(
        MATRIX_1.astype(np.float32), MATRIX_2.astype(np.float64)
    ) == np.float64


# ---------------------------------------------------------------------------
# rejection rules
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "build",
    [
        lambda: MATRIX_1.tocoo(),                      # COO rejected
        lambda: MATRIX_1.astype(np.int64),              # int data
        lambda: MATRIX_1.tobsr(blocksize=(10, 5)),      # non-square block
    ],
    ids=["coo", "int-data", "rect-bsr-block"],
)
def test_to_device_rejects(build):
    with pytest.raises(ValueError):
        to_device(build())


def test_3d_inputs_rejected():
    d1 = MATRIX_1.toarray().reshape(200, 300, 1)
    d2 = MATRIX_2.toarray().reshape(300, 100, 1)
    for a, b in [(d1, d2), (d1, MATRIX_2), (MATRIX_1, d2)]:
        with pytest.raises(ValueError):
            dot_product(a, b)


@pytest.mark.parametrize(
    "a,b",
    [
        (VECTOR.reshape(-1, 1), MATRIX_2),          # inner mismatch
        (MATRIX_1, VECTOR.reshape(1, -1)),          # inner mismatch
        (VECTOR.reshape(-1, 1), VECTOR.reshape(-1, 1)),
        (MATRIX_1.transpose(), MATRIX_2),            # 300x200 * 300x100
        (VECTOR[100:], VECTOR),                      # misaligned vectors
    ],
    ids=["colvec-mat", "mat-rowvec", "colvec-colvec", "matT-mat",
         "short-vec"],
)
def test_misaligned_shapes_raise(a, b):
    with pytest.raises(ValueError):
        dot_product(a, b)


# ---------------------------------------------------------------------------
# empty-output short-circuits
# ---------------------------------------------------------------------------


def test_empty_sparse_sparse():
    got = dot_product(MATRIX_1_EMPTY, MATRIX_2)
    assert got.shape == (200, 100)
    assert got.nnz == 0
    assert sps.issparse(got)


def test_empty_sparse_dense_and_vector():
    dense = MATRIX_2.toarray()
    got = dot_product(MATRIX_1_EMPTY, dense)
    npt.assert_array_equal(got, np.zeros((200, 100)))
    gotv = dot_product(MATRIX_1_EMPTY, dense[:, 0])
    npt.assert_array_equal(gotv, np.zeros(200))


def test_empty_zero_dim_dense():
    zero_rows = np.zeros((0, 300))
    got = dot_product(zero_rows, MATRIX_2.toarray())
    assert got.shape == (0, 100)


def test_empty_mixed_dtype_rule():
    # float64 unless BOTH operands are float32.
    got32 = dot_product(
        MATRIX_1_EMPTY.astype(np.float32),
        MATRIX_2.astype(np.float32).toarray(),
    )
    assert got32.dtype == np.float32
    got64 = dot_product(
        MATRIX_1_EMPTY.astype(np.float32), MATRIX_2.toarray()
    )
    assert got64.dtype == np.float64


# Review r5 finding: device containers are first-class cast=True
# operands — policy._cast_to calls .astype, which containers must
# implement (it used to raise AttributeError).


def test_mixed_dtype_device_pair_cast():
    from sparse_dot_tpu import formats

    A = sps.random(30, 40, density=0.2, format="csr",
                   dtype=np.float32, random_state=1)
    B = sps.random(40, 20, density=0.2, format="csr",
                   dtype=np.float64, random_state=2)
    C = dot_product(
        formats.to_device(A), formats.to_device(B), cast=True
    )
    oracle = (A.astype(np.float64) @ B).toarray()
    np.testing.assert_allclose(C.toarray(), oracle, atol=1e-6)


def test_container_astype_identity_and_planar():
    from sparse_dot_tpu import formats
    from sparse_dot_tpu.config import config

    A = formats.to_device(
        sps.random(10, 12, density=0.3, format="csr",
                   dtype=np.float64, random_state=3)
    )
    assert A.astype(np.float64) is A  # identity semantics
    prev = config.force_planar_complex
    config.force_planar_complex = True
    try:
        Ac = A.astype(np.complex128)
        assert Ac.planar and Ac.dtype == np.complex128
        with pytest.raises(ValueError):
            Ac.astype(np.float64)  # complex -> real never allowed
    finally:
        config.force_planar_complex = prev
