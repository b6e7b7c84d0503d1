"""Sparse QR least-squares solver.

Contract of ``sparse_qr_solve_mkl``
(``/root/reference/sparse_dot_mkl/_sparse_qr_solver.py:110-163``): CSR
(or CSC with cast=True) A, dense B, float32/float64 only, 1-D B gives a
1-D X.  Oracle: ``np.linalg.lstsq``.  Expressed as parametrized cases
over dtype/cast/layout plus overdetermined and wide systems.
"""

import numpy as np
import numpy.testing as npt
import pytest
import scipy.sparse as sps

from sparse_dot_tpu import sparse_qr_solve

from .common import MATRIX_1, SEED


@pytest.fixture(scope="module")
def diag_system():
    """A diagonal system solves exactly, so lstsq is a tight oracle."""
    d = MATRIX_1.data[:100].copy()
    A = sps.diags(d, format="csr")
    b = d.reshape(-1, 1).copy()
    x = np.linalg.lstsq(A.toarray(), b, rcond=None)[0]
    return A, b, x


CASES = [
    # (A dtype, B dtype, cast)
    (np.float64, np.float64, False),
    (np.float32, np.float32, False),
    (np.float64, np.float32, True),
    (np.float32, np.float64, True),
]


@pytest.mark.parametrize("a_dt,b_dt,cast", CASES,
                         ids=["f64", "f32", "castB", "castA"])
def test_diagonal_system(diag_system, a_dt, b_dt, cast):
    A, b, x = diag_system
    got = sparse_qr_solve(A.astype(a_dt), b.astype(b_dt), cast=cast)
    npt.assert_array_almost_equal(got, x)
    if a_dt == b_dt:
        assert got.dtype == a_dt


@pytest.mark.parametrize("order", ["C", "F"])
def test_csc_with_cast(diag_system, order):
    A, b, x = diag_system
    got = sparse_qr_solve(
        A.tocsc(), np.asarray(b, order=order), cast=True
    )
    npt.assert_array_almost_equal(got, x)


def test_1d_rhs_gives_1d_solution(diag_system):
    A, b, x = diag_system
    got = sparse_qr_solve(A, b.ravel())
    assert got.ndim == 1
    npt.assert_array_almost_equal(got, x.ravel())


def test_overdetermined_dense_rhs():
    A = MATRIX_1[:, :50].tocsr()
    b = np.arange(A.shape[0], dtype=np.float64)
    expect = np.linalg.lstsq(A.toarray(), b, rcond=None)[0]
    npt.assert_array_almost_equal(sparse_qr_solve(A, b), expect)


def test_multiple_rhs():
    rng = np.random.default_rng(SEED)
    A = MATRIX_1[:, :40].tocsr()
    B = rng.random((A.shape[0], 3))
    expect = np.linalg.lstsq(A.toarray(), B, rcond=None)[0]
    npt.assert_array_almost_equal(sparse_qr_solve(A, B), expect)


@pytest.mark.parametrize(
    "mutate",
    [
        lambda A, b: (A, b.T),                        # shape mismatch
        lambda A, b: (A.tocsc(), b),                   # CSC without cast
        lambda A, b: (A.tocoo(), b),                   # COO never allowed
        lambda A, b: (A.astype(np.cdouble), b),        # complex rejected
        lambda A, b: (A.astype(np.csingle), b),
    ],
    ids=["bad-shape", "csc-no-cast", "coo", "cdouble", "csingle"],
)
def test_guards(diag_system, mutate):
    A, b, _ = diag_system
    bad_a, bad_b = mutate(A, b)
    with pytest.raises(ValueError):
        sparse_qr_solve(bad_a, bad_b, cast=bad_a.format == "coo")
