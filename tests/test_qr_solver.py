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


def test_large_m_routes_to_cgls(monkeypatch):
    """Above the densify budget the solver switches to the compiled
    CGLS loop — same answers, no dense A ever built."""
    import sparse_dot_tpu.solvers.qr as qr_mod

    rng = np.random.default_rng(2)
    A = sps.random(3000, 60, density=0.05, format="csr",
                   dtype=np.float64, random_state=2)
    # make sure every column is touched so lstsq is unique
    A = (A + sps.random(3000, 60, density=0.01, format="csr",
                        random_state=3)).tocsr()
    b = rng.random((3000, 2))
    expect = np.linalg.lstsq(A.toarray(), b, rcond=None)[0]

    monkeypatch.setattr(qr_mod, "_QR_DENSIFY_BUDGET", 1)  # force CGLS
    got = sparse_qr_solve(A, b)
    npt.assert_array_almost_equal(got, expect)


def test_cgls_ill_conditioned(monkeypatch):
    """Jacobi-preconditioned CGLS on a cond >= 1e6 system (column
    scales spanning six orders of magnitude), 100k rows.  MKL's
    multifrontal QR is a direct method and shrugs at conditioning
    (``_sparse_qr_solver.py:61-101``); the iterative large-m route must
    match that robustness — unpreconditioned CGLS stalls here, the
    column-equilibrated loop converges in O(100) iterations."""
    import sparse_dot_tpu.solvers.qr as qr_mod

    m, k = 100_000, 80
    rng = np.random.default_rng(7)
    A0 = sps.random(m, k, density=5e-4, format="csr",
                    dtype=np.float64, random_state=7)
    tail = sps.csr_matrix(
        (np.ones(k), (np.arange(m - k, m), np.arange(k))), shape=(m, k)
    )
    A0 = (A0 + tail).tocsr()
    # Column scaling spanning 1e6 drives cond(A) past 1e6.
    scales = np.logspace(0, -6, k)
    A = (A0 @ sps.diags(scales)).tocsr()
    x_true = rng.standard_normal((k,))
    b = A @ x_true  # consistent system: lstsq solution IS x_true

    monkeypatch.setattr(qr_mod, "_QR_DENSIFY_BUDGET", 1)  # force CGLS
    got = sparse_qr_solve(A, b)
    rel_err = np.linalg.norm(got - x_true) / np.linalg.norm(x_true)
    assert rel_err < 1e-8, f"ill-conditioned solve inaccurate: {rel_err}"
    iters = qr_mod._last_cgls_iters
    assert iters is not None and iters <= 500, (
        f"preconditioned CGLS iteration growth not bounded: {iters}"
    )


def test_million_row_least_squares():
    """BASELINE config 5 scale on one chip: 1M rows, sparse A, CGLS.
    The dense lstsq oracle is unaffordable at this size, so optimality
    is checked via the normal equations (A^T (A x - b) ~ 0)."""
    m, k = 1_000_000, 200
    rng = np.random.default_rng(4)
    A = sps.random(m, k, density=2e-5, format="csr",
                   dtype=np.float64, random_state=4)
    # guarantee full column rank with a tail identity block
    tail = sps.csr_matrix(
        (np.ones(k), (np.arange(m - k, m), np.arange(k))), shape=(m, k)
    )
    A = (A + tail).tocsr()
    b = rng.random(m)
    x = sparse_qr_solve(A, b)
    grad = np.abs(A.T @ (A @ x - b)).max()
    assert grad < 1e-6, f"normal-equation residual too large: {grad}"


def test_sharded_qr_route():
    """A ShardedCSR operand routes to the mesh-distributed CGLS."""
    import jax

    from sparse_dot_tpu.parallel import make_mesh, shard_csr_rows

    n_dev = jax.device_count()
    mesh = make_mesh((n_dev, 1), ("rows", "cols"))
    A = MATRIX_1[:, :50].tocsr()
    b = np.arange(A.shape[0], dtype=np.float64)
    A_sh = shard_csr_rows(A, n_dev, mesh)
    got = sparse_qr_solve(A_sh, b)
    expect = np.linalg.lstsq(A.toarray(), b, rcond=None)[0]
    npt.assert_array_almost_equal(got, expect)


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
