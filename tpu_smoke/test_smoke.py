"""Real-accelerator smoke tests.

The CPU suite force-flags every TPU-only gate; this suite verifies the
gates and kernels on actual hardware: the Pallas BSR kernel compiles
and is numerically right, the ELL and Ozaki auto-gates engage, the
densify crossover picks the MXU path, and planar complex (the real TPU
complex representation) round-trips.
"""

import numpy as np
import numpy.testing as npt
import pytest
import scipy.sparse as sps

import jax
import jax.numpy as jnp

import sparse_dot_tpu as sdt
from sparse_dot_tpu import formats
from sparse_dot_tpu.config import config
from sparse_dot_tpu.ops import host as hops
from sparse_dot_tpu.ops import _xla


@pytest.fixture(autouse=True)
def _reset_flags():
    prev_pallas = config.pallas_bsr_enabled
    prev_planar = config.force_planar_complex
    yield
    config.pallas_bsr_enabled = prev_pallas
    config.force_planar_complex = prev_planar


def test_pallas_bsr_kernel_runs():
    """The hand-written Pallas kernel must compile and match the oracle
    on hardware — the CPU suite can only run it in interpret mode."""
    config.pallas_bsr_enabled = True
    A = sps.random(
        1024, 1024, density=0.05, format="csr", dtype=np.float32,
        random_state=0,
    ).tobsr(blocksize=(128, 128))
    b = np.random.default_rng(1).random((1024, 130)).astype(np.float32)
    Ad = formats.to_device(A)
    got = np.asarray(hops._real_spmm(Ad, Ad.data, jnp.asarray(b), False))
    assert config.pallas_bsr_enabled, (
        "Pallas BSR kernel failed to compile on this backend "
        "(fell back to batched matmul)"
    )
    npt.assert_allclose(got, A.toarray() @ b, rtol=2e-4, atol=2e-4)


def test_ell_auto_gate_engages():
    """Low-density CSR f64 with moderate n must choose the ELL path on
    an accelerator (no force flag)."""
    A = sps.random(
        20000, 20000, density=0.005, format="csr", dtype=np.float64,
        random_state=2,
    )
    Ad = formats.to_device(A)
    assert hops._prefer_ell(
        Ad, Ad.data, 20000, 20000, 128, A.nnz, False
    )
    b = np.random.default_rng(3).random((20000, 16))
    got = sdt.dot_product(A, b)
    npt.assert_allclose(got, A @ b, rtol=1e-9, atol=1e-9)


def test_ozaki_auto_gate_engages():
    """f64 GEMM big enough to amortize slice extraction must take the
    Ozaki path on an accelerator and stay f64-accurate."""
    from sparse_dot_tpu.ops import ozaki

    assert ozaki.enabled(np.float64, 512, 512 * 512 * 512)
    rng = np.random.default_rng(4)
    a = rng.random((512, 512))
    b = rng.random((512, 512))
    got = sdt.dot_product(a, b)
    npt.assert_allclose(got, a @ b, rtol=1e-12, atol=1e-10)


def test_densify_crossover_accelerator_branch():
    """At high density the measured-cost model must pick the MXU
    densify path on an accelerator."""
    assert _xla._prefer_densify(2000, 2000, 128, 2000 * 2000 // 5,
                                np.float32)
    A = sps.random(2000, 2000, density=0.2, format="csr",
                   dtype=np.float32, random_state=5)
    b = np.random.default_rng(6).random((2000, 64)).astype(np.float32)
    got = sdt.dot_product(A, b)
    npt.assert_allclose(got, A @ b, rtol=2e-4, atol=2e-4)


def test_planar_complex_on_hardware():
    A = sps.random(300, 400, density=0.05, format="csr",
                   dtype=np.float64, random_state=7)
    Ac = (A + 0.5j * A).astype(np.complex128).tocsr()
    bc = (
        np.random.default_rng(8).random((400, 8))
        + 1j * np.random.default_rng(9).random((400, 8))
    )
    got = sdt.dot_product(Ac, bc)
    npt.assert_allclose(got, Ac @ bc, rtol=1e-9, atol=1e-9)


def test_pardiso_mixed_precision_refinement():
    """f64 direct solve on backends without f64 LU: f32 factor + f64
    refinement must reach ~f64 accuracy."""
    from sparse_dot_tpu.solvers import pardiso, pardisoinit

    n = 120
    M = sps.random(n, n, density=0.2, random_state=10, format="csr")
    A = (M + n * sps.identity(n)).tocsr()
    b = np.random.default_rng(11).random(n)
    pt, iparm = pardisoinit(11)
    X, _, _, err = pardiso(A, b, pt, 11, iparm, 13)
    assert err == 0
    npt.assert_allclose(X, np.linalg.solve(A.toarray(), b),
                        rtol=1e-9, atol=1e-9)


def test_esc_spgemm_on_hardware():
    config_prev = config.spgemm_exact_pattern
    config.spgemm_exact_pattern = True
    try:
        A = sps.random(800, 700, density=0.02, format="csr",
                       dtype=np.float64, random_state=12)
        B = sps.random(700, 900, density=0.02, format="csr",
                       dtype=np.float64, random_state=13)
        C = sdt.dot_product(A, B)
        O = A @ B
        O.sort_indices()
        assert C.nnz == O.nnz
        npt.assert_allclose(C.data, O.data, rtol=1e-12, atol=1e-13)
    finally:
        config.spgemm_exact_pattern = config_prev


def test_structural_pattern_on_hardware():
    """The default sparse-output path keeps exactly-cancelled entries
    as explicit zeros (pattern matmul) on the real backend — both the
    host-extract small path and the fused device-resident path."""
    A = sps.csr_matrix(np.array([[1.0, -1.0], [2.0, 0.0]]))
    B = sps.csr_matrix(np.array([[1.0, 3.0], [1.0, 0.0]]))
    C = sdt.dot_product(A, B)
    assert C.nnz == 4 and C[0, 0] == 0.0
    npt.assert_allclose(C.toarray(), A.toarray() @ B.toarray())

    Ad, Bd = formats.to_device(A), formats.to_device(B)
    Cd = hops.spgemm_device(Ad, Bd, out_dtype=np.float64)
    assert int(Cd.indptr[-1]) == 4
    # steady state: fused single-dispatch extraction with cached size
    Cd2 = hops.spgemm_device(Ad, Bd, out_dtype=np.float64,
                             sync_check=False)
    hops.validate_speculation()
    assert int(Cd2.indptr[-1]) == 4


def test_structural_matches_scipy_on_hardware():
    """Medium product through the fused structural program vs the
    scipy oracle (pattern AND values) on the real backend."""
    A = sps.random(300, 400, density=0.05, format="csr",
                   dtype=np.float64, random_state=11)
    B = sps.random(400, 350, density=0.05, format="csr",
                   dtype=np.float64, random_state=12)
    C = sdt.dot_product(A, B)
    oracle = A @ B
    oracle.sort_indices()
    assert C.nnz == oracle.nnz
    npt.assert_array_equal(C.indptr, oracle.indptr)
    npt.assert_array_equal(C.indices, oracle.indices)
    npt.assert_allclose(C.data, oracle.data, atol=1e-10)


def test_fgmres_on_hardware():
    """First-party FGMRES device loop converges on the real backend."""
    from sparse_dot_tpu.solvers import fgmres

    n = 48
    rng = np.random.default_rng(21)
    A = (sps.random(n, n, density=0.25, random_state=22, format="csr")
         + n * sps.identity(n)).tocsr()
    b = rng.random(n)
    x, code = fgmres(A, b, tol=1e-12)
    assert code == 0
    npt.assert_allclose(x, np.linalg.solve(A.toarray(), b), atol=1e-8)
