"""Ozaki-scheme f64 matmul: accuracy of the bf16 slice decomposition
and integration through the dispatch layer.

The reference's f64 contract is decimal=6 against the scipy/numpy
oracle (``/root/reference/tests/test_mkl.py:53-67``); the Ozaki path
targets ~2^-49 relative to the row/column scale — these tests assert
several orders of magnitude tighter than the suite-wide tolerance, on
adversarial magnitude ranges.
"""

import unittest

import numpy as np
import numpy.testing as npt
import scipy.sparse as sps

import jax.numpy as jnp

from sparse_dot_tpu import dot_product, gram_matrix
from sparse_dot_tpu.config import config
from sparse_dot_tpu.ops import ozaki


class _ForceOzaki(unittest.TestCase):
    def setUp(self):
        self._saved = config.ozaki
        config.ozaki = "always"

    def tearDown(self):
        config.ozaki = self._saved


class TestOzakiCore(_ForceOzaki):
    def _scaled_err(self, C, ref, scale):
        return np.max(np.abs(C - ref) / np.maximum(scale, 1e-300))

    def test_plan(self):
        t, D, dj = ozaki.plan(10000)
        self.assertEqual(t, 5)
        self.assertGreaterEqual(D * t, 50)
        self.assertLess(dj, D)
        # exactness budget: K * 2^(2t) <= 2^24
        self.assertLessEqual(2 ** np.ceil(np.log2(10000)) * 4 ** t, 2 ** 24)
        self.assertFalse(ozaki.supported(1 << 23))
        self.assertTrue(ozaki.supported(1 << 20))

    def test_matmul_accuracy_wide_dynamic_range(self):
        rng = np.random.default_rng(7)
        m, k, n = 97, 4999, 61
        A = rng.standard_normal((m, k)) * np.exp2(
            rng.uniform(-40, 40, (m, 1))
        )
        B = rng.standard_normal((k, n)) * np.exp2(
            rng.uniform(-35, 35, (1, n))
        )
        C = np.asarray(ozaki.matmul_f64(jnp.asarray(A), jnp.asarray(B)))
        err = self._scaled_err(C, A @ B, np.abs(A) @ np.abs(B))
        self.assertLess(err, 1e-13)

    def test_matmul_transposed_contractions(self):
        rng = np.random.default_rng(11)
        m, k, n = 33, 1000, 17
        A = rng.standard_normal((m, k))
        B = rng.standard_normal((k, n))
        ref = A @ B
        scale = np.abs(A) @ np.abs(B)
        Ct = np.asarray(
            ozaki.matmul_f64(
                jnp.asarray(np.ascontiguousarray(A.T)), jnp.asarray(B),
                a_contract=0,
            )
        )
        self.assertLess(self._scaled_err(Ct, ref, scale), 1e-13)
        Cb = np.asarray(
            ozaki.matmul_f64(
                jnp.asarray(A), jnp.asarray(np.ascontiguousarray(B.T)),
                b_contract=1,
            )
        )
        self.assertLess(self._scaled_err(Cb, ref, scale), 1e-13)

    def test_syrk_accuracy(self):
        rng = np.random.default_rng(13)
        A = rng.standard_normal((50, 2000)) * np.exp2(
            rng.uniform(-20, 20, (50, 1))
        )
        S = np.asarray(ozaki.syrk_f64(jnp.asarray(A)))
        err = self._scaled_err(S, A @ A.T, np.abs(A) @ np.abs(A.T))
        self.assertLess(err, 1e-13)

    def test_exact_cancellation(self):
        A = np.zeros((3, 8))
        A[0, :4] = [1.0, -1.0, 1e-8, -1e-8]
        A[1, :2] = [3.5, -3.5]
        B = np.ones((8, 5))
        C = np.asarray(ozaki.matmul_f64(jnp.asarray(A), jnp.asarray(B)))
        np.testing.assert_array_equal(C, np.zeros((3, 5)))

    def test_zero_rows_and_columns(self):
        rng = np.random.default_rng(17)
        A = rng.standard_normal((10, 300))
        A[3] = 0.0
        B = rng.standard_normal((300, 7))
        B[:, 2] = 0.0
        C = np.asarray(ozaki.matmul_f64(jnp.asarray(A), jnp.asarray(B)))
        np.testing.assert_allclose(C, A @ B, atol=1e-11)
        self.assertTrue(np.all(C[3] == 0))
        self.assertTrue(np.all(C[:, 2] == 0))


class TestOzakiDispatch(_ForceOzaki):
    """Integration: the f64 sparse paths through ``dot_product`` /
    ``gram_matrix`` with the Ozaki matmul forced on."""

    def setUp(self):
        super().setUp()
        rng = np.random.default_rng(86)
        self.X = sps.random(
            200, 300, density=0.2, format="csr", dtype=np.float64,
            random_state=86,
        )
        self.B = rng.standard_normal((300, 40))

    def test_spmm_csr(self):
        res = dot_product(self.X, self.B)
        np.testing.assert_allclose(res, self.X @ self.B, atol=1e-10)

    def test_spmm_csc(self):
        res = dot_product(self.X.tocsc(), self.B)
        np.testing.assert_allclose(res, self.X @ self.B, atol=1e-10)

    def test_spgemm_sparse_out(self):
        Y = sps.random(
            300, 150, density=0.2, format="csr", dtype=np.float64,
            random_state=87,
        )
        res = dot_product(self.X, Y)
        np.testing.assert_allclose(
            res.toarray(), (self.X @ Y).toarray(), atol=1e-10
        )

    def test_spgemm_dense_out(self):
        Y = sps.random(
            300, 150, density=0.2, format="csr", dtype=np.float64,
            random_state=88,
        )
        res = dot_product(self.X, Y, dense=True)
        np.testing.assert_allclose(res, (self.X @ Y).toarray(), atol=1e-10)

    def test_gram(self):
        res = gram_matrix(self.X, dense=True)
        ref = np.triu((self.X.T @ self.X).toarray())
        np.testing.assert_allclose(res, ref, atol=1e-10)

    def test_gram_transpose(self):
        res = gram_matrix(self.X, dense=True, transpose=True)
        ref = np.triu((self.X @ self.X.T).toarray())
        np.testing.assert_allclose(res, ref, atol=1e-10)

    def test_dense_dense(self):
        A = np.random.default_rng(5).standard_normal((64, 512))
        res = dot_product(A, self.B[:512] if len(self.B) >= 512 else A.T)
        # shape guard: build a valid pair explicitly
        C = np.random.default_rng(6).standard_normal((512, 32))
        res = dot_product(A, C)
        np.testing.assert_allclose(res, A @ C, atol=1e-10)




class TestPlanarSliceCacheRoles(unittest.TestCase):
    """Regression for the round-4 role-axis bug: the planar slice
    cache must extract RHS slices with the RHS contraction axis — a
    complex CSR x CSR product (both row-major) hits the mismatched
    configuration when Ozaki is on."""

    def test_complex_csr_csr_product(self):
        config.ozaki = "1"
        try:
            A = sps.random(60, 80, density=0.1, format="csr",
                           dtype=np.float64, random_state=41)
            A = (A + 0.5j * A).astype(np.complex128).tocsr()
            B = sps.random(80, 50, density=0.1, format="csr",
                           dtype=np.float64, random_state=42)
            B = (B - 0.25j * B).astype(np.complex128).tocsr()
            for _ in range(2):  # second call hits the caches
                C = dot_product(A, B)
                np.testing.assert_allclose(
                    C.toarray(), (A @ B).toarray(), atol=1e-9
                )
            # CSC operand flips the contraction axis of each role
            C2 = dot_product(A.tocsc(), B.tocsc())
            np.testing.assert_allclose(
                C2.toarray(), (A @ B).toarray(), atol=1e-9
            )
        finally:
            config.ozaki = "auto"


if __name__ == "__main__":
    unittest.main()


class TestOzakiRangeEdges(unittest.TestCase):
    """Review r5 findings: the slice extraction's combined scale factor
    overflowed/flushed f32 for |row max| outside ~[1e-38, 1e38], and
    the exponent rescale overflowed at exponent sums >= 255 — all
    reachable inside the library's 3e38 hi|lo operand gate."""

    def _matmul(self, a, b):
        from sparse_dot_tpu.ops import ozaki

        ah, al = ozaki.hilo(jnp.asarray(a))
        bh, bl = ozaki.hilo(jnp.asarray(b))
        return np.asarray(ozaki.matmul_hilo(ah, al, bh, bl))

    def test_tiny_operands_in_window(self):
        # Smallest scale inside the library's hi|lo window (the
        # 4e-31 lo-limb floor): full Ozaki accuracy applies.
        rng = np.random.default_rng(3)
        a = rng.standard_normal((16, 64)) * 1e-28
        b = rng.standard_normal((64, 8)) * 1e-28
        got = self._matmul(a, b)
        self.assertTrue(np.isfinite(got).all())
        npt.assert_allclose(got, a @ b, rtol=1e-8)

    def test_below_floor_stays_finite(self):
        # Below the floor the lo limb is subnormal and accuracy
        # degrades (which is why the library's gate routes such
        # operands elsewhere) — but the scale factor must no longer
        # overflow to inf (the pre-fix behavior).
        rng = np.random.default_rng(4)
        a = rng.standard_normal((16, 64)) * 1e-36
        b = rng.standard_normal((64, 8)) * 1e-36
        got = self._matmul(a, b)
        self.assertTrue(np.isfinite(got).all())
        npt.assert_allclose(got, a @ b, rtol=0.5)

    def test_huge_operands_exponent_sum_256(self):
        # uniform magnitudes pin max|v| at exactly 1e38 (a randn tail
        # could cross f32 max and corrupt the hi split by design)
        rng = np.random.default_rng(5)
        a = rng.uniform(0.5, 1.0, (16, 64)) * np.where(
            rng.random((16, 64)) < 0.5, -1e38, 1e38)
        b = rng.uniform(0.5, 1.0, (64, 8)) * np.where(
            rng.random((64, 8)) < 0.5, -1e38, 1e38)
        got = self._matmul(a, b)
        self.assertTrue(np.isfinite(got).all())
        npt.assert_allclose(got, a @ b, rtol=1e-8)

    def test_mixed_extreme_scales(self):
        rng = np.random.default_rng(7)
        a = rng.standard_normal((16, 64)) * 1e37
        b = rng.standard_normal((64, 8)) * 1e-28
        got = self._matmul(a, b)
        self.assertTrue(np.isfinite(got).all())
        npt.assert_allclose(got, a @ b, rtol=1e-8)

    def test_unsupported_contraction_raises_clearly(self):
        from sparse_dot_tpu.ops import ozaki

        with self.assertRaises(ValueError):
            a = jnp.ones((2, 1 << 23), jnp.float32)
            ozaki.matmul_hilo(a, a, a.T, a.T)


class TestDenseHiloGate(_ForceOzaki):
    """Dense GEMM/SYRK must range-gate the Ozaki route like every
    sparse hi|lo transport (review r5: host.gemm and the dense gram
    had no gate, silently degrading legal f64 magnitudes outside the
    f32 window)."""

    def test_gemm_below_window_exact(self):
        from sparse_dot_tpu import dot_product_mkl

        rng = np.random.default_rng(11)
        a = rng.standard_normal((32, 48)) * 1e-36
        b = rng.standard_normal((48, 16)) * 1e-36
        got = dot_product_mkl(a, b)
        npt.assert_allclose(got, a @ b, rtol=1e-12)

    def test_gemm_above_window_exact(self):
        from sparse_dot_tpu import dot_product_mkl

        rng = np.random.default_rng(12)
        a = rng.standard_normal((32, 48)) * 1e60
        b = rng.standard_normal((48, 16)) * 1e60
        got = dot_product_mkl(a, b)
        npt.assert_allclose(got, a @ b, rtol=1e-12)

    def test_dense_gram_below_window_exact(self):
        from sparse_dot_tpu import gram_matrix_mkl

        rng = np.random.default_rng(13)
        a = rng.standard_normal((40, 24)) * 1e-36
        got = gram_matrix_mkl(a)
        npt.assert_allclose(got, np.triu(a.T @ a), rtol=1e-12)
