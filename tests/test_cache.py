"""Host->device transfer-cache correctness.

The cache (``formats.to_device`` / ``formats.dense_to_device``) is keyed
by object identity and validated with a full-content CRC fingerprint.
These are regression tests for the silent wrong-answer class a weaker
(sampled) fingerprint allowed: an in-place host mutation that misses the
sample grid returning a stale device matrix.
"""

import unittest

import numpy as np
import numpy.testing as npt
import scipy.sparse as sps

from sparse_dot_tpu import dot_product, formats
from sparse_dot_tpu.config import config

from .common import make_matrixes


class TestTransferCacheInvalidation(unittest.TestCase):
    def setUp(self):
        formats.clear_transfer_cache()
        self.A, self.B = make_matrixes(50, 30, 4000, 0.1)

    def tearDown(self):
        formats.clear_transfer_cache()

    def test_cache_hit_identity(self):
        d1 = formats.to_device(self.A)
        d2 = formats.to_device(self.A)
        self.assertIs(d1, d2)

    def test_inplace_value_mutation_detected(self):
        # Mutate single elements at positions a 128-point sampled
        # checksum would skip; every one must invalidate the cache.
        d1 = formats.to_device(self.A)
        for idx in (1, 3, self.A.nnz - 2):
            before = np.asarray(formats.to_device(self.A).data).copy()
            self.A.data[idx] += 1.0
            d2 = formats.to_device(self.A)
            after = np.asarray(d2.data)
            self.assertAlmostEqual(
                after[idx] - before[idx], 1.0, places=12
            )

    def test_inplace_index_mutation_detected(self):
        A = self.A.copy()
        dense_before = dot_product(A, self.B).toarray()
        # Move one nonzero to a different column in place, then restore
        # scipy's sorted/canonical invariants (the cache must still see
        # the content change).
        old_col = A.indices[5]
        A.indices[5] = (old_col + 7) % A.shape[1]
        A.sort_indices()
        A.sum_duplicates()
        dense_after = dot_product(A, self.B).toarray()
        oracle = (A @ self.B).toarray()
        npt.assert_array_almost_equal(dense_after, oracle)
        self.assertFalse(np.array_equal(dense_before, dense_after))

    def test_dense_cache_mutation_detected(self):
        rng = np.random.default_rng(0)
        b = rng.random((4000, 8))
        r1 = dot_product(self.A, b)
        # An off-grid single-element change must be reflected.
        b[17, 3] += 5.0
        r2 = dot_product(self.A, b)
        npt.assert_array_almost_equal(r2, self.A @ b)
        self.assertFalse(np.array_equal(r1, r2))

    def test_cache_disable(self):
        config.device_transfer_cache = False
        try:
            d1 = formats.to_device(self.A)
            d2 = formats.to_device(self.A)
            self.assertIsNot(d1, d2)
        finally:
            config.device_transfer_cache = True

    def test_transpose_alias_reuses_buffers(self):
        # X.T shares X's buffers: the CSC view must come back as the
        # zero-cost transpose of the cached CSR (one upload, syrk pair
        # detectable downstream).
        d1 = formats.to_device(self.A)
        d2 = formats.to_device(self.A.T.tocsc(copy=False))
        self.assertIs(d2.data, d1.data)
        self.assertEqual(d2.shape, self.A.shape[::-1])




class TestPlaneCache(unittest.TestCase):
    """Inspector-executor dense-plane cache (round 4): steady-state
    SpGEMM consumes cached numeric planes + indicator; results must be
    identical with the cache on/off, and value updates must rebuild."""

    def _product(self, X, XT):
        from sparse_dot_tpu import dot_product

        return dot_product(X, XT)

    def test_cache_equivalence_and_invalidation(self):
        from sparse_dot_tpu.config import config

        X = sps.random(120, 300, density=0.1, format="csr",
                       dtype=np.float64, random_state=3)
        XT = X.T.tocsc()
        # First call is transient (use-counter gate: no dense copy is
        # pinned for one-shot calls); repeats engage the plane cache.
        C_first = self._product(X, XT)
        C_on = self._product(X, XT)
        np.testing.assert_array_equal(C_first.indptr, C_on.indptr)
        np.testing.assert_allclose(C_first.data, C_on.data, atol=1e-12)
        config.spgemm_plane_cache = False
        try:
            C_off = self._product(X, XT)
        finally:
            config.spgemm_plane_cache = True
        np.testing.assert_array_equal(C_on.indptr, C_off.indptr)
        np.testing.assert_array_equal(C_on.indices, C_off.indices)
        np.testing.assert_allclose(C_on.data, C_off.data, atol=1e-12)
        np.testing.assert_allclose(
            C_on.toarray(), (X @ XT).toarray(), atol=1e-10
        )

    def test_value_update_rebuilds_planes(self):
        from sparse_dot_tpu import formats
        from sparse_dot_tpu.ops import host as hops

        X = sps.random(80, 200, density=0.1, format="csr",
                       dtype=np.float64, random_state=5)
        A = formats.to_device(X)
        B = formats.to_device(sps.random(
            200, 90, density=0.1, format="csr", dtype=np.float64,
            random_state=6,
        ))
        C1 = hops.spgemm_device(A, B)
        # new values, same structure: planes must rebuild, not reuse
        import jax.numpy as jnp

        A2 = formats.CSR(A.data * 2.0, A.indices, A.indptr, A.shape,
                         dtype=A.dtype)
        C2 = hops.spgemm_device(A2, B)
        np.testing.assert_allclose(
            np.asarray(C2.data), 2.0 * np.asarray(C1.data), atol=1e-12
        )

    def test_steady_state_uses_planes_and_matches(self):
        """Three repeated products: the 2nd+ calls run the cached-plane
        programs (use counter past the gate, planes pinned) and must be
        numerically identical to the first (transient) call."""
        from sparse_dot_tpu import formats
        from sparse_dot_tpu.ops import host as hops

        X = sps.random(150, 200, density=0.1, format="csr",
                       dtype=np.float64, random_state=13)
        A = formats.to_device(X)
        B = A.T
        outs = [hops.spgemm_device(A, B) for _ in range(3)]
        self.assertGreaterEqual(getattr(A, "_plane_uses", 0), 2)
        self.assertIsNotNone(getattr(A, "_plane_cache", None))
        ref = np.asarray(outs[0].data)
        for C in outs[1:]:
            np.testing.assert_array_equal(
                np.asarray(C.indptr), np.asarray(outs[0].indptr)
            )
            np.testing.assert_allclose(np.asarray(C.data), ref,
                                       atol=1e-12)
        oracle = (X @ X.T.tocsc())
        oracle.sort_indices()
        got = sps.csr_matrix(
            (np.asarray(outs[-1].data), np.asarray(outs[-1].indices),
             np.asarray(outs[-1].indptr)), shape=oracle.shape,
        )
        np.testing.assert_allclose(got.toarray(), oracle.toarray(),
                                   atol=1e-10)

    def test_budget_gate(self):
        from sparse_dot_tpu import formats
        from sparse_dot_tpu.config import config

        X = sps.random(64, 64, density=0.1, format="csr",
                       dtype=np.float64, random_state=7)
        A = formats.to_device(X)
        old = config.spgemm_plane_cache_bytes
        config.spgemm_plane_cache_bytes = 16  # force over-budget
        try:
            self.assertIsNone(A.dense_planes(hilo=False))
        finally:
            config.spgemm_plane_cache_bytes = old
        self.assertIsNotNone(A.dense_planes(hilo=False))


if __name__ == "__main__":
    unittest.main()
