"""Regression tests for the round-2 id()-reuse cache hazards
(VERDICT r2 weak #7): a freed array's id() can be recycled by a new
allocation, so caches keyed by bare id() could silently serve a
previous matrix's values.  Round 3 replaced those keys with held
references (compared by identity — a held object's id can never be
recycled) and never-reused monotone structure tokens.
"""

import gc
import unittest

import numpy as np
import scipy.sparse as sps

import jax.numpy as jnp

from sparse_dot_tpu import dot_product, formats
from sparse_dot_tpu.config import config
from sparse_dot_tpu.ops import host as hops


class TestEllCacheIdentity(unittest.TestCase):
    """ELL padded-value caches must refresh when a DIFFERENT data
    array arrives, even across free/reallocate churn."""

    def setUp(self):
        self.A = sps.random(
            512, 400, density=0.05, format="csr", dtype=np.float64,
            random_state=3,
        )
        self.Ad = formats.to_device(self.A)

    def _ell_product(self, container, data):
        ell = container.ell_parts(data=data)
        self.assertIsNotNone(ell)
        cols_ell, vals_ell = ell
        return float(jnp.sum(vals_ell))

    def test_ell_values_refresh_across_reallocation(self):
        # Churn: build, use, free, rebuild scaled data arrays.  Any
        # id()-keyed cache would eventually alias a recycled id and
        # return a stale padded-values buffer.
        base = float(np.sum(self.A.data))
        for i in range(6):
            scale = float(i + 1)
            data = jnp.asarray(self.A.data * scale)
            got = self._ell_product(self.Ad, data)
            self.assertAlmostEqual(got, base * scale, places=6)
            del data
            gc.collect()

    def test_ell_cache_holds_its_key_object(self):
        # The cache entry must hold the data array it was built from
        # (identity-held key): holding it guarantees the key's id is
        # never recycled while the entry is alive.
        data = jnp.asarray(self.A.data * 2.0)
        self.Ad.ell_parts(data=data)
        entry = self.Ad._ell_cache[1]
        self.assertIs(entry[0], data)

    def test_ell_binned_values_refresh_across_reallocation(self):
        base = float(np.sum(self.A.data))
        for i in range(6):
            scale = float(i + 1)
            data = jnp.asarray(self.A.data * scale)
            binned = self.Ad.ell_parts_binned(data=data)
            self.assertIsNotNone(binned)
            _, _, vals_flat, _ = binned
            self.assertAlmostEqual(
                float(jnp.sum(vals_flat)), base * scale, places=6
            )
            del data
            gc.collect()


class TestStructureTokens(unittest.TestCase):
    """Speculative SpGEMM sizing keys by monotone per-container tokens
    that are never reused — unlike id()s."""

    def test_tokens_are_unique_and_stable(self):
        A = formats.to_device(sps.identity(8, format="csr"))
        B = formats.to_device(sps.identity(8, format="csr"))
        ta1 = hops._structure_token(A)
        tb = hops._structure_token(B)
        self.assertNotEqual(ta1, tb)
        self.assertEqual(hops._structure_token(A), ta1)

    def test_tokens_never_recycle_across_gc(self):
        # Distinct matrices (the host->device transfer cache folds
        # identical content into one container on purpose) must get
        # distinct tokens through free/reallocate churn.
        seen = set()
        for i in range(10):
            A = formats.to_device(
                sps.random(16, 16, density=0.3, format="csr",
                           dtype=np.float64, random_state=i)
            )
            tok = hops._structure_token(A)
            self.assertNotIn(tok, seen)
            seen.add(tok)
            del A
            gc.collect()

    def test_spgemm_sizing_fresh_after_container_churn(self):
        # Same shapes/density but different patterns through repeated
        # free/reallocate cycles: every product must size correctly.
        for seed in range(5):
            A = sps.random(64, 64, density=0.05, format="csr",
                           dtype=np.float64, random_state=seed)
            B = sps.random(64, 64, density=0.05, format="csr",
                           dtype=np.float64, random_state=100 + seed)
            C = dot_product(A, B)
            oracle = A @ B
            self.assertEqual(C.nnz, oracle.nnz)
            np.testing.assert_allclose(
                C.toarray(), oracle.toarray(), atol=1e-10
            )
            del A, B, C
            gc.collect()

    def test_transpose_view_memoized(self):
        # A.T must return the same container so structure-token caches
        # hit across repeated gram calls.
        A = formats.to_device(
            sps.random(32, 16, density=0.2, format="csr",
                       dtype=np.float64, random_state=1)
        )
        self.assertIs(A.T, A.T)


if __name__ == "__main__":
    unittest.main()
