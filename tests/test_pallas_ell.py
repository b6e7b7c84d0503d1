"""Pallas ELL SpMM kernel (interpret mode — structural contract).

The hardware path is exercised by ``tpu_smoke``; here the kernel runs
under the Pallas interpreter on CPU against the scipy oracle.

Interpret-mode caveat (documented in ``ops/pallas_ell.py``): the
interpreter's execution loses the df64 error-free-transform bits, so
the float64 kernel only asserts ~f32 accuracy here; its 1e-12-grade
exactness claim is validated on real hardware by
``tpu_smoke/test_smoke.py``.
"""

import unittest

import numpy as np
import scipy.sparse as sps

import jax.numpy as jnp

from sparse_dot_tpu.ops import pallas_ell

from .common import SEED


def _ell_arrays(A):
    m, k = A.shape
    row_nnz = np.diff(A.indptr)
    rmax = max(int(row_nnz.max()), 1)
    cols = np.zeros((m, rmax), np.int32)
    vals = np.zeros((m, rmax), A.dtype)
    for i in range(m):
        lo, hi = A.indptr[i], A.indptr[i + 1]
        cols[i, : hi - lo] = A.indices[lo:hi]
        vals[i, : hi - lo] = A.data[lo:hi]
    return jnp.asarray(cols), jnp.asarray(vals)


class TestPallasEll(unittest.TestCase):
    def _run(self, dtype, m=300, k=200, n=96, density=0.03, decimal=6):
        A = sps.random(m, k, density=density, format="csr", dtype=dtype,
                       random_state=SEED)
        rng = np.random.default_rng(SEED + 1)
        b = rng.standard_normal((k, n)).astype(dtype)
        cols, vals = _ell_arrays(A)
        out = np.asarray(
            pallas_ell.ell_spmm_pallas(cols, vals, jnp.asarray(b), m=m,
                                       interpret=True)
        )
        np.testing.assert_array_almost_equal(out, A @ b, decimal=decimal)

    def test_f32(self):
        self._run(np.float32, decimal=4)

    def test_f64(self):
        # decimal=5, not the library's decimal=6 f64 grade: interpret
        # mode degrades the df64 transforms (see module docstring); the
        # hardware smoke suite asserts the real bound.
        self._run(np.float64, decimal=5)

    def test_ragged_shapes_padded(self):
        # Odd m / n / rmax exercise every padding path.
        self._run(np.float32, m=173, k=131, n=45, density=0.05, decimal=4)

    def test_wide_n_panels(self):
        # n beyond one panel exercises the panel grid dimension.
        self._run(np.float32, m=160, k=120, n=300, density=0.05,
                  decimal=4)
        self._run(np.float64, m=160, k=120, n=130, density=0.05,
                  decimal=5)

    def test_gate(self):
        self.assertTrue(
            pallas_ell.ell_pallas_available(np.float32, 10000, 10000, 128)
        )
        self.assertTrue(
            pallas_ell.ell_pallas_available(np.float64, 10000, 10000, 128)
        )
        self.assertFalse(
            pallas_ell.ell_pallas_available(np.float64, 200000, 200000,
                                            128)
        )
        self.assertFalse(
            pallas_ell.ell_pallas_available(np.complex128, 100, 100, 128)
        )


if __name__ == "__main__":
    unittest.main()
