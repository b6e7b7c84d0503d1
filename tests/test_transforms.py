"""JAX-transform coverage: the device ops are pure functions, so
``grad``/``jvp``/``vmap``/``jit`` compose with them — capability the
ctypes/MKL reference cannot express at all."""

import unittest

import numpy as np
import numpy.testing as npt
import scipy.sparse as sps

import jax
import jax.numpy as jnp

from sparse_dot_tpu import formats
from sparse_dot_tpu.ops import _xla

from .common import MATRIX_1


class TestAutodiff(unittest.TestCase):
    def setUp(self):
        self.A = MATRIX_1.copy()[:40, :30].tocsr()
        self.Ad = formats.to_device(self.A)
        self.rows = self.Ad.row_indices()
        rng = np.random.default_rng(0)
        self.b = jnp.asarray(rng.random((30, 8)))

    def test_grad_wrt_values(self):
        rows, cols = self.rows, self.Ad.indices

        def loss(vals):
            c = _xla.coo_spmm_raw(rows, cols, vals, self.b, 40)
            return jnp.sum(c ** 2)

        g = jax.grad(loss)(self.Ad.data)
        # dL/dv_p = 2 * sum_n C[r_p, n] * B[c_p, n]
        C = self.A.toarray() @ np.asarray(self.b)
        expect = 2 * np.einsum(
            "pn,pn->p",
            C[np.asarray(rows)],
            np.asarray(self.b)[np.asarray(cols)],
        )
        npt.assert_allclose(np.asarray(g), expect, rtol=1e-10)

    def test_grad_wrt_dense_operand(self):
        rows, cols = self.rows, self.Ad.indices
        vals = self.Ad.data

        def loss(b):
            c = _xla.coo_spmm_raw(rows, cols, vals, b, 40)
            return jnp.sum(c)

        g = jax.grad(loss)(self.b)
        # dL/dB = A^T @ ones
        expect = self.A.toarray().T @ np.ones((40, 8))
        npt.assert_allclose(np.asarray(g), expect, rtol=1e-10)

    def test_vmap_over_dense_batches(self):
        rows, cols = self.rows, self.Ad.indices
        vals = self.Ad.data
        rng = np.random.default_rng(1)
        bs = jnp.asarray(rng.random((5, 30, 8)))

        f = jax.vmap(
            lambda b: _xla.coo_spmm_raw(rows, cols, vals, b, 40)
        )
        out = f(bs)
        for i in range(5):
            npt.assert_allclose(
                np.asarray(out[i]),
                self.A.toarray() @ np.asarray(bs[i]),
                rtol=1e-10,
            )

    def test_jvp_spmv(self):
        rows, cols = self.rows, self.Ad.indices
        vals = self.Ad.data
        x = jnp.asarray(np.random.default_rng(2).random(30))
        dx = jnp.asarray(np.random.default_rng(3).random(30))

        y, dy = jax.jvp(
            lambda v: _xla.coo_spmv(rows, cols, vals, v, m=40),
            (x,),
            (dx,),
        )
        npt.assert_allclose(
            np.asarray(dy), self.A.toarray() @ np.asarray(dx), rtol=1e-10
        )


if __name__ == "__main__":
    unittest.main()
