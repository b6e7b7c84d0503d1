"""Mesh-sharded op suite on the 8-virtual-device CPU mesh — validates
the SPMD layouts (row-shard, k-shard + psum, distributed gram/CG)
against dense oracles."""

import unittest

import numpy as np
import numpy.testing as npt
import scipy.sparse as sps

import jax

from sparse_dot_tpu.parallel import (
    make_mesh,
    shard_csr_rows,
    sharded_spmm,
    sharded_spmv,
    sharded_gram,
    sharded_cg,
    sharded_spmm_2d,
)
from sparse_dot_tpu.parallel.ops import shard_csr_cols

from .common import MATRIX_1, np_almost_equal


class TestShardedOps(unittest.TestCase):
    @classmethod
    def setUpClass(cls):
        cls.n_dev = jax.device_count()
        cls.mesh = make_mesh((cls.n_dev, 1), ("rows", "cols"))
        cls.A = MATRIX_1.copy().tocsr()
        rng = np.random.default_rng(9)
        cls.B = rng.random((cls.A.shape[1], 40))

    def test_multiple_devices_available(self):
        self.assertGreaterEqual(self.n_dev, 2)

    def test_row_sharded_spmm(self):
        A_sh = shard_csr_rows(self.A, self.n_dev, self.mesh)
        C = sharded_spmm(self.mesh, A_sh, self.B)
        np_almost_equal(np.asarray(C), self.A.toarray() @ self.B)

    def test_row_sharded_spmv(self):
        A_sh = shard_csr_rows(self.A, self.n_dev, self.mesh)
        x = self.B[:, 0]
        y = sharded_spmv(self.mesh, A_sh, x)
        np_almost_equal(np.asarray(y), self.A.toarray() @ x)

    def test_k_sharded_spmm_psum(self):
        mesh = make_mesh((1, self.n_dev), ("rows", "cols"))
        A_sh = shard_csr_cols(self.A, self.n_dev, mesh)
        C = sharded_spmm_2d(mesh, A_sh, self.B)
        np_almost_equal(np.asarray(C), self.A.toarray() @ self.B)

    def test_sharded_gram(self):
        A_sh = shard_csr_rows(self.A, self.n_dev, self.mesh)
        G = sharded_gram(self.mesh, A_sh)
        np_almost_equal(
            np.asarray(G), self.A.toarray().T @ self.A.toarray()
        )

    def test_sharded_cg(self):
        n = 64
        M = sps.random(n, n, density=0.2, random_state=4, format="csr")
        A = (M @ M.T + n * sps.identity(n)).tocsr()
        b = np.random.default_rng(5).random(n)
        A_sh = shard_csr_rows(A, self.n_dev, self.mesh)
        x, res, iters = sharded_cg(self.mesh, A_sh, b, tol=1e-12)
        npt.assert_array_almost_equal(x, np.linalg.solve(A.toarray(), b))
        self.assertLess(res, 1e-10)


if __name__ == "__main__":
    unittest.main()


class TestShardedCGLS(unittest.TestCase):
    def test_sharded_least_squares(self):
        from sparse_dot_tpu.parallel import make_mesh, shard_csr_rows, \
            sharded_cgls

        n_dev = jax.device_count()
        mesh = make_mesh((n_dev, 1), ("rows", "cols"))
        A = MATRIX_1.copy().tocsr()[:, :50]
        b = np.random.default_rng(2).random(A.shape[0])
        A_sh = shard_csr_rows(A, n_dev, mesh)
        x, res, iters = sharded_cgls(mesh, A_sh, b, tol=1e-12)
        expect = np.linalg.lstsq(A.toarray(), b, rcond=None)[0]
        npt.assert_array_almost_equal(x, expect)
