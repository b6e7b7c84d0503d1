"""Sparse QR least-squares suite — models the reference's
``tests/test_qr_solver.py`` (diagonal system, casts, guards) plus a
general overdetermined system checked against ``np.linalg.lstsq``."""

import unittest

import numpy as np
import numpy.testing as npt
import scipy.sparse as sps

from sparse_dot_tpu import sparse_qr_solve_mkl

from .common import MATRIX_1


class TestSparseSolver(unittest.TestCase):
    @classmethod
    def setUpClass(cls):
        cls.A = sps.diags(MATRIX_1.data[0:100].copy(), format="csr")
        cls.B = MATRIX_1.data[0:100].copy().reshape(-1, 1)
        cls.X = np.linalg.lstsq(cls.A.todense(), cls.B, rcond=None)[0]

    def setUp(self):
        self.mat1 = self.A.copy()
        self.mat2 = self.B.copy()
        self.mat3 = self.X.copy()

    def test_sparse_solver(self):
        mat3 = sparse_qr_solve_mkl(self.mat1, self.mat2)
        npt.assert_array_almost_equal(self.mat3, mat3)

    def test_sparse_solver_single(self):
        mat3 = sparse_qr_solve_mkl(
            self.mat1.astype(np.float32), self.mat2.astype(np.float32)
        )
        npt.assert_array_almost_equal(self.mat3, mat3)
        self.assertEqual(mat3.dtype, np.float32)

    def test_sparse_solver_cast_B(self):
        mat3 = sparse_qr_solve_mkl(
            self.mat1, self.mat2.astype(np.float32), cast=True
        )
        npt.assert_array_almost_equal(self.mat3, mat3)

    def test_sparse_solver_cast_A(self):
        mat3 = sparse_qr_solve_mkl(
            self.mat1.astype(np.float32), self.mat2, cast=True
        )
        npt.assert_array_almost_equal(self.mat3, mat3)

    def test_sparse_solver_cast_CSC(self):
        mat3 = sparse_qr_solve_mkl(self.mat1.tocsc(), self.mat2, cast=True)
        npt.assert_array_almost_equal(self.mat3, mat3)

    def test_sparse_solver_cast_CSC_Forder(self):
        mat3 = sparse_qr_solve_mkl(
            self.mat1.tocsc(), np.array(self.mat2, order="F"), cast=True
        )
        npt.assert_array_almost_equal(self.mat3, mat3)

    def test_sparse_solver_1d_d(self):
        mat3 = sparse_qr_solve_mkl(self.mat1, self.mat2.ravel())
        npt.assert_array_almost_equal(self.mat3.ravel(), mat3)

    def test_overdetermined(self):
        A = MATRIX_1[:, :50].tocsr()
        b = np.arange(A.shape[0], dtype=np.float64)
        expect = np.linalg.lstsq(A.toarray(), b, rcond=None)[0]
        got = sparse_qr_solve_mkl(A, b)
        npt.assert_array_almost_equal(expect, got)

    def test_solver_guard_errors(self):
        with self.assertRaises(ValueError):
            sparse_qr_solve_mkl(self.mat1, self.mat2.T)
        with self.assertRaises(ValueError):
            sparse_qr_solve_mkl(self.mat1.tocsc(), self.mat2)
        with self.assertRaises(ValueError):
            sparse_qr_solve_mkl(self.mat1.tocoo(), self.mat2, cast=True)
        with self.assertRaises(ValueError):
            sparse_qr_solve_mkl(self.mat1.astype(np.cdouble), self.mat2)
        with self.assertRaises(ValueError):
            sparse_qr_solve_mkl(self.mat1.astype(np.csingle), self.mat2)


if __name__ == "__main__":
    unittest.main()
