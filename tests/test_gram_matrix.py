"""Gram matrix (syrk) suite — upper-triangular semantics, sparse/dense
inputs and outputs, CSC-needs-cast rule; models the reference's
``tests/test_gram_matrix.py``."""

import unittest

import numpy as np
import scipy.sparse as sps

from sparse_dot_tpu import gram_matrix_mkl

from .common import MATRIX_1, np_almost_equal


class TestGramMatrix(unittest.TestCase):
    double_dtype = np.float64
    single_dtype = np.float32
    sparse_func = sps.csr_matrix

    @classmethod
    def setUpClass(cls):
        cls.MATRIX_1 = cls.sparse_func(MATRIX_1.copy())

    def setUp(self):
        self.mat1 = self.MATRIX_1.copy()
        self.mat1_d = self.MATRIX_1.toarray()

        gram_ut = np.dot(self.mat1_d.T, self.mat1_d)
        gram_ut[np.tril_indices(gram_ut.shape[0], k=-1)] = 0.0
        self.gram_ut = gram_ut

        gram_ut_t = np.dot(self.mat1_d, self.mat1_d.T)
        gram_ut_t[np.tril_indices(gram_ut_t.shape[0], k=-1)] = 0.0
        self.gram_ut_t = gram_ut_t


class TestGramMatrixSparse(TestGramMatrix):
    def test_gram_matrix_sp(self):
        mat2 = gram_matrix_mkl(self.mat1)
        np_almost_equal(mat2.toarray(), self.gram_ut)

        with self.assertRaises(ValueError):
            gram_matrix_mkl(
                self.mat1,
                out=np.zeros(
                    (self.mat1.shape[0], self.mat1.shape[0]),
                    dtype=self.double_dtype,
                ),
            )

    def test_gram_matrix_sp_single(self):
        mat2 = gram_matrix_mkl(self.mat1.astype(self.single_dtype))
        np_almost_equal(mat2.toarray(), self.gram_ut, decimal=5)

    def test_gram_matrix_d_single(self):
        mat2 = gram_matrix_mkl(
            self.mat1.astype(self.single_dtype), dense=True
        )
        np_almost_equal(mat2, self.gram_ut, decimal=5)

        mat2 = gram_matrix_mkl(
            self.mat1.astype(self.single_dtype),
            dense=True,
            out=np.zeros(
                (self.mat1.shape[1], self.mat1.shape[1]),
                dtype=self.single_dtype,
            ),
            out_scalar=1.0,
        )
        mat2[np.tril_indices(mat2.shape[0], k=-1)] = 0.0
        np_almost_equal(mat2, self.gram_ut, decimal=5)

        with self.assertRaises(ValueError):
            gram_matrix_mkl(
                self.mat1.astype(self.single_dtype),
                dense=True,
                out=np.zeros((self.mat1.shape[1], self.mat1.shape[1])),
                out_scalar=1.0,
            )

    def test_gram_matrix_d(self):
        mat2 = gram_matrix_mkl(self.mat1, dense=True)
        np_almost_equal(mat2, self.gram_ut)

        mat2 = gram_matrix_mkl(
            self.mat1,
            dense=True,
            out=np.zeros(
                (self.mat1.shape[1], self.mat1.shape[1]),
                dtype=self.double_dtype,
            ),
            out_scalar=1.0,
        )
        mat2[np.tril_indices(mat2.shape[0], k=-1)] = 0.0
        np_almost_equal(mat2, self.gram_ut)

    def test_gram_matrix_sp_t(self):
        mat2 = gram_matrix_mkl(self.mat1, transpose=True)
        np_almost_equal(mat2.toarray(), self.gram_ut_t)

    def test_gram_matrix_d_t(self):
        mat2 = gram_matrix_mkl(self.mat1, dense=True, transpose=True)
        np_almost_equal(mat2, self.gram_ut_t)

    def test_gram_matrix_csc_sp(self):
        mat2 = gram_matrix_mkl(self.mat1.tocsc(), cast=True)
        np_almost_equal(mat2.toarray(), self.gram_ut)

    def test_gram_matrix_csc_no_cast_raises(self):
        with self.assertRaises(ValueError):
            gram_matrix_mkl(self.mat1.tocsc())

    def test_gram_matrix_complex_raises(self):
        with self.assertRaises(ValueError):
            gram_matrix_mkl(self.mat1.astype(np.cdouble))

    def test_gram_matrix_csc_d(self):
        mat = self.mat1.tocsc()
        mat2 = gram_matrix_mkl(mat, dense=True, cast=True)
        np_almost_equal(mat.toarray(), self.mat1.toarray())
        np_almost_equal(mat2, self.gram_ut)


class TestGramMatrixDense(TestGramMatrix):
    def test_gram_matrix_dd_double(self):
        mat2 = gram_matrix_mkl(self.mat1.toarray(), dense=True)
        np_almost_equal(mat2, self.gram_ut)

        mat2 = gram_matrix_mkl(
            self.mat1.toarray(),
            dense=True,
            out=np.zeros(
                (self.mat1.shape[1], self.mat1.shape[1]),
                dtype=self.double_dtype,
            ),
            out_scalar=1.0,
        )
        np_almost_equal(mat2, self.gram_ut)

    def test_gram_matrix_dd_single(self):
        mat2 = gram_matrix_mkl(
            self.mat1.astype(self.single_dtype).toarray(), dense=True
        )
        np_almost_equal(mat2, self.gram_ut, decimal=5)

    def test_gram_matrix_dd_double_F(self):
        mat2 = gram_matrix_mkl(
            np.asarray(self.mat1.toarray(), order="F"), dense=True
        )
        np_almost_equal(mat2, self.gram_ut)

        mat2 = gram_matrix_mkl(
            np.asarray(self.mat1.toarray(), order="F"),
            dense=True,
            out=np.zeros(
                (self.mat1.shape[1], self.mat1.shape[1]),
                dtype=self.double_dtype,
                order="F",
            ),
            out_scalar=1.0,
        )
        np_almost_equal(mat2, self.gram_ut)

    def test_gram_matrix_dd_transpose(self):
        mat2 = gram_matrix_mkl(
            self.mat1.toarray(), dense=True, transpose=True
        )
        np_almost_equal(mat2, self.gram_ut_t)


try:
    from scipy.sparse import csr_array

    class TestGramMatrixSparseArray(TestGramMatrixSparse):
        sparse_func = csr_array

except ImportError:
    pass


if __name__ == "__main__":
    unittest.main()


class TestSypr(unittest.TestCase):
    """Triple-product AᵀBA / ABAᵀ — working version of the reference's
    dead `_sparse_sypr.py` driver."""

    def setUp(self):
        self.A = MATRIX_1.copy()
        m = self.A.shape[0]
        import scipy.sparse as _s
        B = _s.random(m, m, density=0.1, format="csr", random_state=7)
        self.B = (B + B.T).tocsr()

    def test_sypr_atba(self):
        from sparse_dot_tpu import sypr

        got = sypr(self.A, self.B)
        ref = self.A.toarray().T @ self.B.toarray() @ self.A.toarray()
        np_almost_equal(got.toarray(), np.triu(ref))

    def test_sypr_abat(self):
        from sparse_dot_tpu import sypr

        import scipy.sparse as _s
        k = self.A.shape[1]
        B = _s.random(k, k, density=0.1, format="csr", random_state=8)
        B = (B + B.T).tocsr()
        got = sypr(self.A, B, transpose=True, dense=True)
        ref = self.A.toarray() @ B.toarray() @ self.A.toarray().T
        np_almost_equal(got, np.triu(ref))

    def test_sypr_guards(self):
        from sparse_dot_tpu import sypr

        with self.assertRaises(ValueError):
            sypr(self.A.tocoo(), self.B)
        with self.assertRaises(ValueError):
            sypr(self.A, self.B, transpose=True)  # shape mismatch
