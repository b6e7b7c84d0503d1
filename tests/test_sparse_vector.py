"""sparse @ vector (SpMV) suite — (N,), (N,1), (1,N) shapes on both
sides, out accumulate; models the reference's
``tests/test_sparse_vector.py``."""

import unittest

import numpy as np
import scipy.sparse as sps

from sparse_dot_tpu import dot_product_mkl

from .common import MATRIX_1, MATRIX_2, VECTOR, make_matrixes, \
    np_almost_equal


class TestSparseVectorCSR(unittest.TestCase):
    sparse_func = sps.csr_matrix
    double_dtype = np.float64
    single_dtype = np.float32
    decimal = 6

    @classmethod
    def setUpClass(cls):
        cls.MATRIX_1, cls.MATRIX_2 = MATRIX_1.copy(), MATRIX_2.copy()
        cls.VECTOR = VECTOR.copy()

    def setUp(self):
        self.mat1 = self.sparse_func(self.MATRIX_1).copy()
        self.vec = self.VECTOR.astype(self.double_dtype)

    def test_mat_vec_1d(self):
        ref = self.mat1.toarray() @ self.vec
        out = dot_product_mkl(self.mat1, self.vec)
        self.assertEqual(out.shape, (self.mat1.shape[0],))
        np_almost_equal(out, ref, decimal=self.decimal)

    def test_mat_vec_2d(self):
        ref = self.mat1.toarray() @ self.vec.reshape(-1, 1)
        out = dot_product_mkl(self.mat1, self.vec.reshape(-1, 1))
        self.assertEqual(out.shape, (self.mat1.shape[0], 1))
        np_almost_equal(out, ref, decimal=self.decimal)

    def test_vec_mat_1d(self):
        v = np.random.default_rng(3).random(self.mat1.shape[0]).astype(
            self.double_dtype
        )
        ref = v @ self.mat1.toarray()
        out = dot_product_mkl(v, self.mat1)
        self.assertEqual(out.shape, (self.mat1.shape[1],))
        np_almost_equal(out, ref, decimal=self.decimal)

    def test_vec_mat_2d(self):
        v = np.random.default_rng(3).random(
            (1, self.mat1.shape[0])
        ).astype(self.double_dtype)
        ref = v @ self.mat1.toarray()
        out = dot_product_mkl(v, self.mat1)
        self.assertEqual(out.shape, (1, self.mat1.shape[1]))
        np_almost_equal(out, ref, decimal=self.decimal)

    def test_mat_vec_out(self):
        ref = self.mat1.toarray() @ self.vec
        out_arr = np.ones(self.mat1.shape[0], dtype=ref.dtype)
        expect = ref + 2.0 * out_arr
        res = dot_product_mkl(
            self.mat1, self.vec, out=out_arr, out_scalar=2.0
        )
        np_almost_equal(res, expect, decimal=self.decimal)
        self.assertEqual(id(res), id(out_arr))

    def test_float32(self):
        m1 = self.mat1.astype(self.single_dtype)
        v = self.vec.astype(self.single_dtype)
        ref = m1.toarray() @ v
        out = dot_product_mkl(m1, v)
        self.assertEqual(out.dtype, self.single_dtype)
        np_almost_equal(out, ref, decimal=5)

    def test_cast(self):
        m1 = self.mat1.astype(self.single_dtype)
        out = dot_product_mkl(m1, self.vec, cast=True)
        self.assertEqual(out.dtype, self.double_dtype)
        np_almost_equal(
            out,
            m1.toarray().astype(self.double_dtype) @ self.vec,
            decimal=5,
        )

    def test_empty(self):
        empty = self.sparse_func(
            sps.csr_matrix((200, 300), dtype=self.double_dtype)
        )
        out = dot_product_mkl(empty, self.vec)
        np_almost_equal(out, np.zeros(200), decimal=self.decimal)

    def test_vector_vector(self):
        a = self.vec
        ref = np.dot(a, a)
        self.assertAlmostEqual(
            float(dot_product_mkl(a, a)), float(ref), places=6
        )


class TestSparseVectorCSC(TestSparseVectorCSR):
    sparse_func = sps.csc_matrix


class TestSparseVectorBSR(TestSparseVectorCSR):
    sparse_func = staticmethod(
        lambda m: sps.bsr_matrix(m, blocksize=(10, 10))
    )


class _ComplexMixin:
    double_dtype = np.cdouble
    single_dtype = np.csingle
    decimal = 5

    @classmethod
    def setUpClass(cls):
        cls.MATRIX_1, cls.MATRIX_2 = make_matrixes(
            200, 100, 300, 0.05, dtype=np.cdouble
        )
        rng = np.random.default_rng(88)
        cls.VECTOR = rng.random(300) + 1j * rng.random(300)


class TestSparseVectorCSRComplex(_ComplexMixin, TestSparseVectorCSR):
    pass



from .common import ForcePlanarMixin


class TestSparseVectorCSRComplexPlanar(
    ForcePlanarMixin, TestSparseVectorCSRComplex
):
    pass


if __name__ == "__main__":
    unittest.main()
