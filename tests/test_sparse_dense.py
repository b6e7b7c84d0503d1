"""sparse @ dense (SpMM) suite — C/F order axes, out/out_scalar
accumulate, both operand orders; models the reference's
``tests/test_sparse_dense.py``."""

import unittest

import numpy as np
import scipy.sparse as sps

from sparse_dot_tpu import dot_product_mkl

from .common import MATRIX_1, MATRIX_2, make_matrixes, np_almost_equal


class TestSparseDenseCSR(unittest.TestCase):
    sparse_func = sps.csr_matrix
    order = "C"
    double_dtype = np.float64
    single_dtype = np.float32
    decimal = 6

    @classmethod
    def setUpClass(cls):
        cls.MATRIX_1, cls.MATRIX_2 = MATRIX_1.copy(), MATRIX_2.copy()

    def setUp(self):
        self.mat1 = self.sparse_func(self.MATRIX_1).copy()
        self.mat2_d = np.asarray(
            self.MATRIX_2.toarray(), order=self.order
        ).astype(self.double_dtype)
        self.ref = np.dot(self.mat1.toarray(), self.mat2_d)

    def test_sparse_dense(self):
        mat3 = dot_product_mkl(self.mat1, self.mat2_d)
        np_almost_equal(mat3, self.ref, decimal=self.decimal)

    def test_sparse_dense_out(self):
        out = np.random.default_rng(50).random(self.ref.shape)
        out = np.asarray(out, order=self.order).astype(self.double_dtype)
        expect = self.ref + 2.0 * out
        mat3 = dot_product_mkl(
            self.mat1, self.mat2_d, out=out, out_scalar=2.0
        )
        np_almost_equal(mat3, expect, decimal=self.decimal)
        self.assertEqual(id(mat3), id(out))

    def test_sparse_dense_default_out_scalar(self):
        out = np.ones(self.ref.shape, dtype=self.double_dtype,
                      order=self.order)
        expect = self.ref + out
        mat3 = dot_product_mkl(self.mat1, self.mat2_d, out=out)
        np_almost_equal(mat3, expect, decimal=self.decimal)

    def test_dense_sparse(self):
        d = np.asarray(self.MATRIX_1.toarray(), order=self.order).astype(
            self.double_dtype
        )
        m2 = self.sparse_func(self.MATRIX_2).astype(self.double_dtype)
        ref = np.dot(d, m2.toarray())
        mat3 = dot_product_mkl(d, m2)
        np_almost_equal(mat3, ref, decimal=self.decimal)

    def test_dense_sparse_out(self):
        d = np.asarray(self.MATRIX_1.toarray(), order=self.order).astype(
            self.double_dtype
        )
        m2 = self.sparse_func(self.MATRIX_2).astype(self.double_dtype)
        ref = np.dot(d, m2.toarray())
        out = np.asarray(
            np.random.default_rng(51).random(ref.shape), order=self.order
        ).astype(self.double_dtype)
        expect = ref + 3.0 * out
        mat3 = dot_product_mkl(d, m2, out=out, out_scalar=3.0)
        np_almost_equal(mat3, expect, decimal=self.decimal)
        self.assertEqual(id(mat3), id(out))

    def test_float32(self):
        m1 = self.mat1.astype(self.single_dtype)
        d2 = self.mat2_d.astype(self.single_dtype)
        mat3 = dot_product_mkl(m1, d2)
        np_almost_equal(mat3, self.ref, decimal=5)
        self.assertEqual(mat3.dtype, self.single_dtype)

    def test_cast(self):
        m1 = self.mat1.astype(self.single_dtype)
        mat3 = dot_product_mkl(m1, self.mat2_d, cast=True)
        np_almost_equal(mat3, self.ref, decimal=5)
        self.assertEqual(mat3.dtype, self.double_dtype)

    def test_nocast_raises(self):
        with self.assertRaises(ValueError):
            dot_product_mkl(
                self.mat1.astype(self.single_dtype), self.mat2_d
            )

    def test_bad_out(self):
        wrong_order = "F" if self.order == "C" else "C"
        out = np.zeros(self.ref.shape, order=wrong_order)
        with self.assertRaises(ValueError):
            dot_product_mkl(self.mat1, self.mat2_d, out=out)
        with self.assertRaises(ValueError):
            dot_product_mkl(
                self.mat1, self.mat2_d,
                out=np.zeros(self.ref.shape, dtype=np.float32,
                             order=self.order),
            )
        with self.assertRaises(ValueError):
            dot_product_mkl(
                self.mat1, self.mat2_d,
                out=np.zeros((3, 3), order=self.order),
            )

    def test_output_order_follows_b(self):
        mat3 = dot_product_mkl(self.mat1, self.mat2_d)
        if self.order == "C":
            self.assertTrue(mat3.flags.c_contiguous)
        else:
            self.assertTrue(mat3.flags.f_contiguous)


class TestSparseDenseCSR_F(TestSparseDenseCSR):
    order = "F"


class TestSparseDenseCSC(TestSparseDenseCSR):
    sparse_func = sps.csc_matrix


class TestSparseDenseCSC_F(TestSparseDenseCSR):
    sparse_func = sps.csc_matrix
    order = "F"


class TestSparseDenseBSR(TestSparseDenseCSR):
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


class TestSparseDenseCSRComplex(_ComplexMixin, TestSparseDenseCSR):
    pass


class TestSparseDenseCSCComplexF(_ComplexMixin, TestSparseDenseCSC_F):
    pass



from .common import ForcePlanarMixin


class TestSparseDenseCSRComplexPlanar(
    ForcePlanarMixin, TestSparseDenseCSRComplex
):
    pass


class TestSparseDenseCSCComplexFPlanar(
    ForcePlanarMixin, TestSparseDenseCSCComplexF
):
    pass


if __name__ == "__main__":
    unittest.main()
