"""dense @ dense (GEMM) suite — order axes and out accumulate; models the
reference's ``tests/test_dense_dense.py``."""

import unittest

import numpy as np

from sparse_dot_tpu import dot_product_mkl

from .common import MATRIX_1, MATRIX_2, make_matrixes, np_almost_equal


class TestDenseDense(unittest.TestCase):
    order_a = "C"
    order_b = "C"
    double_dtype = np.float64
    single_dtype = np.float32
    decimal = 6

    @classmethod
    def setUpClass(cls):
        cls.MATRIX_1, cls.MATRIX_2 = MATRIX_1.copy(), MATRIX_2.copy()

    def setUp(self):
        self.d1 = np.asarray(self.MATRIX_1.toarray(), order=self.order_a)
        self.d2 = np.asarray(self.MATRIX_2.toarray(), order=self.order_b)
        self.ref = np.dot(self.d1, self.d2)

    def test_gemm(self):
        mat3 = dot_product_mkl(self.d1, self.d2)
        np_almost_equal(mat3, self.ref, decimal=self.decimal)

    def test_gemm_out(self):
        order_out = "C" if self.order_a == "C" else "F"
        out = np.asarray(
            np.random.default_rng(7).random(self.ref.shape),
            order=order_out,
        ).astype(self.ref.dtype)
        expect = self.ref + 1.5 * out
        mat3 = dot_product_mkl(self.d1, self.d2, out=out, out_scalar=1.5)
        np_almost_equal(mat3, expect, decimal=self.decimal)
        self.assertEqual(id(mat3), id(out))

    def test_gemm_output_order_follows_a(self):
        mat3 = dot_product_mkl(self.d1, self.d2)
        if self.order_a == "C":
            self.assertTrue(mat3.flags.c_contiguous)
        else:
            self.assertTrue(mat3.flags.f_contiguous)

    def test_gemm_1d_b(self):
        b = self.d2[:, 0].copy()
        ref = np.dot(self.d1, b)
        mat3 = dot_product_mkl(self.d1, b.reshape(-1, 1)).ravel()
        np_almost_equal(mat3, ref, decimal=self.decimal)

    def test_float32(self):
        d1 = self.d1.astype(self.single_dtype)
        d2 = self.d2.astype(self.single_dtype)
        mat3 = dot_product_mkl(d1, d2)
        self.assertEqual(mat3.dtype, self.single_dtype)
        np_almost_equal(mat3, self.ref, decimal=5)

    def test_cast(self):
        d1 = self.d1.astype(self.single_dtype)
        mat3 = dot_product_mkl(d1, self.d2, cast=True)
        self.assertEqual(mat3.dtype, self.ref.dtype)
        np_almost_equal(mat3, self.ref, decimal=5)

    def test_nocast_raises(self):
        with self.assertRaises(ValueError):
            dot_product_mkl(self.d1.astype(self.single_dtype), self.d2)


class TestDenseDenseFC(TestDenseDense):
    order_a = "F"


class TestDenseDenseCF(TestDenseDense):
    order_b = "F"


class TestDenseDenseFF(TestDenseDense):
    order_a = "F"
    order_b = "F"


class _ComplexMixin:
    double_dtype = np.cdouble
    single_dtype = np.csingle
    decimal = 5

    @classmethod
    def setUpClass(cls):
        cls.MATRIX_1, cls.MATRIX_2 = make_matrixes(
            200, 100, 300, 0.05, dtype=np.cdouble
        )


class TestDenseDenseComplex(_ComplexMixin, TestDenseDense):
    pass


class TestDenseDenseComplexFC(_ComplexMixin, TestDenseDenseFC):
    pass



from .common import ForcePlanarMixin


class TestDenseDenseComplexPlanar(ForcePlanarMixin, TestDenseDenseComplex):
    pass


class TestDenseDenseComplexFCPlanar(
    ForcePlanarMixin, TestDenseDenseComplexFC
):
    pass


if __name__ == "__main__":
    unittest.main()
