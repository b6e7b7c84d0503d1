"""Dtype policy, failure conditions, and empty conditions — models the
reference's ``TestTypeConversions1-7`` / ``TestFailureConditions`` /
``TestEmptyConditions`` (``tests/test_mkl.py:70-385``)."""

import unittest

import numpy as np
import numpy.testing as npt
import scipy.sparse as sps

from sparse_dot_tpu import dot_product_mkl, to_device
from sparse_dot_tpu.policy import type_check

from .common import MATRIX_1, MATRIX_2, MATRIX_1_EMPTY, VECTOR


class TestEmptyConditions(unittest.TestCase):
    def setUp(self):
        self.mat1 = MATRIX_1_EMPTY.copy()
        self.mat2 = MATRIX_2.copy()
        self.mat1_d = np.asarray(MATRIX_1_EMPTY.todense(), order="C")
        self.mat2_d = np.asarray(MATRIX_2.todense(), order="C")
        self.mat1_zero = np.zeros((0, 300))

    def test_sparse_sparse(self):
        mat3 = dot_product_mkl(self.mat1, self.mat2)
        npt.assert_array_almost_equal(
            np.dot(self.mat1_d, self.mat2_d), mat3.toarray()
        )

    def test_sparse_dense(self):
        mat3 = dot_product_mkl(self.mat1, self.mat2_d)
        npt.assert_array_almost_equal(
            np.dot(self.mat1_d, self.mat2_d), mat3
        )

    def test_sparse_vector(self):
        mat3 = dot_product_mkl(self.mat1, self.mat2_d[:, 0])
        npt.assert_array_almost_equal(
            np.dot(self.mat1_d, self.mat2_d[:, 0]), mat3
        )

    def test_dense_dense(self):
        mat3 = dot_product_mkl(self.mat1_zero, self.mat2_d)
        npt.assert_array_almost_equal(
            np.dot(self.mat1_zero, self.mat2_d), mat3
        )


class TestFailureConditions(unittest.TestCase):
    def setUp(self):
        self.mat1 = MATRIX_1.copy()
        self.mat2 = MATRIX_2.copy()
        self.vec = VECTOR.copy()

    def test_device_container_bad_type(self):
        with self.assertRaises(ValueError):
            to_device(self.mat1.tocoo())
        with self.assertRaises(ValueError):
            to_device(self.mat1.astype(np.int64))

    def test_3d_matrixes(self):
        d1 = self.mat1.toarray().reshape(200, 300, 1)
        d2 = self.mat2.toarray().reshape(300, 100, 1)
        with self.assertRaises(ValueError):
            dot_product_mkl(d1, d2)
        with self.assertRaises(ValueError):
            dot_product_mkl(d1, self.mat2)
        with self.assertRaises(ValueError):
            dot_product_mkl(self.mat1, d2)

    def test_bad_shapes(self):
        with self.assertRaises(ValueError):
            dot_product_mkl(self.vec.reshape(-1, 1), self.mat2)
        with self.assertRaises(ValueError):
            dot_product_mkl(self.mat1, self.vec.reshape(1, -1))
        with self.assertRaises(ValueError):
            dot_product_mkl(self.vec.reshape(-1, 1), self.vec.reshape(-1, 1))
        with self.assertRaises(ValueError):
            dot_product_mkl(self.mat1.transpose(), self.mat2)
        with self.assertRaises(ValueError):
            dot_product_mkl(self.vec[100:], self.vec)

    def test_bsr_not_square_blocks(self):
        with self.assertRaises(ValueError):
            to_device(self.mat1.tobsr(blocksize=(10, 5)))


class TestTypeConversions(unittest.TestCase):
    dtype = np.float32
    cast_dtype = np.float64

    final_dtype = None
    always_cast = False

    def setUp(self):
        self.mat1 = MATRIX_1.copy()
        self.mat2 = MATRIX_2.copy()

    def test_valid_pairs(self):
        a = self.mat1.astype(self.dtype)
        b = self.mat2.astype(self.dtype)
        c, d = type_check(a, b, cast=self.always_cast)

        if self.always_cast:
            self.assertNotEqual(id(a), id(c))
            self.assertNotEqual(id(b), id(d))
        else:
            self.assertEqual(id(a), id(c))
            self.assertEqual(id(b), id(d))

        fd = self.final_dtype if self.final_dtype is not None else self.dtype
        self.assertEqual(c.dtype, fd)
        self.assertEqual(d.dtype, fd)

    def test_cast_pairs_right(self):
        a = self.mat1.astype(self.dtype)
        b = self.mat2.astype(self.cast_dtype)

        with self.assertRaises(ValueError):
            type_check(a, b)

        c, d = type_check(a, b, cast=True)
        self.assertNotEqual(id(a), id(c))
        if self.always_cast:
            self.assertNotEqual(id(b), id(d))
        else:
            self.assertEqual(id(b), id(d))

        fd = (
            self.final_dtype
            if self.final_dtype is not None
            else self.cast_dtype
        )
        self.assertEqual(c.dtype, fd)
        self.assertEqual(d.dtype, fd)

    def test_cast_pairs_left(self):
        a = self.mat1.astype(self.cast_dtype)
        b = self.mat2.astype(self.dtype)

        with self.assertRaises(ValueError):
            type_check(a, b)

        c, d = type_check(a, b, cast=True)
        if self.always_cast:
            self.assertNotEqual(id(a), id(c))
        else:
            self.assertEqual(id(a), id(c))
        self.assertNotEqual(id(b), id(d))

        fd = (
            self.final_dtype
            if self.final_dtype is not None
            else self.cast_dtype
        )
        self.assertEqual(c.dtype, fd)
        self.assertEqual(d.dtype, fd)


class TestTypeConversions2(TestTypeConversions):
    dtype = np.csingle
    cast_dtype = np.cdouble


class TestTypeConversions3(TestTypeConversions):
    dtype = np.float32
    cast_dtype = np.cdouble


class TestTypeConversions4(TestTypeConversions):
    dtype = np.float64
    cast_dtype = np.cdouble


class TestTypeConversions5(TestTypeConversions):
    dtype = np.int32
    cast_dtype = np.float32

    final_dtype = np.float64
    always_cast = True


class TestTypeConversions6(TestTypeConversions):
    dtype = np.int32
    cast_dtype = np.int64

    final_dtype = np.float64
    always_cast = True


class TestTypeConversions7(TestTypeConversions):
    dtype = np.clongdouble
    cast_dtype = np.clongdouble

    final_dtype = np.cdouble
    always_cast = True


if __name__ == "__main__":
    unittest.main()
