"""PARDISO-protocol suite — phase semantics and cross-validation against
the QR solver; models the reference's ``tests/test_pardiso.py``."""

import unittest

import numpy as np
import numpy.testing as npt

from sparse_dot_tpu.solvers import pardiso, pardisoinit
from sparse_dot_tpu import sparse_qr_solve_mkl

from .common import make_matrixes

A, B = make_matrixes(50, 10, 50, 0.2)
B = B.toarray()
A.sort_indices()


class TestPARDISO(unittest.TestCase):
    dtype = np.float32
    mtype = 11
    single_precision = True

    def setUp(self):
        self.pt, self.iparm = pardisoinit(
            self.mtype, single_precision=self.single_precision
        )

    def test_pardiso_init(self):
        npt.assert_equal(self.pt, np.zeros_like(self.pt))

        _iparm_init = np.zeros_like(self.iparm)
        _iparm_init[0] = 1
        _iparm_init[1] = 2
        _iparm_init[9] = 13
        _iparm_init[[10, 12, 34]] = 1
        _iparm_init[[17, 18]] = -1
        if self.single_precision:
            _iparm_init[27] = 1
        npt.assert_equal(self.iparm, _iparm_init)

    def test_pardiso_analysis(self):
        X, pt, perm, error = pardiso(
            A.astype(self.dtype),
            B[:, 0].astype(self.dtype),
            self.pt,
            self.mtype,
            self.iparm,
            11,
        )
        self.assertEqual(error, 0)
        npt.assert_array_almost_equal(X, np.zeros_like(X))
        npt.assert_array_almost_equal(perm, np.zeros_like(perm))
        with self.assertRaises(AssertionError):
            npt.assert_equal(pt, np.zeros_like(pt))

    def test_pardiso_solve(self):
        X, pt, perm, error = pardiso(
            A.astype(self.dtype),
            B[:, 0].astype(self.dtype),
            self.pt,
            self.mtype,
            self.iparm,
            13,
        )
        self.assertEqual(error, 0)
        with self.assertRaises(AssertionError):
            npt.assert_array_almost_equal(X, np.zeros_like(X))
        with self.assertRaises(AssertionError):
            npt.assert_equal(pt, np.zeros_like(pt))

        if self.mtype == 11:
            QR_X = sparse_qr_solve_mkl(
                A.astype(self.dtype), B[:, 0].astype(self.dtype)
            )
        else:
            _real_B = np.ascontiguousarray(B[:, 0].astype(self.dtype).real)
            QR_X = np.zeros_like(X)
            QR_X.real = sparse_qr_solve_mkl(
                A.astype(_real_B.dtype), _real_B
            )

        npt.assert_array_almost_equal(X, QR_X, decimal=3)

    def test_pardiso_solve_mrhs(self):
        X, pt, perm, error = pardiso(
            A.astype(self.dtype),
            B.astype(self.dtype),
            self.pt,
            self.mtype,
            self.iparm,
            13,
        )
        self.assertEqual(error, 0)
        with self.assertRaises(AssertionError):
            npt.assert_array_almost_equal(X, np.zeros_like(X))
        with self.assertRaises(AssertionError):
            npt.assert_equal(pt, np.zeros_like(pt))

    def test_pardiso_factor_then_solve(self):
        a = A.astype(self.dtype)
        b = B[:, 0].astype(self.dtype)
        _, pt, _, error = pardiso(
            a, b, self.pt, self.mtype, self.iparm, 12
        )
        self.assertEqual(error, 0)
        X, pt, _, error = pardiso(
            a, b, pt, self.mtype, self.iparm, 33
        )
        self.assertEqual(error, 0)
        oracle = np.linalg.solve(a.toarray().astype(np.complex128
                                                    if np.iscomplexobj(b)
                                                    else np.float64),
                                 b.astype(np.complex128
                                          if np.iscomplexobj(b)
                                          else np.float64))
        npt.assert_array_almost_equal(X, oracle, decimal=3)

    def test_pardiso_release(self):
        _, pt, _, error = pardiso(
            A.astype(self.dtype),
            B[:, 0].astype(self.dtype),
            self.pt,
            self.mtype,
            self.iparm,
            13,
        )
        _, pt, _, error = pardiso(
            A.astype(self.dtype),
            B[:, 0].astype(self.dtype),
            pt,
            self.mtype,
            self.iparm,
            -1,
        )
        self.assertEqual(error, 0)
        npt.assert_equal(pt, np.zeros_like(pt))

    def test_pardiso_guards(self):
        with self.assertRaises(ValueError):
            pardiso(
                A.tocoo(), B, self.pt, self.mtype, self.iparm, 13
            )
        with self.assertRaises(ValueError):
            pardiso(A, A, self.pt, self.mtype, self.iparm, 13)


class TestPARDISODouble(TestPARDISO):
    dtype = np.float64
    mtype = 11
    single_precision = False


class TestPARDISOSingleComplex(TestPARDISO):
    dtype = np.complex64
    mtype = 13
    single_precision = True


class TestPARDISODoubleComplex(TestPARDISO):
    dtype = np.complex128
    mtype = 13
    single_precision = False


if __name__ == "__main__":
    unittest.main()
