"""Randomized oracle sweep: dot_product / gram_matrix vs scipy across
random shapes, densities, dtypes, formats, and epilogue arguments.

The reference's suite is a hand-built inheritance matrix
(``/root/reference/tests/``); this adds a seeded randomized layer on
top so routing-ladder corners (densify crossover, ELL gate, ESC blocks,
empty rows/cols, (N,) vs (N,1) vectors, out/out_scalar) get exercised
at shapes nobody hand-picked.  Every case asserts against the
scipy/numpy oracle at the reference's own tolerances.
"""

import unittest

import numpy as np
import scipy.sparse as sps

from sparse_dot_tpu import dot_product, gram_matrix
from tests.common import np_almost_equal


def _rand_sparse(rng, m, k, density, fmt, dtype):
    a = sps.random(m, k, density=density, format="csr",
                   random_state=np.random.RandomState(rng.integers(2**31)))
    if np.dtype(dtype).kind == "c":
        b = sps.random(m, k, density=density, format="csr",
                       random_state=np.random.RandomState(
                           rng.integers(2**31)))
        a = (a + 1j * b).astype(dtype)
    else:
        a = a.astype(dtype)
    return a.asformat(fmt)


class TestFuzzSpMM(unittest.TestCase):
    def test_sweep(self):
        rng = np.random.default_rng(1234)
        for case in range(24):
            m = int(rng.integers(1, 400))
            k = int(rng.integers(1, 400))
            n = int(rng.integers(1, 64))
            density = float(rng.choice([0.001, 0.02, 0.2, 0.7]))
            dtype = rng.choice(
                [np.float32, np.float64, np.complex64, np.complex128]
            )
            fmt = str(rng.choice(["csr", "csc"]))
            order = str(rng.choice(["C", "F"]))
            A = _rand_sparse(rng, m, k, density, fmt, dtype)
            B = np.asarray(
                rng.standard_normal((k, n)), dtype=np.float64
            ).astype(dtype, copy=False)
            if order == "F":
                B = np.asfortranarray(B)
            with self.subTest(case=case, m=m, k=k, n=n, fmt=fmt,
                              dtype=np.dtype(dtype).name,
                              density=density, order=order):
                got = dot_product(A, B)
                decimal = 5 if np.dtype(dtype).itemsize <= 8 else 7
                np_almost_equal(got, A.toarray() @ B, decimal=decimal)

    def test_sweep_out_accumulate(self):
        rng = np.random.default_rng(77)
        for case in range(8):
            m = int(rng.integers(2, 300))
            k = int(rng.integers(2, 300))
            n = int(rng.integers(1, 32))
            dtype = rng.choice([np.float32, np.float64])
            A = _rand_sparse(rng, m, k, 0.05, "csr", dtype)
            B = rng.standard_normal((k, n)).astype(dtype)
            base = rng.standard_normal((m, n)).astype(dtype)
            beta = float(rng.uniform(-2, 2))
            out = base.copy()
            with self.subTest(case=case, m=m, k=k, n=n,
                              dtype=np.dtype(dtype).name):
                got = dot_product(A, B, out=out, out_scalar=beta)
                self.assertIs(got, out)
                decimal = 4 if dtype == np.float32 else 8
                np_almost_equal(got, A.toarray() @ B + beta * base,
                                decimal=decimal)

    def test_sweep_spmv(self):
        rng = np.random.default_rng(99)
        for case in range(10):
            m = int(rng.integers(1, 500))
            k = int(rng.integers(1, 500))
            dtype = rng.choice([np.float32, np.float64, np.complex128])
            A = _rand_sparse(rng, m, k, 0.03, "csr", dtype)
            shape = (k,) if rng.integers(2) else (k, 1)
            x = np.asarray(rng.standard_normal(shape)).astype(dtype)
            with self.subTest(case=case, m=m, k=k, shape=shape,
                              dtype=np.dtype(dtype).name):
                got = dot_product(A, x)
                np_almost_equal(
                    got, (A.toarray() @ x.reshape(k, -1)).reshape(
                        got.shape
                    ), decimal=5,
                )


class TestFuzzSpGEMM(unittest.TestCase):
    def test_sweep(self):
        rng = np.random.default_rng(4321)
        for case in range(14):
            m = int(rng.integers(1, 300))
            k = int(rng.integers(1, 300))
            n = int(rng.integers(1, 300))
            density = float(rng.choice([0.005, 0.05, 0.3]))
            dtype = rng.choice([np.float32, np.float64, np.complex128])
            fa = str(rng.choice(["csr", "csc"]))
            fb = str(rng.choice(["csr", "csc"]))
            A = _rand_sparse(rng, m, k, density, fa, dtype)
            B = _rand_sparse(rng, k, n, density, fb, dtype)
            with self.subTest(case=case, m=m, k=k, n=n, fa=fa, fb=fb,
                              dtype=np.dtype(dtype).name,
                              density=density):
                C = dot_product(A, B)
                self.assertEqual(C.format, fa)
                decimal = 4 if np.dtype(dtype).itemsize <= 8 else 7
                np_almost_equal(C, A.toarray() @ B.toarray(),
                                decimal=decimal)

    def test_sweep_gram(self):
        rng = np.random.default_rng(555)
        for case in range(8):
            m = int(rng.integers(2, 300))
            k = int(rng.integers(2, 300))
            dtype = rng.choice([np.float32, np.float64])
            A = _rand_sparse(rng, m, k, 0.05, "csr", dtype)
            with self.subTest(case=case, m=m, k=k,
                              dtype=np.dtype(dtype).name):
                G = gram_matrix(A, dense=True)
                oracle = np.triu(A.toarray().T @ A.toarray())
                decimal = 4 if dtype == np.float32 else 8
                np_almost_equal(G, oracle, decimal=decimal)


if __name__ == "__main__":
    unittest.main()
