"""Pure-device (jit-resident) API tests: containers as pytrees through
jit, ILP64 index width, transfer cache behavior, device format
conversion."""

import unittest

import numpy as np
import numpy.testing as npt
import scipy.sparse as sps

import jax
import jax.numpy as jnp

import sparse_dot_tpu as sdt
from sparse_dot_tpu import formats
from sparse_dot_tpu.config import config
from sparse_dot_tpu.ops import _xla
from sparse_dot_tpu.ops.host import coo_parts

from .common import MATRIX_1, np_almost_equal


class TestDeviceContainers(unittest.TestCase):
    def setUp(self):
        self.A = MATRIX_1.copy()

    def test_container_through_jit(self):
        A = formats.to_device(self.A)
        b = jnp.asarray(
            np.random.default_rng(0).random(self.A.shape[1])
        )

        @jax.jit
        def spmv(container, x):
            rows = container.row_indices()
            return _xla.coo_spmv(
                rows, container.indices, container.data, x,
                m=container.shape[0],
            )

        y = spmv(A, b)
        np_almost_equal(np.asarray(y), self.A.toarray() @ np.asarray(b))

    def test_container_transpose_view(self):
        A = formats.to_device(self.A)
        At = A.T
        self.assertIsInstance(At, formats.CSC)
        self.assertEqual(At.shape, (self.A.shape[1], self.A.shape[0]))
        back = At.T
        self.assertIsInstance(back, formats.CSR)

    def test_dot_product_accepts_device_container(self):
        A = formats.to_device(self.A)
        b = np.random.default_rng(1).random((self.A.shape[1], 8))
        res = sdt.dot_product(A, b)
        np_almost_equal(res, self.A.toarray() @ b)

    def test_tree_flatten_roundtrip(self):
        A = formats.to_device(self.A.tobsr(blocksize=(10, 10)))
        leaves, treedef = jax.tree_util.tree_flatten(A)
        A2 = jax.tree_util.tree_unflatten(treedef, leaves)
        self.assertEqual(A2.blocksize, (10, 10))
        self.assertEqual(A2.shape, A.shape)

    def test_device_csc_to_csr_conversion(self):
        csc = formats.to_device(self.A.tocsc())
        from sparse_dot_tpu.interface import convert_container_to_csr

        csr = convert_container_to_csr(csc)
        np_almost_equal(csr.to_scipy().toarray(), self.A.toarray())


class TestILP64(unittest.TestCase):
    def tearDown(self):
        sdt.set_interface_layer("LP64")
        formats.clear_transfer_cache()

    def test_int64_indices(self):
        sdt.set_interface_layer("ILP64")
        formats.clear_transfer_cache()
        A = formats.to_device(MATRIX_1.copy())
        self.assertEqual(A.indices.dtype, jnp.int64)
        b = np.random.default_rng(0).random((MATRIX_1.shape[1], 4))
        res = sdt.dot_product(MATRIX_1.copy(), b)
        np_almost_equal(res, MATRIX_1.toarray() @ b)

    def test_full_product_matrix_under_ilp64(self):
        sdt.set_interface_layer("ILP64")
        formats.clear_transfer_cache()
        m2 = sps.random(300, 40, density=0.1, format="csr",
                        random_state=3)
        res = sdt.dot_product(MATRIX_1.copy(), m2)
        np_almost_equal(res, (MATRIX_1 @ m2))


class TestTransferCache(unittest.TestCase):
    def test_cache_hit_same_object(self):
        A = MATRIX_1.copy()
        c1 = formats.to_device(A)
        c2 = formats.to_device(A)
        self.assertIs(c1, c2)

    def test_cache_invalidated_on_mutation(self):
        A = MATRIX_1.copy()
        c1 = formats.to_device(A)
        A.data[: 10] += 1.0
        c2 = formats.to_device(A)
        self.assertIsNot(c1, c2)
        npt.assert_allclose(np.asarray(c2.data)[:10], A.data[:10])

    def test_cache_disabled(self):
        config.device_transfer_cache = False
        try:
            A = MATRIX_1.copy()
            c1 = formats.to_device(A)
            c2 = formats.to_device(A)
            self.assertIsNot(c1, c2)
        finally:
            config.device_transfer_cache = True


class TestPallasBSRInterpret(unittest.TestCase):
    """Pallas block-sparse kernel vs oracle in interpreter mode (the
    compiled path needs real TPU hardware)."""

    def test_bsr_kernel_interpret(self):
        from sparse_dot_tpu.ops.pallas_bsr import bsr_spmm_pallas

        bs = 8
        m, k, n = 64, 80, 256
        rng = np.random.default_rng(0)
        A = sps.random(m // bs, k // bs, density=0.4, format="csr",
                       random_state=1)
        nb = A.nnz
        data = rng.random((nb, bs, bs)).astype(np.float32)
        rowmap = np.repeat(
            np.arange(m // bs), np.diff(A.indptr)
        ).astype(np.int32)
        colidx = A.indices.astype(np.int32)
        b = rng.random((k, n)).astype(np.float32)

        out = bsr_spmm_pallas(
            jnp.asarray(rowmap), jnp.asarray(colidx),
            jnp.asarray(data), jnp.asarray(b),
            m=m, bs=bs, interpret=True,
        )
        ref = sps.bsr_matrix(
            (data, colidx, A.indptr), shape=(m, k)
        ).toarray() @ b
        npt.assert_allclose(np.asarray(out), ref, rtol=2e-5, atol=2e-5)

    def test_bsr_kernel_empty_block_rows(self):
        from sparse_dot_tpu.ops.pallas_bsr import bsr_spmm_pallas

        bs = 8
        m, k, n = 32, 32, 128
        # only block (1, 2) stored; rows 0, 2, 3 empty
        data = np.ones((1, bs, bs), np.float32)
        rowmap = np.array([1], np.int32)
        colidx = np.array([2], np.int32)
        b = np.ones((k, n), np.float32)
        out = np.asarray(
            bsr_spmm_pallas(
                jnp.asarray(rowmap), jnp.asarray(colidx),
                jnp.asarray(data), jnp.asarray(b),
                m=m, bs=bs, interpret=True,
            )
        )
        npt.assert_allclose(out[:8], 0.0)
        npt.assert_allclose(out[8:16], 8.0)
        npt.assert_allclose(out[16:], 0.0)


if __name__ == "__main__":
    unittest.main()
