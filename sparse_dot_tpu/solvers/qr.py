"""Sparse QR least-squares solver.

TPU-native replacement for the reference's MKL multifrontal sparse QR
(``/root/reference/sparse_dot_mkl/_sparse_qr_solver.py``): solve
min ||AX - B|| for sparse A (CSR required; CSC accepted with
``cast=True``), dense B, float32/float64 only.

Where MKL runs reorder -> factorize -> solve phases on pointer-chasing
frontal matrices, the TPU path uses a dense blocked Householder QR on the
MXU: A is densified on device (sparse structure does not help the MXU at
these aspect ratios — the QR flops are effectively free next to the
memory traffic) and ``R x = Q^T b`` is solved with a triangular solve.
For matrices too large to densify, an LSMR-style iterative path over the
SpMV kernel is the intended route (see ``parallel`` for the sharded
version).
"""

import numpy as np

import jax.numpy as jnp
import jax

from .. import formats
from ..policy import (
    type_check,
    precision_flags,
    get_dense_layout,
    LAYOUT_C,
)
from ..ops import _xla
from ..ops.host import coo_parts


@jax.jit
def _qr_lstsq(a_dense, b):
    q, r = jnp.linalg.qr(a_dense, mode="reduced")
    qtb = jnp.dot(q.T, b, precision=jax.lax.Precision.HIGHEST)
    return jax.scipy.linalg.solve_triangular(r, qtb, lower=False)


def _sparse_qr(matrix_a, matrix_b):
    A = formats.to_device(matrix_a)
    rows, cols, vals, m, n = coo_parts(A)
    a_dense = _xla.densify(rows, cols, vals, (m, n))
    b_dev = jnp.asarray(np.asarray(matrix_b))
    x = np.asarray(_qr_lstsq(a_dense, b_dev))

    layout_b, _ = get_dense_layout(matrix_b)
    if layout_b == LAYOUT_C:
        return np.ascontiguousarray(x)
    return np.asfortranarray(x)


def sparse_qr_solver(matrix_a, matrix_b, cast=False):
    """Solve AX = B in the least-squares sense; mirrors the reference's
    guards (``_sparse_qr_solver.py:110-163``): CSC requires cast=True,
    only CSR/CSC sparse accepted, shapes must align, complex rejected."""

    if formats.is_csc(matrix_a) and not cast:
        raise ValueError(
            "sparse_qr_solver only accepts CSR matrices if cast=False"
        )
    if not (formats.is_csc(matrix_a) or formats.is_csr(matrix_a)):
        raise ValueError(
            "sparse_qr_solver requires matrix A to be CSR or CSC sparse "
            "matrix"
        )
    if matrix_a.shape[0] != matrix_b.shape[0]:
        raise ValueError(
            f"Bad matrix shapes for AX=B solver: "
            f"A {matrix_a.shape} & B {matrix_b.shape}"
        )

    matrix_a, matrix_b = type_check(
        matrix_a, matrix_b, cast=cast, allow_complex=False
    )

    dbl, _ = precision_flags(matrix_a)

    b_2d = matrix_b if matrix_b.ndim == 2 else matrix_b.reshape(-1, 1)
    x = _sparse_qr(matrix_a, b_2d)
    x = x.astype(np.float64 if dbl else np.float32, copy=False)
    return x if matrix_b.ndim == 2 else x.ravel()
