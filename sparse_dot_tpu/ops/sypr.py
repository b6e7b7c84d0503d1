"""Symmetric triple products: AᵀBA and ABAᵀ (sypr).

The reference ships an aspirational driver for MKL's ``mkl_sparse_sypr``
that is dead code — ``_sparse_sypr.py`` is imported nowhere and the
symbols it calls are never bound (``/root/reference/sparse_dot_mkl/
_sparse_sypr.py``; see SURVEY.md §2a item 8).  Here the op works: the
triple product is two chained products on device, with the upper
triangle returned to match syrk-family conventions.
"""

import numpy as np

from .. import formats
from ..policy import (
    type_check,
    precision_flags,
    OUTPUT_DTYPES,
)
from . import host as _host


def sypr(matrix_a, matrix_b, transpose=False, cast=False, dense=False):
    """Compute triu(Aᵀ B A) (or triu(A B Aᵀ) with ``transpose=True``)
    for sparse A and sparse symmetric B.

    Parameters mirror the reference driver's intent
    (``_sparse_sypr.py:136-181``): CSR/BSR A, CSR/BSR B, optional dtype
    cast, sparse (CSR) or dense output.
    """
    if not (formats.is_csr(matrix_a) or formats.is_bsr(matrix_a)):
        raise ValueError("sypr requires matrix A in CSR or BSR format")
    if not (formats.is_csr(matrix_b) or formats.is_bsr(matrix_b)):
        raise ValueError("sypr requires matrix B in CSR or BSR format")

    matrix_a, matrix_b = type_check(matrix_a, matrix_b, cast=cast)

    dbl, cplx = precision_flags(matrix_a)
    out_dtype = np.dtype(OUTPUT_DTYPES[(dbl, cplx)])

    A = formats.to_device(matrix_a)
    B = formats.to_device(matrix_b)

    if transpose:
        # A B Aᵀ : (m x k)(k x k)(k x m) -> m x m
        if A.shape[1] != B.shape[0] or B.shape[1] != A.shape[1]:
            raise ValueError(
                f"Bad shapes for A B Aᵀ: A {A.shape}, B {B.shape}"
            )
        inner = _host.spgemm_dense(B, A.T, out_dtype)  # k x m
    else:
        # Aᵀ B A : (k x m)(m x m)(m x k) -> k x k
        if B.shape[0] != A.shape[0] or B.shape[1] != A.shape[0]:
            raise ValueError(
                f"Bad shapes for Aᵀ B A: A {A.shape}, B {B.shape}"
            )
        inner = _host.spgemm_dense(B, A, out_dtype)  # m x k

    first = A if transpose else A.T
    res = _host.spmm(first, inner, out_dtype)
    res = np.triu(res)

    if dense:
        return res

    import scipy.sparse as sps

    return sps.csr_matrix(res)
