"""Handle-layer parity API.

The reference exposes an internal handle layer that its tests (and some
downstream users) exercise directly: ``_create_mkl_sparse`` /
``_export_mkl`` / ``_convert_to_csr`` / ``_order_mkl_handle`` /
``_destroy_mkl_handle`` plus matrix-descriptor enums
(``/root/reference/sparse_dot_mkl/_mkl_interface/_common.py:245-722``,
``_constants.py``).  Under JAX there is no handle lifecycle — but the
*protocol* is still useful (and keeps drop-in parity), so this module
provides the same surface over device containers:

* a handle is a thin mutable box around an immutable device container,
* "export" rebuilds a scipy object from the container's arrays,
* "convert"/"order" produce new containers via device kernels,
* "destroy" just empties the box (and validates it was live, matching
  the reference's error behavior on empty handles).
"""

import numpy as np
import scipy.sparse as _sps

import jax.numpy as jnp

from . import formats
from .config import config
from .ops import _xla
from .policy import precision_flags

# Matrix-descriptor enums (analog of _constants.py:31-53; values are our
# own — they are symbolic, never ABI).
SPARSE_MATRIX_TYPE_GENERAL = 20
SPARSE_MATRIX_TYPE_SYMMETRIC = 21
SPARSE_MATRIX_TYPE_HERMITIAN = 22
SPARSE_MATRIX_TYPE_TRIANGULAR = 23
SPARSE_MATRIX_TYPE_DIAGONAL = 24

SPARSE_FILL_MODE_LOWER = 40
SPARSE_FILL_MODE_UPPER = 41
SPARSE_FILL_MODE_FULL = 42

SPARSE_DIAG_NON_UNIT = 50
SPARSE_DIAG_UNIT = 51

SPARSE_OPERATION_NON_TRANSPOSE = 10
SPARSE_OPERATION_TRANSPOSE = 11
SPARSE_OPERATION_CONJUGATE_TRANSPOSE = 12


class matrix_descr:
    """Sparse matrix descriptor (analog of ``_structs.py:13-30``)."""

    def __init__(self, sparse_matrix_type_t=SPARSE_MATRIX_TYPE_GENERAL,
                 sparse_fill_mode_t=0, sparse_diag_type_t=0):
        self.sparse_matrix_type_t = sparse_matrix_type_t
        self.sparse_fill_mode_t = sparse_fill_mode_t
        self.sparse_diag_type_t = sparse_diag_type_t


class sparse_handle_t:
    """Mutable box around a device sparse container.

    An empty handle (no container) raises on use, mirroring the
    reference's empty ``sparse_matrix_t`` errors
    (``tests/test_mkl.py:124-137``)."""

    def __init__(self, container=None):
        self.container = container

    def _live(self):
        if self.container is None:
            raise ValueError("Empty sparse handle cannot be used")
        return self.container


def create_sparse_handle(matrix):
    """scipy CSR/CSC/BSR -> (handle, double_precision, complex_type).

    Analog of ``_create_mkl_sparse`` (``_common.py:245-293``): rejects
    COO and non-float dtypes with ValueError.
    """
    if formats.is_device_sparse(matrix):
        container = matrix
    else:
        container = formats.to_device(matrix)
    dbl, cplx = precision_flags(container)
    return sparse_handle_t(container), dbl, cplx


def export_sparse_handle(handle, double_precision=None, complex_type=False,
                         output_type="csr_matrix"):
    """Handle -> scipy object of the requested class.

    Analog of ``_export_mkl`` (``_common.py:387-609``); raises ValueError
    for unknown output types or empty handles.
    """
    container = handle._live() if isinstance(handle, sparse_handle_t) else (
        handle
    )
    if output_type not in formats._scipy_output_types:
        raise ValueError(
            f"Only CSR, CSC, and BSR output types are supported; "
            f"{output_type} provided"
        )
    constructor = formats._scipy_output_types[output_type]
    fmt = output_type.split("_")[0]

    if container.format == fmt:
        return container.to_scipy(constructor)

    # Cross-format export: round-trip through scipy conversion on host.
    native = container.to_scipy()
    return constructor(getattr(native, "to" + fmt)())


def convert_to_csr(handle, destroy_original=False):
    """CSC/BSR/CSR handle -> CSR handle, converted on device
    (``mkl_sparse_convert_csr`` analog, ``_common.py:695-722``)."""
    container = handle._live()
    new = convert_container_to_csr(container)
    if destroy_original:
        destroy_sparse_handle(handle)
    return sparse_handle_t(new)


def convert_container_to_csr(container):
    if isinstance(container, formats.CSR):
        return container
    from .ops.host import coo_parts

    if container.planar:
        # Planar complex: sort real and imag passes with the shared
        # pattern; the sort permutation is identical for both.
        rows, cols, vr, m, k = coo_parts(container, data=container.data[0])
        re, idx, indptr = _xla.coo_to_csr_arrays(rows, cols, vr, m)
        _, _, vi, _, _ = coo_parts(container, data=container.data[1])
        im, _, _ = _xla.coo_to_csr_arrays(rows, cols, vi, m)
        data = jnp.stack([re, im])
        return formats.CSR(data, idx.astype(np.dtype(config.index_dtype)),
                           indptr.astype(np.dtype(config.index_dtype)),
                           (m, k), dtype=container.dtype, planar=True)

    rows, cols, vals, m, k = coo_parts(container)
    data, idx, indptr = _xla.coo_to_csr_arrays(rows, cols, vals, m)
    return formats.CSR(
        data,
        idx.astype(np.dtype(config.index_dtype)),
        indptr.astype(np.dtype(config.index_dtype)),
        (m, k),
        dtype=container.dtype,
    )


def order_sparse_handle(handle):
    """Sort column indices within each row on device
    (``mkl_sparse_order`` analog, ``_common.py:683-692``)."""
    container = handle._live()
    if not isinstance(container, formats.CSR):
        raise ValueError("order is only supported for CSR handles")
    if container.planar:
        raise ValueError("order is not supported for planar storage")
    rows = container.row_indices()
    cols, vals = _xla.sort_csr_indices(
        rows, container.indices, container.data, container.shape[1]
    )
    handle.container = container.with_data(vals)
    handle.container.indices = cols
    return handle


def destroy_sparse_handle(handle):
    """Empty the handle box (``mkl_sparse_destroy`` analog).  Raises on
    an already-empty handle like the reference does."""
    if not isinstance(handle, sparse_handle_t) or handle.container is None:
        raise ValueError("Empty sparse handle cannot be destroyed")
    handle.container = None
    return handle


def matmul_handles(handle_a, handle_b):
    """SpGEMM of two handles -> new CSR-container handle
    (``_matmul_mkl`` analog, ``_sparse_sparse.py:21-44``): raises
    ValueError on empty handles or misaligned shapes."""
    a = handle_a._live()
    b = handle_b._live()
    if a.shape[1] != b.shape[0]:
        raise ValueError(
            f"Matrix alignment error: {a.shape} * {b.shape} is not valid"
        )
    from .ops.host import spgemm_sparse_arrays
    from .policy import output_dtype

    out_dtype = output_dtype(a, b)
    data, indices, indptr = spgemm_sparse_arrays(a, b, out_dtype)
    csr = _sps.csr_matrix(
        (data, indices, indptr), shape=(a.shape[0], b.shape[1])
    )
    return sparse_handle_t(formats.CSR.from_scipy(csr))
