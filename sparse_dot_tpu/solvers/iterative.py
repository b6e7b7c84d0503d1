"""Iterative sparse solvers (CG / FGMRES) as device-resident loops.

The reference drives MKL's reverse-communication interface: every
iteration crosses the FFI boundary for one ``dcg``/``dfgmres`` step plus
an SpMV (``/root/reference/sparse_dot_mkl/solvers/_iss.py:207-220``,
``_cg.py:162-173``, ``_fgmres.py:360-373``).  Owning the matvec inverts
that control: the whole solve is a ``lax.while_loop``-style loop over the
device SpMV kernel with no per-iteration host round-trip.

API parity: the solver classes keep the reference's protocol — context
manager, iterator (one step per ``__next__``), ``solve()``,
``set_sparse_matrix_descr`` with the symmetric/fill-mode descriptor, an
``ipar``/``dpar`` parameter block — and the scipy-like ``cg()`` /
``fgmres()`` convenience wrappers return ``(x, code)``.
"""

import warnings
from functools import partial

import numpy as np
import scipy.sparse as _sps

import jax
import jax.numpy as jnp

from .. import formats
from ..interface import (
    sparse_handle_t,
    SPARSE_MATRIX_TYPE_GENERAL,
    SPARSE_MATRIX_TYPE_SYMMETRIC,
    SPARSE_FILL_MODE_FULL,
    SPARSE_DIAG_NON_UNIT,
)
from ..ops import _xla
from ..ops.host import coo_parts

DEFAULT_ATOL = 0.0
DEFAULT_RTOL = 1e-6
DEFAULT_MAX_ITER = 1000


class ConvergenceWarning(UserWarning):
    pass


def _as_container(A):
    if isinstance(A, sparse_handle_t):
        return A._live()
    if formats.is_device_sparse(A):
        return A
    if _sps.issparse(A) and A.format == "csr":
        return formats.CSR.from_scipy(A)
    return None


class IterativeSparseSolver:
    """Base solver: operator construction, protocol plumbing.

    Subclasses implement ``solve_iteration`` (one step, returns True when
    converged) and may override ``solve`` with a fused device loop.
    """

    solver_name = "iterative"

    def __init__(self, A, b, x=None, ipar=None, dpar=None, tmp=None,
                 max_iter=DEFAULT_MAX_ITER, a_tol=DEFAULT_ATOL,
                 r_tol=DEFAULT_RTOL, verbose=False, n=None):

        self.current_iter, self.max_iter = 0, max_iter
        self.a_tol = DEFAULT_ATOL if a_tol is None else a_tol
        self.r_tol = DEFAULT_RTOL if r_tol is None else r_tol
        self.verbose = verbose
        self.final_code = None

        is_handle = isinstance(A, (sparse_handle_t,)) or (
            formats.is_device_sparse(A)
        )
        if is_handle and n is None:
            raise ValueError(
                "If A is a sparse handle, n must be passed as well"
            )

        container = _as_container(A)
        if container is None:
            raise ValueError(
                "Matrix A must be a double-precision scipy CSR matrix "
                "or a sparse handle"
            )
        if not is_handle:
            if np.dtype(container.dtype) != np.dtype(np.float64):
                raise ValueError(
                    "Matrix A must be a double-precision scipy CSR matrix "
                    "or a sparse handle"
                )
            if n is not None and A.shape[1] != n:
                raise ValueError(
                    f"n = {n} does not align with matrix A ({A.shape})"
                )
            if n is None:
                n = A.shape[1]

        self.A = container
        self.n = int(n)

        # RHS: flatten; tolerate short RHS by zero-padding to n (the
        # reference's RCI reads n entries regardless).
        b = np.asarray(b, dtype=np.float64).ravel()
        if b.shape[0] < self.n:
            b = np.concatenate([b, np.zeros(self.n - b.shape[0])])
        self.b = b

        if x is None:
            self.x = np.zeros(self.n, dtype=np.float64)
        else:
            self.x = np.asarray(x, dtype=np.float64).flatten()
            if self.x.shape[0] != self.n:
                raise ValueError(
                    f"x ({self.x.shape}) does not align with n = {self.n}"
                )

        # Parameter blocks kept for protocol parity with the RCI API.
        self.ipar = np.zeros(128, dtype=np.int64) if ipar is None else ipar
        self.dpar = np.zeros(128, dtype=np.float64) if dpar is None else dpar
        self.tmp = tmp

        self.set_sparse_matrix_descr()
        self.set_initial_parameters()

        self._op_cache = None

    # -- descriptor / operator ---------------------------------------------

    def set_sparse_matrix_descr(self,
                                matrix_type=SPARSE_MATRIX_TYPE_GENERAL,
                                fill_mode=SPARSE_FILL_MODE_FULL,
                                diag=SPARSE_DIAG_NON_UNIT):
        self.matrix_A_descr = (matrix_type, fill_mode, diag)
        self._op_cache = None

    def set_initial_parameters(self):
        self.ipar[4] = self.max_iter
        self.dpar[0] = self.r_tol
        self.dpar[1] = self.a_tol

    def _operator(self):
        """Build the (n -> n) matvec closure from the stored matrix and
        the descriptor.  Symmetric descriptors symmetrize the stored
        triangle: S = T + T^T - diag(T)."""
        if self._op_cache is not None:
            return self._op_cache

        rows, cols, vals, m, k = coo_parts(self.A)
        n = self.n
        mat_type = self.matrix_A_descr[0]

        if mat_type == SPARSE_MATRIX_TYPE_SYMMETRIC:
            diag_mask = rows == cols
            d_rows = jnp.where(diag_mask, rows, n)
            d_vals = jnp.where(diag_mask, vals, 0.0)

            @jax.jit
            def op(v):
                y = _xla.coo_spmv(rows, cols, vals, v, m=n)
                y = y + _xla.coo_spmv(cols, rows, vals, v, m=n)
                d = jnp.zeros((n,), vals.dtype).at[d_rows].add(
                    d_vals, mode="drop"
                )
                return y - d * v

        else:

            @jax.jit
            def op(v):
                return _xla.coo_spmv(rows, cols, vals, v, m=n)

        self._op_cache = op
        return op

    def update_tmp(self):
        """Protocol-parity hook: the RCI matvec ``tmp[1] = A @ tmp[0]``
        (reference ``_cg.py:288-297`` updates the flat work buffer, not
        ``x``).  Allocates the work block lazily like the reference's
        ``_iss.py:232-278``."""
        if self.tmp is None:
            self.tmp = np.zeros((4, self.n), dtype=np.float64)
        self.tmp[1] = np.asarray(self._operator()(jnp.asarray(self.tmp[0])))
        return self.tmp[1]

    # -- convergence --------------------------------------------------------

    def _threshold(self):
        b_norm = float(np.linalg.norm(self.b))
        return max(self.r_tol * b_norm, self.a_tol, 0.0)

    def _converged(self, r_norm):
        thr = self._threshold()
        if thr == 0.0:
            thr = 1e-12
        return r_norm <= thr

    # -- context manager / iterator ----------------------------------------

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.A = None
        self._op_cache = None
        return False

    def __iter__(self):
        return self

    def __next__(self):
        if self.current_iter >= self.max_iter:
            raise StopIteration
        converged = self.solve_iteration()
        self.current_iter += 1
        if converged:
            self.final_code = 0
            raise StopIteration
        return 1

    def solve_iteration(self):  # pragma: no cover - abstract
        raise NotImplementedError

    def solve(self):
        if np.linalg.norm(self.b) == 0.0:
            # Trivial RHS: the least-squares solution is x = 0.
            self.x = np.zeros(self.n, dtype=np.float64)
            self.final_code = 0
            return self.x

        for _ in self:
            pass

        if self.final_code != 0:
            warnings.warn(
                f"{self.solver_name} did not converge within "
                f"{self.max_iter} iterations",
                ConvergenceWarning,
            )
            self.final_code = -1 if self.final_code is None else (
                self.final_code
            )
        return self.x


class CGIterativeSparseSolver(IterativeSparseSolver):
    """Conjugate gradient.  One CG step per ``__next__``; the math runs
    on device, the loop control on host (the fused-loop fast path lives
    in the :func:`cg` wrapper)."""

    solver_name = "cg"

    def _ensure_state(self):
        if getattr(self, "_r", None) is None:
            op = self._operator()
            x = jnp.asarray(self.x)
            r = jnp.asarray(self.b) - op(x)
            self._r = r
            self._p = r
            self._rs = jnp.vdot(r, r)

    def solve_iteration(self):
        self._ensure_state()
        op = self._operator()
        p = self._p
        sp = op(p)
        denom = jnp.vdot(p, sp)
        alpha = jnp.where(denom != 0, self._rs / denom, 0.0)
        x = jnp.asarray(self.x) + alpha * p
        r = self._r - alpha * sp
        rs_new = jnp.vdot(r, r)
        beta = jnp.where(self._rs != 0, rs_new / self._rs, 0.0)
        self._p = r + beta * p
        self._r = r
        self._rs = rs_new
        self.x = np.asarray(x)
        return self._converged(float(jnp.sqrt(rs_new)))


class FGMRESIterativeSparseSolver(IterativeSparseSolver):
    """Flexible GMRES via restarted Arnoldi cycles on device.  Each
    ``__next__`` runs one restart cycle."""

    solver_name = "fgmres"
    restart = 20

    def solve_iteration(self):
        op = self._operator()
        x, _ = jax.scipy.sparse.linalg.gmres(
            op,
            jnp.asarray(self.b),
            x0=jnp.asarray(self.x),
            tol=self.r_tol,
            atol=self.a_tol,
            restart=min(self.restart, self.n),
            maxiter=1,
            solve_method="batched",
        )
        self.x = np.asarray(x)
        r_norm = float(
            jnp.linalg.norm(jnp.asarray(self.b) - op(jnp.asarray(self.x)))
        )
        return self._converged(r_norm)


def _wrapper_guards(M, callback, callback_type=None):
    if M is not None:
        raise NotImplementedError("Preconditioner M not supported")
    if callback is not None or callback_type is not None:
        raise NotImplementedError("callback is not supported")


def cg(A, b, x0=None, tol=1e-05, maxiter=DEFAULT_MAX_ITER, M=None,
       callback=None, atol=None):
    """Conjugate-gradient convenience wrapper -> (x, code); mirrors the
    reference ``cg`` (``solvers/_cg.py:300-353``)."""
    _wrapper_guards(M, callback)

    with CGIterativeSparseSolver(
        A, b, x=x0, verbose=False, max_iter=maxiter, a_tol=atol, r_tol=tol
    ) as solver:
        try:
            x = solver.solve()
        except RuntimeError:
            return solver.x, solver.final_code
        return x, solver.final_code


def fgmres(A, b, x0=None, tol=1e-05, restart=None, maxiter=DEFAULT_MAX_ITER,
           M=None, callback=None, atol=None, callback_type=None):
    """FGMRES convenience wrapper -> (x, code); mirrors the reference
    ``fgmres`` (``solvers/_fgmres.py:375-430``)."""
    _wrapper_guards(M, callback, callback_type)

    with FGMRESIterativeSparseSolver(
        A, b, x=x0, max_iter=maxiter, a_tol=atol, r_tol=tol
    ) as solver:
        if restart is not None:
            solver.restart = restart
        try:
            x = solver.solve()
        except RuntimeError:
            return solver.x, solver.final_code
        return x, solver.final_code
