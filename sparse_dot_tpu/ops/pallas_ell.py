"""Pallas TPU kernel: ELL (padded-row) CSR SpMM with B resident in VMEM.

The flagship CSR kernel replacing MKL's ``mkl_sparse_?_mm``
(``/root/reference/sparse_dot_mkl/_mkl_interface/_cfunctions.py:97-100``)
in the low-density regime, where the XLA gather path is HBM-bound on
re-reading B rows.  Strategy:

* everything runs TRANSPOSED: the matrix dimension (m = k = M after
  padding) lies along the 128-wide LANES, because Mosaic's
  ``dynamic_gather`` only lowers the lane-dim (dim 1) form on this
  toolchain (the sublane form fails to compile), and the gather's
  operand/index/output shapes must match exactly,
* B^T is loaded into VMEM ONCE and revisited across the whole grid —
  its HBM traffic drops from ``nnz * n`` gathered bytes to ``k * n``,
* the ELL slots stream through as (CB, M) tiles of the transposed
  padded layout, pipelined by Pallas against the compute,
* each slot is one lane-gather (``C^T[:, i] += vals[r, i] *
  B^T[:, cols[r, i]]`` vectorized over all M lanes) + VPU
  multiply-accumulate; no scatter anywhere,
* float64 runs the same structure on exact double-float32 channels
  (Dekker two-product + Knuth two-sum — Mosaic has no f64): error is
  O(2^-44) relative per term, far inside the library's decimal=6
  contract, while all traffic stays pure f32.  The hi|lo accumulator
  pair is packed into ONE output block (hi rows stacked above lo rows)
  so the grid revisit accumulates a single ref.

Interpret-mode caveat: under ``interpret=True`` the df64 error-free
transforms lose their low-order bits (the interpreter's XLA CPU
execution differs bitwise from Mosaic), so CPU tests only assert ~f32
accuracy for the f64 kernel; the df64 exactness claim is validated on
hardware by ``tpu_smoke``.
"""

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import ozaki as _ozaki

CB = 8          # ELL slots per grid step (sublane dim of the stream)
NP = 128        # output rows (n) per grid panel, f32
NP64 = 64       # output rows per panel, f64 (hi|lo doubles the block)
VMEM_BUDGET = 100 * 1024 * 1024
B_VMEM_BYTES = 12 * 1024 * 1024  # gate: resident-B^T + accumulator budget

_DN1 = lax.GatherDimensionNumbers(
    offset_dims=(), collapsed_slice_dims=(1,), start_index_map=(1,),
    operand_batching_dims=(0,), start_indices_batching_dims=(0,),
)


def _gather_lanes(table, idx):
    """out[r, c] = table[r, idx[r, c]] — the Mosaic lane-dim
    ``dynamic_gather``.  Direct ``lax.gather`` with int32 indices
    (``jnp.take_along_axis`` force-converts indices to int64 under
    x64, which Mosaic rejects)."""
    return lax.gather(
        table, idx[..., None], _DN1, slice_sizes=(1, 1),
        mode=lax.GatherScatterMode.PROMISE_IN_BOUNDS,
    )


# ---------------------------------------------------------------------------
# float32
# ---------------------------------------------------------------------------


def _kernel_f32(colsT_ref, valsT_ref, bt_ref, o_ref):
    s = pl.program_id(1)

    @pl.when(s == 0)
    def _():
        o_ref[...] = jnp.zeros_like(o_ref)

    np_, M = o_ref.shape
    acc = o_ref[...]
    bt = bt_ref[...]
    for i in range(CB):
        idx = jnp.broadcast_to(colsT_ref[i, :][None, :], (np_, M))
        g = _gather_lanes(bt, idx)
        acc = acc + valsT_ref[i, :][None, :] * g
    o_ref[...] = acc


@functools.partial(jax.jit, static_argnames=("interpret",))
def _ell_spmm_pallas_f32(colsT, valsT, bt, interpret=False):
    rmax, M = colsT.shape
    n, _ = bt.shape
    grid = (n // NP, rmax // CB)
    return pl.pallas_call(
        _kernel_f32,
        grid=grid,
        in_specs=[
            pl.BlockSpec((CB, M), lambda j, s: (s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((CB, M), lambda j, s: (s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((NP, M), lambda j, s: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((NP, M), lambda j, s: (j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, M), jnp.float32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_BUDGET,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * rmax * n,
            bytes_accessed=M * rmax * 8 + n * M * 8,
            transcendentals=0,
        ),
    )(colsT, valsT, bt)


# ---------------------------------------------------------------------------
# float64 as exact double-float32 (Dekker / Knuth error-free transforms)
# ---------------------------------------------------------------------------


def _two_sum(a, b):
    s = a + b
    bb = s - a
    return s, (a - (s - bb)) + (b - bb)


def _split(a):
    # Veltkamp split at 2^12 + 1 (f32 has 24 mantissa bits).
    c = a * 4097.0
    hi = c - (c - a)
    return hi, a - hi


def _two_prod(a, b):
    p = a * b
    ah, al = _split(a)
    bh, bl = _split(b)
    err = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, err


def _df64_acc(sh, sl, ah, al, bh, bl):
    """(sh, sl) += (ah, al) * (bh, bl), all element-wise f32 pairs."""
    p, e = _two_prod(ah, bh)
    e = e + (ah * bl + al * bh)
    h, l = _two_sum(sh, p)
    l = l + sl + e
    return h, l


def _kernel_f64(colsT_ref, vh_ref, vl_ref, bth_ref, btl_ref, o_ref):
    s = pl.program_id(1)

    @pl.when(s == 0)
    def _():
        o_ref[...] = jnp.zeros_like(o_ref)

    np2, M = o_ref.shape
    np_ = np2 // 2
    acc = o_ref[...]
    sh = acc[:np_]
    sl = acc[np_:]
    bth = bth_ref[...]
    btl = btl_ref[...]
    for i in range(CB):
        idx = jnp.broadcast_to(colsT_ref[i, :][None, :], (np_, M))
        gh = _gather_lanes(bth, idx)
        gl = _gather_lanes(btl, idx)
        vh = vh_ref[i, :][None, :]
        vl = vl_ref[i, :][None, :]
        sh, sl = _df64_acc(sh, sl, vh, vl, gh, gl)
    o_ref[...] = jnp.concatenate([sh, sl], axis=0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _ell_spmm_pallas_f64(colsT, vals_hi, vals_lo, bt_hi, bt_lo,
                         interpret=False):
    rmax, M = colsT.shape
    n, _ = bt_hi.shape
    grid = (n // NP64, rmax // CB)
    out = pl.pallas_call(
        _kernel_f64,
        grid=grid,
        in_specs=[
            pl.BlockSpec((CB, M), lambda j, s: (s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((CB, M), lambda j, s: (s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((CB, M), lambda j, s: (s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((NP64, M), lambda j, s: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((NP64, M), lambda j, s: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((2 * NP64, M), lambda j, s: (j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2 * n, M), jnp.float32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_BUDGET,
        ),
        cost_estimate=pl.CostEstimate(
            flops=30 * M * rmax * n,
            bytes_accessed=M * rmax * 12 + 2 * n * M * 8,
            transcendentals=0,
        ),
    )(colsT, vals_hi, vals_lo, bt_hi, bt_lo)
    # panels are (hi; lo) stacked: rows [2j*NP64, 2j*NP64+NP64) hold hi.
    panels = out.reshape(-1, 2, NP64, M)
    hi = panels[:, 0].reshape(n, M)
    lo = panels[:, 1].reshape(n, M)
    return hi.astype(jnp.float64) + lo.astype(jnp.float64)


# ---------------------------------------------------------------------------
# host wrapper + gate
# ---------------------------------------------------------------------------


def _pad_to(x, mult, axis, value=0):
    size = x.shape[axis]
    pad = (-size) % mult
    if not pad:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


@functools.partial(jax.jit, static_argnames=("M", "n_pad", "f64"))
def _prepare(cols_ell, vals_ell, b, M, n_pad, f64):
    """Transpose + pad the ELL arrays and B for the lane formulation."""
    colsT = _pad_to(_pad_to(cols_ell.T.astype(jnp.int32), CB, 0), M, 1)
    valsT = _pad_to(_pad_to(vals_ell.T, CB, 0), M, 1)
    bt = _pad_to(_pad_to(b.T, n_pad, 0), M, 1)
    if f64:
        vh, vl = _ozaki.hilo(valsT)
        bh, bl = _ozaki.hilo(bt)
        return colsT, (vh, vl), (bh, bl)
    return colsT, (valsT.astype(jnp.float32),), (bt.astype(jnp.float32),)


def ell_spmm_pallas(cols_ell, vals_ell, b, m, interpret=False):
    """C = A @ b (m x n) from the ELL layout via the Pallas kernel.

    ``cols_ell``/``vals_ell``: (m_pad0, rmax) from ``CSR.ell_parts``
    (padded slots col 0 / value 0).  Handles all shape padding; slices
    the result back to ``m`` rows and ``b``'s true column count.
    """
    k, n0 = b.shape
    f64 = vals_ell.dtype == jnp.float64
    n_pad = NP64 if f64 else NP
    M = max(cols_ell.shape[0], k)
    M = M + ((-M) % 128)
    colsT, vparts, bparts = _prepare(
        cols_ell, vals_ell, b, M=M, n_pad=n_pad, f64=f64
    )
    if f64:
        out = _ell_spmm_pallas_f64(colsT, *vparts, *bparts,
                                   interpret=interpret)
    else:
        out = _ell_spmm_pallas_f32(colsT, *vparts, *bparts,
                                   interpret=interpret)
    return out.T[:m, :n0]


def ell_pallas_available(dtype, m, k, n):
    """Does the resident-B^T budget admit this operand pair?"""
    dt = np.dtype(dtype)
    if dt not in (np.dtype(np.float32), np.dtype(np.float64)):
        return False
    M = max(m, k)
    M = M + ((-M) % 128)
    if dt == np.dtype(np.float64):
        # hi+lo tables (NP64, M) x2 + packed accumulator (2*NP64, M).
        resident = 4 * NP64 * M * 4
    else:
        resident = 2 * NP * M * 4
    # plus the streamed (CB, M) cols/vals tiles (double-buffered)
    resident += 6 * CB * M * 4
    return resident <= B_VMEM_BYTES
