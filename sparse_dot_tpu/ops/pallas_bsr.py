"""Pallas TPU kernel: block-sparse (BSR) SpMM on the MXU.

The flagship hand-written kernel replacing MKL's ``mkl_sparse_?_mm`` for
block matrices (``/root/reference/sparse_dot_mkl/_mkl_interface/
_cfunctions.py:97-100``).  Strategy (megablox-style):

* grid = (N-panels, nonzero blocks); the kernel visits every stored
  block once per output column panel,
* block coordinates are **scalar-prefetched** (``PrefetchScalarGridSpec``)
  so the BlockSpec index maps can steer the automatic DMA pipeline:
  the A-block spec walks the stored blocks, the B spec fetches the
  panel at the block's column, and the C spec maps to the block's row —
  consecutive blocks in one block-row revisit the same C tile, which
  Pallas keeps resident in VMEM while the accumulation runs,
* each visit is one ``bs x bs @ bs x panel`` MXU matmul accumulated in
  float32.

Constraints: float32 data, square blocks with ``bs % 8 == 0`` (sublane
aligned; bs >= 128 saturates the MXU), B padded to a 128-column panel.
Rows with no stored blocks are zero-filled afterwards (Pallas outputs
are otherwise uninitialized).
"""

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N_PANEL = 128


def _kernel(rowmap_ref, colidx_ref, a_ref, b_ref, o_ref):
    p = pl.program_id(1)
    row = rowmap_ref[p]
    prev_row = rowmap_ref[jnp.maximum(p - 1, 0)]
    is_first = jnp.logical_or(p == 0, prev_row != row)

    @pl.when(is_first)
    def _():
        o_ref[...] = jnp.zeros_like(o_ref)

    # HIGHEST: 3-pass bf16 product. One-pass bf16 gives ~1e-3 relative
    # error, failing the reference suite's decimal=5 f32 tolerance.
    o_ref[...] += jnp.dot(
        a_ref[0], b_ref[...], preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


@functools.partial(
    jax.jit, static_argnames=("m", "bs", "interpret")
)
def bsr_spmm_pallas(rowmap, colidx, data, b, m, bs, interpret=False,
                    alpha=None, beta=None, c0=None):
    """C = alpha * A @ b + beta * c0 for BSR A with f32 data.

    rowmap : (nblocks,) int32 — block-row id of each stored block,
             sorted ascending (CSR block order).
    colidx : (nblocks,) int32 — block-column ids.
    data   : (nblocks, bs, bs) float32.
    b      : (k, n) float32 with n % 128 == 0.
    alpha/beta/c0 : optional accumulate epilogue, fused into the same
    XLA program as the Pallas call (one dispatch, no host round trip).
    """
    nblocks = data.shape[0]
    k, n = b.shape

    grid = (n // N_PANEL, nblocks)

    # Index maps must return int32: with jax_enable_x64 on (this
    # package enables it) Python int literals trace as i64 and Mosaic
    # refuses to legalize the (i32, i64, i64) index-map signature.
    _zero = np.int32(0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, bs, bs), lambda j, p, rowmap, colidx: (p, _zero, _zero)
            ),
            pl.BlockSpec(
                (bs, N_PANEL), lambda j, p, rowmap, colidx: (colidx[p], j)
            ),
        ],
        out_specs=pl.BlockSpec(
            (bs, N_PANEL), lambda j, p, rowmap, colidx: (rowmap[p], j)
        ),
    )

    out = pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * nblocks * bs * bs * n,
            bytes_accessed=(
                nblocks * bs * bs * 4 + k * n * 4 + m * n * 4
            ),
            transcendentals=0,
        ),
    )(rowmap, colidx, data, b)

    # Zero block-rows with no stored blocks (their tiles were never
    # visited).  One scatter of ones per stored block row.
    nrows = m // bs
    visited = jnp.zeros((nrows,), jnp.bool_).at[rowmap].set(
        True, mode="drop"
    )
    # where (not *): unvisited tiles hold uninitialized data, possibly
    # NaN, and NaN * 0 stays NaN.
    c = jnp.where(jnp.repeat(visited, bs)[:, None], out, 0.0)
    if alpha is not None:
        c = c * jnp.asarray(alpha, c.dtype)
    if c0 is not None:
        c = c + jnp.asarray(beta, c.dtype) * c0
    return c

