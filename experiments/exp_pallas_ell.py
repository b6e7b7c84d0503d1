"""Pallas ELL SpMM prototype: B resident in VMEM, per-step
take_along_axis gather (tpu.dynamic_gather).  f32 first."""
import time
from functools import partial
import numpy as np
import scipy.sparse as sps
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

COLS_BLK = 8


def _kernel_f32(cols_ref, vals_ref, b_ref, o_ref):
    r = pl.program_id(0)

    @pl.when(r == 0)
    def _():
        o_ref[...] = jnp.zeros_like(o_ref)

    M, n = o_ref.shape
    acc = o_ref[...]
    for i in range(COLS_BLK):
        idx = jnp.broadcast_to(cols_ref[:, i][:, None], (M, n))
        g = jnp.take_along_axis(b_ref[...], idx, axis=0,
                                mode="promise_in_bounds")
        acc = acc + vals_ref[:, i][:, None] * g
    o_ref[...] = acc


@partial(jax.jit, static_argnames=("interpret",))
def ell_spmm_pallas_f32(cols_ell, vals_ell, b, interpret=False):
    M, rmax = cols_ell.shape
    Mb, n = b.shape
    assert Mb == M
    grid = (rmax // COLS_BLK,)
    return pl.pallas_call(
        _kernel_f32,
        grid=grid,
        in_specs=[
            pl.BlockSpec((M, COLS_BLK), lambda r: (0, r),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((M, COLS_BLK), lambda r: (0, r),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((M, n), lambda r: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((M, n), lambda r: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, n), jnp.float32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * rmax * n,
            bytes_accessed=M * rmax * 8 + M * n * 8,
            transcendentals=0,
        ),
    )(cols_ell, vals_ell, b)


def main():
    x = jnp.ones((8,))
    float(x.sum())

    rng = np.random.default_rng(0)
    m = k = 10000
    n = 128
    Asp = sps.random(m, k, density=0.01, format="csr",
                     dtype=np.float32, random_state=101)
    bnp = rng.random((k, n)).astype(np.float32)

    # plain ELL layout padded to M multiple of 8 rows, rmax mult of 8
    row_nnz = np.diff(Asp.indptr)
    rmax = int(((row_nnz.max() + COLS_BLK - 1) // COLS_BLK) * COLS_BLK)
    M = ((max(m, k) + 7) // 8) * 8
    cols = np.zeros((M, rmax), np.int32)
    vals = np.zeros((M, rmax), np.float32)
    for i in range(m):
        lo, hi = Asp.indptr[i], Asp.indptr[i + 1]
        cols[i, : hi - lo] = Asp.indices[lo:hi]
        vals[i, : hi - lo] = Asp.data[lo:hi]
    b_pad = np.zeros((M, n), np.float32)
    b_pad[:k] = bnp

    cols_d = jnp.asarray(cols)
    vals_d = jnp.asarray(vals)
    b_d = jnp.asarray(b_pad)

    out = ell_spmm_pallas_f32(cols_d, vals_d, b_d)
    oracle = Asp @ bnp
    err = np.abs(np.asarray(out)[:m] - oracle).max()
    rel = err / np.abs(oracle).max()
    print(f"f32 err={err:.2e} rel={rel:.2e}", flush=True)

    def pipelined(fn, reps=8):
        def run_all():
            return float(jnp.stack(
                [fn().sum() for _ in range(reps)]).sum())
        run_all()
        run_all()
        t0 = time.perf_counter()
        run_all()
        return (time.perf_counter() - t0) * 1e3 / reps

    t = pipelined(lambda: ell_spmm_pallas_f32(cols_d, vals_d, b_d))
    print(f"pallas_ell_f32_ms={t:.3f}", flush=True)
    print(f"(gather-traffic-model SoL: "
          f"{(Asp.nnz * n * 4 + m * n * 4 + Asp.nnz * 8) / 724e9 * 1e3:.3f}"
          f" ms)", flush=True)


if __name__ == "__main__":
    main()
