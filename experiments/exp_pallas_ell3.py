"""Compile-time / runtime scaling of the pallas_ell kernel in M (the
padded lane dimension).  The 10240-lane compile appeared to wedge the
remote compile helper; this sweep finds the practical ceiling."""
import sys
import time

import numpy as np
import scipy.sparse as sps
import jax
import jax.numpy as jnp

from sparse_dot_tpu.ops import pallas_ell


def log(s):
    print(time.strftime("%H:%M:%S"), s, flush=True)


def pipelined(fn, reps=8):
    def run_all():
        return float(jnp.stack([fn().sum() for _ in range(reps)]).sum())
    run_all(); run_all()
    t0 = time.perf_counter()
    run_all()
    return (time.perf_counter() - t0) * 1e3 / reps


def one(mk, dtype):
    n = 128
    A = sps.random(mk, mk, density=0.01, format="csr", dtype=np.float64,
                   random_state=101)
    rng = np.random.default_rng(0)
    b = rng.standard_normal((mk, n))
    row_nnz = np.diff(A.indptr)
    rmax = max(int(row_nnz.max()), 1)
    cols = np.zeros((mk, rmax), np.int32)
    vals = np.zeros((mk, rmax))
    for i in range(mk):
        lo, hi = A.indptr[i], A.indptr[i + 1]
        cols[i, : hi - lo] = A.indices[lo:hi]
        vals[i, : hi - lo] = A.data[lo:hi]
    cols_d = jnp.asarray(cols)
    vals_d = jnp.asarray(vals.astype(dtype))
    b_d = jnp.asarray(b.astype(dtype))
    oracle = A @ b
    t0 = time.time()
    out = np.asarray(pallas_ell.ell_spmm_pallas(cols_d, vals_d, b_d,
                                                m=mk))
    dt = time.time() - t0
    rel = np.abs(out - oracle).max() / np.abs(oracle).max()
    t = pipelined(lambda: pallas_ell.ell_spmm_pallas(
        cols_d, vals_d, b_d, m=mk))
    log(f"M={mk} {np.dtype(dtype).name}: compile+first={dt:.0f}s "
        f"rel={rel:.2e} t={t:.3f} ms (nnz={A.nnz}, rmax={rmax})")


def main():
    x = jnp.ones((8,))
    float(x.sum())
    log("warm")
    sizes = [int(s) for s in sys.argv[1:]] or [2048, 4096]
    for mk in sizes:
        one(mk, np.float32)
        one(mk, np.float64)


if __name__ == "__main__":
    main()
