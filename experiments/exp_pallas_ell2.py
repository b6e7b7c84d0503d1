"""Time the production pallas_ell module on hardware at BASELINE
config-1 scale (10k x 10k @ 1%, n=128), f32 and f64, against the XLA
binned path and the SoL model."""
import time
import numpy as np
import scipy.sparse as sps
import jax
import jax.numpy as jnp

from sparse_dot_tpu.ops import pallas_ell


def pipelined(fn, reps=8):
    def run_all():
        return float(jnp.stack([fn().sum() for _ in range(reps)]).sum())
    run_all(); run_all()
    t0 = time.perf_counter()
    run_all()
    return (time.perf_counter() - t0) * 1e3 / reps


def main():
    x = jnp.ones((8,)); float(x.sum())
    rng = np.random.default_rng(0)
    m = k = 10000
    n = 128
    A64 = sps.random(m, k, density=0.01, format="csr", dtype=np.float64,
                     random_state=101)
    b64 = rng.standard_normal((k, n))

    row_nnz = np.diff(A64.indptr)
    rmax = int(row_nnz.max())
    cols = np.zeros((m, rmax), np.int32)
    vals = np.zeros((m, rmax))
    for i in range(m):
        lo, hi = A64.indptr[i], A64.indptr[i + 1]
        cols[i, : hi - lo] = A64.indices[lo:hi]
        vals[i, : hi - lo] = A64.data[lo:hi]

    cols_d = jnp.asarray(cols)
    oracle = A64 @ b64

    for dtype, dec in ((np.float32, None), (np.float64, None)):
        vals_d = jnp.asarray(vals.astype(dtype))
        b_d = jnp.asarray(b64.astype(dtype))
        t0 = time.time()
        try:
            out = np.asarray(pallas_ell.ell_spmm_pallas(
                cols_d, vals_d, b_d, m=m))
        except Exception as e:
            print(f"{np.dtype(dtype).name}: FAIL {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:200]}", flush=True)
            continue
        compile_s = time.time() - t0
        err = np.abs(out - oracle).max()
        rel = err / np.abs(oracle).max()
        t = pipelined(lambda: pallas_ell.ell_spmm_pallas(
            cols_d, vals_d, b_d, m=m))
        print(f"{np.dtype(dtype).name}: err={err:.2e} rel={rel:.2e} "
              f"t={t:.3f} ms (compile {compile_s:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
