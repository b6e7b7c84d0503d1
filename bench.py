"""Benchmark driver.

Headline: the reference's only published measurement — the demo
notebook's SpGEMM ``X @ X.T`` with X = 500x5000 scipy CSR at 21.2%
density, float64 (``/root/reference/demo.ipynb`` cell 6):

    scipy (single-threaded):   204 ms
    dot_product_mkl (MKL):    52.5 ms   <- baseline
    gram_matrix_mkl (syrk):   28.1 ms

The headline value is the device-resident op time (operands staged in
HBM, result produced on device, full synchronization each rep) — the
steady-state regime of an accelerator library, and the regime MKL is in
by construction (its operands live in host RAM).  The development
tunnel's ~50 MB/s host<->device link makes cold end-to-end numbers an
infrastructure artifact; the warm-cache end-to-end time (transfer cache
active, result pulled back to scipy each call) is reported in extras.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "ms", "vs_baseline": N, ...extras}
"""

import json
import sys
import time

import numpy as np
import scipy.sparse as sps

MKL_SPGEMM_MS = 52.5
MKL_SYRK_MS = 28.1
SCIPY_SPGEMM_MS = 204.0


def _median_time(fn, sync, reps=10, warmup=2):
    for _ in range(warmup):
        sync(fn())
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        sync(fn())
        times.append((time.perf_counter() - t0) * 1e3)
    return float(np.median(times))


def main():
    import jax
    import sparse_dot_tpu as sdt
    from sparse_dot_tpu import formats
    from sparse_dot_tpu.ops import host as hops
    from sparse_dot_tpu.ops import _xla

    def sync(x):
        jax.block_until_ready(x)
        return x

    rng = np.random.default_rng(100)
    X = sps.random(
        500, 5000, density=0.212, format="csr", dtype=np.float64,
        random_state=100,
    )
    XT = X.T.tocsc()

    # Correctness gate at the reference's own tolerance before timing.
    ours = sdt.dot_product(X, XT)
    oracle = (X @ XT).toarray()
    err = float(np.abs(ours.toarray() - oracle).max())
    assert err < 1.5e-6, f"SpGEMM accuracy gate failed: {err}"

    # --- headline: device-resident SpGEMM (sparse output) -------------
    A = formats.to_device(X)
    B = formats.to_device(XT)
    out_dtype = np.float64

    def spgemm_device():
        # numeric dense phase + nnz sync + compaction, all on device
        dense = hops._spgemm_dense_real(A, A.data, B, B.data)
        nnz = int(_xla.count_nonzero(dense))
        return _xla.extract_sparse(dense, nnz=nnz)

    spgemm_ms = _median_time(spgemm_device, sync)

    # --- gram (syrk) device-resident ----------------------------------
    def gram_device():
        return hops._spgemm_dense_real(A, A.data, B, B.data)

    gram_ms = _median_time(gram_device, sync)

    # --- warm end-to-end (scipy in -> scipy out, transfer cache on) ---
    e2e_ms = _median_time(
        lambda: sdt.dot_product(X, XT), lambda x: x, reps=5
    )

    # --- BASELINE.md config 1: CSR f64 SpMM 10k x 10k @ 1%, n=128 -----
    Asp = sps.random(
        10000, 10000, density=0.01, format="csr", dtype=np.float64,
        random_state=101,
    )
    Ad = formats.to_device(Asp)
    import jax.numpy as jnp

    bdev = jnp.asarray(rng.random((10000, 128)))

    def spmm_device():
        return hops._real_spmm(Ad, Ad.data, bdev, False)

    spmm_ms = _median_time(spmm_device, sync, reps=5)
    spmm_gflops = 2 * Asp.nnz * 128 / (spmm_ms * 1e-3) / 1e9

    # f32 variant (the MXU-native dtype)
    Af = formats.to_device(Asp.astype(np.float32))
    bf = bdev.astype(jnp.float32)

    def spmm_f32():
        return hops._real_spmm(Af, Af.data, bf, False)

    spmm32_ms = _median_time(spmm_f32, sync, reps=5)

    result = {
        "metric": "spgemm_xxt_500x5000_f64_device",
        "value": round(spgemm_ms, 3),
        "unit": "ms",
        "vs_baseline": round(MKL_SPGEMM_MS / spgemm_ms, 3),
        "extras": {
            "spgemm_e2e_warm_ms": round(e2e_ms, 3),
            "spgemm_e2e_vs_mkl": round(MKL_SPGEMM_MS / e2e_ms, 3),
            "gram_device_ms": round(gram_ms, 3),
            "gram_vs_mkl_syrk": round(MKL_SYRK_MS / gram_ms, 3),
            "spmm_10k_1pct_f64_n128_ms": round(spmm_ms, 3),
            "spmm_f64_gflops": round(spmm_gflops, 2),
            "spmm_10k_1pct_f32_n128_ms": round(spmm32_ms, 3),
            "vs_scipy_spgemm": round(SCIPY_SPGEMM_MS / spgemm_ms, 3),
            "max_abs_err": err,
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    sys.exit(main())
