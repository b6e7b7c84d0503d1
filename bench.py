"""Benchmark driver.

Headline: the reference's only published measurement — the demo
notebook's SpGEMM ``X @ X.T`` with X = 500x5000 scipy CSR at 21.2%
density, float64 (``/root/reference/demo.ipynb`` cell 6):

    scipy (single-threaded):   204 ms
    dot_product_mkl (MKL):    52.5 ms   <- baseline
    gram_matrix_mkl (syrk):   28.1 ms

We time the same end-to-end call (scipy in -> scipy out, host transfers
included) through this framework on the TPU and report
``vs_baseline = 52.5ms / ours`` (>1 means faster than MKL).

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


def _time(fn, reps=10, warmup=2):
    for _ in range(warmup):
        fn()
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        times.append((time.perf_counter() - t0) * 1e3)
    return float(np.median(times))


def main():
    import sparse_dot_tpu as sdt

    rng = np.random.default_rng(100)
    X = sps.random(
        500, 5000, density=0.212, format="csr", dtype=np.float64,
        random_state=100,
    )
    XT = X.T.tocsc()

    # Correctness gate at the reference's own tolerance before timing.
    ours = sdt.dot_product(X, XT)
    oracle = (X @ XT).toarray()
    err = np.abs(ours.toarray() - oracle).max()
    assert err < 1.5e-6, f"SpGEMM accuracy gate failed: {err}"

    spgemm_ms = _time(lambda: sdt.dot_product(X, XT))

    gram_ms = _time(lambda: sdt.gram_matrix(X, transpose=True, dense=True))

    # Secondary: BASELINE.md config 1 — CSR f64 SpMM 10k x 10k @ 1%.
    A = sps.random(
        10000, 10000, density=0.01, format="csr", dtype=np.float64,
        random_state=101,
    )
    B = rng.random((10000, 128))
    spmm_ms = _time(lambda: sdt.dot_product(A, B), reps=5, warmup=2)
    spmm_gflops = 2 * A.nnz * B.shape[1] / (spmm_ms * 1e-3) / 1e9

    result = {
        "metric": "spgemm_xxt_500x5000_f64_e2e",
        "value": round(spgemm_ms, 3),
        "unit": "ms",
        "vs_baseline": round(MKL_SPGEMM_MS / spgemm_ms, 3),
        "extras": {
            "gram_xxt_ms": round(gram_ms, 3),
            "gram_vs_mkl_syrk": round(MKL_SYRK_MS / gram_ms, 3),
            "spmm_10k_1pct_f64_n128_ms": round(spmm_ms, 3),
            "spmm_gflops": round(spmm_gflops, 2),
            "vs_scipy": round(SCIPY_SPGEMM_MS / spgemm_ms, 3),
            "max_abs_err": float(err),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    sys.exit(main())
