"""Round-3 hardware batch #1: everything measurable in one warm
session, critical-first, phase-isolated.

1. adaptive ESC warm timing (the <=150 ms target)
2. Pallas ELL compile+accuracy+timing ladder: M=2048 -> 4096 -> 10240
   (big compiles LAST; a wedged compile only loses later phases)
3. ESC sort-kernel: perm-sort vs co-sort on the headline block
4. 1M x 1M ESC end-to-end with perm-sort
"""
import time
import traceback

import numpy as np
import scipy.sparse as sps
import jax
import jax.numpy as jnp


def log(s):
    print(time.strftime("%H:%M:%S"), s, flush=True)


def phase(name):
    def deco(fn):
        def run():
            log(f"--- {name} ---")
            try:
                fn()
            except Exception as e:
                log(f"{name} FAILED: {type(e).__name__}: "
                    f"{str(e).splitlines()[0][:200]}")
                traceback.print_exc()
        return run
    return deco


from sparse_dot_tpu import formats  # noqa: E402
from sparse_dot_tpu.config import config  # noqa: E402
from sparse_dot_tpu.ops import host as hops, _xla, pallas_ell  # noqa: E402
import sparse_dot_tpu as sdt  # noqa: E402

X = sps.random(500, 5000, density=0.212, format="csr",
               dtype=np.float64, random_state=100)


@phase("1. adaptive ESC warm")
def p1():
    Ad = formats.to_device(X)
    Bd = hops._to_csr(formats.to_device(X.T.tocsc()))
    ts = []
    for _ in range(4):
        t0 = time.perf_counter()
        data, idx, indptr = hops.spgemm_esc_arrays(Ad, Bd, np.float64)
        ts.append((time.perf_counter() - t0) * 1e3)
    C = sps.csr_matrix((data, idx, indptr), shape=(500, 500))
    err = np.abs(C.toarray() - (X @ X.T).toarray()).max()
    log(f"adaptive ESC ms={[round(t) for t in ts]} err={err:.2e}")


def _ell_fixture(mk, dtype):
    n = 128
    A = sps.random(mk, mk, density=0.01, format="csr", dtype=np.float64,
                   random_state=101)
    rng = np.random.default_rng(0)
    b = rng.standard_normal((mk, n))
    Ad = formats.to_device(A)
    ell = Ad.ell_parts()
    cols_d, vals_d = ell
    return (A, cols_d, jnp.asarray(np.asarray(vals_d).astype(dtype)),
            jnp.asarray(b.astype(dtype)), b)


def _pipe(fn, reps=6):
    def run_all():
        return float(jnp.stack([fn().sum() for _ in range(reps)]).sum())
    run_all(); run_all()
    t0 = time.perf_counter()
    run_all()
    return (time.perf_counter() - t0) * 1e3 / reps


def _ell_one(mk, dtype):
    A, cols_d, vals_d, b_d, b = _ell_fixture(mk, dtype)
    t0 = time.time()
    out = np.asarray(pallas_ell.ell_spmm_pallas(cols_d, vals_d, b_d,
                                                m=mk))
    dt = time.time() - t0
    oracle = A @ b
    rel = np.abs(out - oracle).max() / np.abs(oracle).max()
    t = _pipe(lambda: pallas_ell.ell_spmm_pallas(cols_d, vals_d, b_d,
                                                 m=mk))
    log(f"ELL M={mk} {np.dtype(dtype).name}: first={dt:.0f}s "
        f"rel={rel:.2e} t={t:.3f} ms")


@phase("2a. pallas ELL M=2048")
def p2a():
    _ell_one(2048, np.float32)
    _ell_one(2048, np.float64)


@phase("3. ESC sort strategies on the headline block")
def p3():
    config.spgemm_esc_force_sort = True
    Ad = formats.to_device(X)
    Bd = hops._to_csr(formats.to_device(X.T.tocsc()))
    for strat in ("auto", False):
        config.spgemm_esc_perm_sort = strat
        ts = []
        for _ in range(2):
            t0 = time.perf_counter()
            data, idx, indptr = hops.spgemm_esc_arrays(Ad, Bd,
                                                       np.float64)
            ts.append((time.perf_counter() - t0) * 1e3)
        C = sps.csr_matrix((data, idx, indptr), shape=(500, 500))
        err = np.abs(C.toarray() - (X @ X.T).toarray()).max()
        log(f"sort-ESC strat={strat}: ms={[round(t) for t in ts]} "
            f"err={err:.2e}")
    config.spgemm_esc_perm_sort = "auto"
    config.spgemm_esc_force_sort = False


@phase("4. 1M x 1M ESC")
def p4():
    m1 = 1_000_000
    rng1 = np.random.default_rng(7)
    nnz1 = 2_000_000
    A1m = sps.csr_matrix(
        (rng1.standard_normal(nnz1),
         (rng1.integers(0, m1, nnz1), rng1.integers(0, m1, nnz1))),
        shape=(m1, m1))
    A1m.sum_duplicates()
    A1m.sort_indices()
    for rep in range(2):
        t0 = time.perf_counter()
        C1m = sdt.dot_product(A1m, A1m)
        log(f"1M ESC rep{rep}: {(time.perf_counter() - t0) * 1e3:.0f} ms "
            f"nnz={C1m.nnz}")


@phase("2b. pallas ELL M=4096")
def p2b():
    _ell_one(4096, np.float32)
    _ell_one(4096, np.float64)


@phase("2c. pallas ELL M=10240 (config-1 scale; riskiest compile last)")
def p2c():
    _ell_one(10240, np.float32)
    _ell_one(10240, np.float64)


def main():
    t0 = time.time()
    x = jnp.ones((8,))
    float(x.sum())
    log(f"warm after {time.time() - t0:.0f}s")
    for p in (p1, p2a, p3, p4, p2b, p2c):
        p()
    log("BATCH DONE")


if __name__ == "__main__":
    main()
