"""Round-4 probe: what does the headline structural SpGEMM cost with
PRE-DENSIFIED operands (inspector-executor caching)?

Current steady state re-runs the densify scatters (the dominant term)
every call even though the operands are unchanged.  If caching the
dense hi/lo planes + bf16 indicator on the container removes them, the
fused program should drop to ~(Ozaki syrk + pattern matmul +
extraction).
"""
import time
import numpy as np
import scipy.sparse as sps

import jax
import jax.numpy as jnp
from jax import lax
from functools import partial

from sparse_dot_tpu import formats
from sparse_dot_tpu.ops import _xla, host as hops
from sparse_dot_tpu.ops import ozaki as _oz


def rtt():
    x = jnp.ones((8,))
    float(x.sum())
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        float((x * 2.0).sum())
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) * 1e3


RTT = None


def pipelined(fn, scalarize, reps=8, warmup=2):
    def run_all():
        scalars = [scalarize(fn()) for _ in range(reps)]
        return float(jnp.stack(scalars).sum())
    for _ in range(warmup):
        run_all()
    t0 = time.perf_counter()
    run_all()
    dt = (time.perf_counter() - t0) * 1e3
    return max(dt - RTT, 0.01) / reps


def s_arr(r):
    return r.astype(jnp.float32).sum()


def s_tup(t):
    return sum(x.astype(jnp.float32).sum() for x in t
               if x is not None and x.ndim > 0)


def main():
    global RTT
    RTT = rtt()
    print(f"rtt_ms={RTT:.2f}", flush=True)

    X = sps.random(500, 5000, density=0.212, format="csr",
                   dtype=np.float64, random_state=100)
    XT = X.T.tocsc()
    A = formats.to_device(X)
    B = formats.to_device(XT)
    m, k = A.shape
    n = B.shape[1]

    # current steady-state numeric (densify inside)
    t = pipelined(
        lambda: hops._spgemm_dense_real(A, A.data, B, B.data), s_arr
    )
    print(f"numeric_current_ms={t:.3f}", flush=True)

    # current full structural (fused extract, steady state)
    t = pipelined(
        lambda: hops.spgemm_device(A, B, sync_check=False).data, s_arr
    )
    print(f"structural_current_ms={t:.3f}", flush=True)

    # pre-densified: hi/lo planes + indicator for the syrk pair
    a_flat, a_vals, a_cm = A.sorted_flat_parts(A.data)
    t_d, D, dj = _oz.plan(k)

    @jax.jit
    def prep(a_flat, a_vals):
        hi, lo = _xla.densify_sorted_hilo(a_flat, a_vals, (m, k))
        ind = _xla._indicator_sorted(a_flat, m * k).reshape(m, k)
        return hi, lo, ind

    a_hi, a_lo, ind_a = prep(a_flat, a_vals)
    a_hi.block_until_ready()

    # prep cost itself
    t = pipelined(lambda: prep(a_flat, a_vals), s_tup)
    print(f"prep_ms={t:.3f}", flush=True)

    # numeric-from-dense: ozaki syrk on cached planes
    @jax.jit
    def numeric_cached(a_hi, a_lo):
        return _oz.syrk_hilo(a_hi, a_lo, contract=1)

    t = pipelined(lambda: numeric_cached(a_hi, a_lo), s_arr)
    print(f"numeric_cached_ms={t:.3f}", flush=True)

    # full structural from cached planes: numeric + pattern + extract
    nnz = int(np.asarray((X @ XT).nnz))

    @partial(jax.jit, static_argnames=("nnz",))
    def structural_cached(a_hi, a_lo, ind_a, nnz):
        c = _oz.syrk_hilo(a_hi, a_lo, contract=1)
        p = lax.dot_general(
            ind_a, ind_a, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        mask_flat = (p > 0).reshape(-1)
        return _xla.extract_sparse_masked(c, mask_flat, nnz=nnz)

    t = pipelined(
        lambda: structural_cached(a_hi, a_lo, ind_a, nnz)[0], s_arr
    )
    print(f"structural_cached_ms={t:.3f}", flush=True)

    # correctness
    vals, cols, indptr = structural_cached(a_hi, a_lo, ind_a, nnz)
    got = sps.csr_matrix(
        (np.asarray(vals), np.asarray(cols), np.asarray(indptr)),
        shape=(m, n),
    )
    oracle = (X @ XT)
    print(f"err={np.abs(got.toarray() - oracle.toarray()).max():.3e}",
          flush=True)

    # extraction alone (how much of the cached path is extraction?)
    c_dense = numeric_cached(a_hi, a_lo)

    @partial(jax.jit, static_argnames=("nnz",))
    def extract_only(c_dense, ind_a, nnz):
        p = lax.dot_general(
            ind_a, ind_a, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        mask_flat = (p > 0).reshape(-1)
        return _xla.extract_sparse_masked(c_dense, mask_flat, nnz=nnz)

    t = pipelined(lambda: extract_only(c_dense, ind_a, nnz)[0], s_arr)
    print(f"pattern_extract_ms={t:.3f}", flush=True)


if __name__ == "__main__":
    main()
