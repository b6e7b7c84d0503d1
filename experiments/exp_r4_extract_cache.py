"""Round-4 probe: structure-cached extraction variants.

With the plane cache, the fused structural SpGEMM's remaining cost is
extraction (~4.5 ms of 5.7).  The extraction STRUCTURE (mask, dest
positions, cols, indptr) depends only on the operand patterns — only
the VALUES move per call.  Variants:

  v0: current full extract (prefix_sum + 3 scatters + mask compute)
  v1: cached-dest value scatter only (hi/lo f32 x2)
  v2: cached-src value gather (sorted 1-wide f64)
  v3: cached-src windowed gather on hi|lo packed planes
"""
import time
import numpy as np
import scipy.sparse as sps
from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

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


def pipelined(fn, scalarize, reps=10, warmup=2):
    def run_all():
        return float(jnp.stack(
            [scalarize(fn()) for _ in range(reps)]
        ).sum())
    for _ in range(warmup):
        run_all()
    t0 = time.perf_counter()
    run_all()
    return max((time.perf_counter() - t0) * 1e3 - RTT, 0.01) / reps


def s_arr(r):
    return r.astype(jnp.float32).sum()


def main():
    global RTT
    RTT = rtt()
    print(f"rtt_ms={RTT:.2f}", flush=True)

    X = sps.random(500, 5000, density=0.212, format="csr",
                   dtype=np.float64, random_state=100)
    XT = X.T.tocsc()
    A = formats.to_device(X)
    m, k = A.shape
    n = m

    a_flat, a_vals, a_cm = A.sorted_flat_parts(A.data)
    a_hi, a_lo, ind_a = (
        lambda p: (p[0], p[1], p[2])
    )(_xla.dense_planes_prep(a_flat, a_vals, shape=(m, k), hilo=True))

    @jax.jit
    def numeric(a_hi, a_lo):
        return _oz.syrk_hilo(a_hi, a_lo, contract=1)

    c = numeric(a_hi, a_lo)
    oracle = (X @ XT)
    nnz = oracle.nnz
    print(f"nnz={nnz} of {m*n}", flush=True)

    # structure (host-side, one time): mask -> src indices
    mask_np = ((X != 0) @ (XT != 0)).toarray()
    src_np = np.flatnonzero(mask_np.reshape(-1)).astype(np.int32)
    src = jnp.asarray(src_np)
    pos_np = np.full(m * n, nnz, np.int32)
    pos_np[src_np] = np.arange(nnz, dtype=np.int32)
    dest = jnp.asarray(pos_np)

    # v0: current full extract
    @partial(jax.jit, static_argnames=("nnz",))
    def v0(c, nnz):
        mask_flat = jnp.zeros((m * n,), jnp.bool_).at[src].set(True)
        return _xla.extract_sparse_masked(c, mask_flat, nnz)[0]

    # that's not quite current (mask via scatter); use the real one:
    @partial(jax.jit, static_argnames=("nnz",))
    def v0b(c, ind_a, nnz):
        p = lax.dot_general(
            ind_a, ind_a, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        mask_flat = (p > 0).reshape(-1)
        return _xla.extract_sparse_masked(c, mask_flat, nnz)[0]

    t = pipelined(lambda: v0b(c, ind_a, nnz), s_arr)
    print(f"v0_current_extract_ms={t:.3f}", flush=True)

    # v1: cached-dest scatter of values only (hi/lo)
    @partial(jax.jit, static_argnames=("nnz",))
    def v1(c, dest, nnz):
        flat = c.reshape(-1)
        return _xla.sorted_set_scatter(dest, flat, nnz)

    t = pipelined(lambda: v1(c, dest, nnz), s_arr)
    print(f"v1_cached_dest_scatter_ms={t:.3f}", flush=True)
    got = np.asarray(v1(c, dest, nnz))
    print(f"v1_err={np.abs(got - oracle.data).max():.3e}", flush=True)

    # v2: cached-src sorted gather (f64 1-wide)
    @jax.jit
    def v2(c, src):
        return c.reshape(-1)[src]

    t = pipelined(lambda: v2(c, src), s_arr)
    print(f"v2_cached_src_gather_ms={t:.3f}", flush=True)

    # v3: windowed gather over hi|lo packed rows: reshape c to rows of
    # 2 f32 (hi|lo interleaved via split), gather rows
    @jax.jit
    def v3(c, src):
        hi, lo = _oz.hilo(c.reshape(-1))
        packed = jnp.stack([hi, lo], axis=1)  # (m*n, 2) f32
        g = packed[src]
        return g[:, 0].astype(jnp.float64) + g[:, 1].astype(jnp.float64)

    t = pipelined(lambda: v3(c, src), s_arr)
    print(f"v3_windowed_pair_gather_ms={t:.3f}", flush=True)
    got = np.asarray(v3(c, src))
    print(f"v3_err={np.abs(got - oracle.data).max():.3e}", flush=True)

    # v4: full structural from planes with cached-dest extraction
    @partial(jax.jit, static_argnames=("nnz",))
    def v4(a_hi, a_lo, ind_a, dest, nnz):
        cc = _oz.syrk_hilo(a_hi, a_lo, contract=1)
        p = lax.dot_general(
            ind_a, ind_a, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        count = jnp.sum((p > 0).reshape(-1).astype(jnp.int32))
        vals = _xla.sorted_set_scatter(dest, cc.reshape(-1), nnz)
        return vals, count

    t = pipelined(lambda: v4(a_hi, a_lo, ind_a, dest, nnz)[0], s_arr)
    print(f"v4_full_cached_struct_ms={t:.3f}", flush=True)


if __name__ == "__main__":
    main()
