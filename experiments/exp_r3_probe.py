"""Round-3 measurement probe (real TPU): grounds the perf design.

Measures:
 1. pattern-matmul structural SpGEMM (headline 500x5000 f64) pieces
 2. gather rates for the ELL SpMM path
 3. sorted set-scatter rates (densify cost)
 4. lax.sort rates at ESC block sizes
 5. dense matmul / ozaki rates at SpMM config-1 sizes
"""
import time
import numpy as np
import scipy.sparse as sps

import jax
import jax.numpy as jnp
from jax import lax

from sparse_dot_tpu import formats
from sparse_dot_tpu.ops import _xla, host as hops
from sparse_dot_tpu.ops import ozaki


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


def s_tuple(t):
    return sum(x.astype(jnp.float32).sum() for x in t)


def main():
    global RTT
    RTT = rtt()
    print(f"rtt_ms={RTT:.2f}", flush=True)

    # ---------------- headline operands ----------------
    X = sps.random(500, 5000, density=0.212, format="csr",
                   dtype=np.float64, random_state=100)
    XT = X.T.tocsc()
    A = formats.to_device(X)
    B = formats.to_device(XT)
    m, k = A.shape
    n = B.shape[1]

    # 1a. existing numeric phase (for reference)
    t = pipelined(lambda: hops._spgemm_dense_real(A, A.data, B, B.data),
                  s_arr)
    print(f"numeric_phase_ms={t:.2f}", flush=True)

    # 1b. pattern matmul alone: indicator f32 matmul (syrk-style)
    a_flat, a_vals, a_cm = A.sorted_flat_parts(A.data)

    @jax.jit
    def pattern_only(a_flat):
        ind = jnp.zeros((k * m,), jnp.float32).at[a_flat].set(
            1.0, mode="drop", unique_indices=True, indices_are_sorted=True
        ).reshape(k, m)
        indb = ind.astype(jnp.bfloat16)
        p = lax.dot_general(indb, indb, (((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
        return p

    t = pipelined(lambda: pattern_only(a_flat), s_arr)
    print(f"pattern_matmul_ms={t:.2f}", flush=True)

    # 1c. fused: numeric + pattern + count + extract-by-pattern
    @jax.jit
    def structural_fused(a_flat, a_vals):
        # numeric (ozaki syrk, same as today)
        a_hi, a_lo = _xla.densify_sorted_hilo(a_flat, a_vals, (k, m))
        c = ozaki.syrk_hilo(a_hi, a_lo, contract=0)
        ind = jnp.zeros((k * m,), jnp.float32).at[a_flat].set(
            1.0, mode="drop", unique_indices=True, indices_are_sorted=True
        ).reshape(k, m).astype(jnp.bfloat16)
        p = lax.dot_general(ind, ind, (((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
        maskflat = (p > 0).reshape(-1)
        cnt = jnp.sum(maskflat.astype(jnp.int32))
        return c, maskflat, cnt

    c, maskflat, cnt = structural_fused(a_flat, a_vals)
    nnz_true = int(cnt)
    oracle = (X @ XT)
    print(f"structural_nnz={nnz_true} scipy_nnz={oracle.nnz}", flush=True)

    t = pipelined(lambda: structural_fused(a_flat, a_vals),
                  lambda r: s_arr(r[0]) + r[2].astype(jnp.float32))
    print(f"structural_fused_ms={t:.2f}", flush=True)

    # 1d. masked extraction at the known nnz
    from functools import partial as _partial

    @_partial(jax.jit, static_argnames=("nnz",))
    def extract_masked(c, maskflat, nnz):
        flat = c.reshape(-1)
        pos = _xla.prefix_sum(maskflat) - 1
        dest = jnp.where(maskflat, pos, nnz)
        vals = _xla.sorted_set_scatter(dest, flat, nnz)
        col_of = jax.lax.broadcasted_iota(
            jnp.int32, (m, n), 1).reshape(-1)
        cols = jnp.zeros((nnz,), jnp.int32).at[dest].set(
            col_of, mode="drop", unique_indices=True,
            indices_are_sorted=True)
        row_counts = jnp.sum(maskflat.reshape(m, n).astype(jnp.int32),
                             axis=1)
        indptr = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32),
             jnp.cumsum(row_counts).astype(jnp.int32)])
        return vals, cols, indptr

    nnz_pad = 1 << int(np.ceil(np.log2(nnz_true)))
    t = pipelined(lambda: extract_masked(c, maskflat, nnz=nnz_pad),
                  s_tuple)
    print(f"extract_masked_ms={t:.2f} (nnz_pad={nnz_pad})", flush=True)

    # correctness check of structural fused vs scipy pattern
    vals, cols, indptr = extract_masked(c, maskflat, nnz=nnz_true)
    got = sps.csr_matrix((np.asarray(vals), np.asarray(cols),
                          np.asarray(indptr)), shape=(m, n))
    oracle.sort_indices()
    pat_ok = (np.array_equal(got.indices, oracle.indices)
              and np.array_equal(got.indptr, oracle.indptr))
    err = np.abs(got.toarray() - oracle.toarray()).max()
    print(f"pattern_match={pat_ok} max_err={err:.2e}", flush=True)

    # ---------------- 2. gather rates ----------------
    rng = np.random.default_rng(0)
    nnz = 1 << 20
    kk = 10000
    cols_g = jnp.asarray(rng.integers(0, kk, nnz).astype(np.int32))
    bf32 = jnp.asarray(rng.random((kk, 128)).astype(np.float32))
    bf64 = bf32.astype(jnp.float64)

    @jax.jit
    def g32(cols_g, bf32):
        return bf32[cols_g].sum(axis=0)

    t = pipelined(lambda: g32(cols_g, bf32), s_arr)
    gbps = nnz * 128 * 4 / (t * 1e-3) / 1e9
    print(f"gather_f32_row128_ms={t:.2f} eff_gbps={gbps:.0f}", flush=True)

    @jax.jit
    def g64(cols_g, bf64):
        return bf64[cols_g].sum(axis=0)

    t = pipelined(lambda: g64(cols_g, bf64), s_arr)
    gbps = nnz * 128 * 8 / (t * 1e-3) / 1e9
    print(f"gather_f64_row128_ms={t:.2f} eff_gbps={gbps:.0f}", flush=True)

    # gather + weighted reduce (the ELL inner op, materializes interm)
    vals_g = jnp.asarray(rng.random(nnz).astype(np.float32))

    @jax.jit
    def gr32(cols_g, vals_g, bf32):
        g = bf32[cols_g]
        return (vals_g[:, None] * g).reshape(-1, 128, 128).sum(axis=1)

    t = pipelined(lambda: gr32(cols_g, vals_g, bf32), s_arr)
    print(f"gather_reduce_f32_ms={t:.2f}", flush=True)

    # ---------------- 3. scatter rates ----------------
    dest = jnp.asarray(np.sort(rng.choice(kk * kk, nnz, replace=False))
                       .astype(np.int32))
    sval = jnp.asarray(rng.random(nnz).astype(np.float32))

    @jax.jit
    def scat_sorted(dest, sval):
        return jnp.zeros((kk * kk,), jnp.float32).at[dest].set(
            sval, mode="drop", unique_indices=True,
            indices_are_sorted=True).sum()

    t = pipelined(lambda: scat_sorted(dest, sval), lambda r: r)
    rate = nnz / (t * 1e-3) / 1e6
    print(f"scatter_sorted_1M_into_100M_ms={t:.2f} "
          f"rate={rate:.0f}Melem/s", flush=True)

    # ---------------- 4. sort rates (ESC) ----------------
    for sz_log in (22,):
        sz = 1 << sz_log
        keys = jnp.asarray(rng.integers(0, 1 << 28, sz).astype(np.int32))
        pay = jnp.asarray(rng.random(sz).astype(np.float64))

        @jax.jit
        def srt(keys, pay):
            return lax.sort((keys, pay), dimension=0, num_keys=1)

        t = pipelined(lambda: srt(keys, pay), lambda r: s_tuple(r))
        print(f"sort_{sz >> 20}M_i32key_f64pay_ms={t:.2f}", flush=True)

        keys64 = keys.astype(jnp.int64)

        @jax.jit
        def srt64(keys64, pay):
            return lax.sort((keys64, pay), dimension=0, num_keys=1)

        t = pipelined(lambda: srt64(keys64, pay), lambda r: s_tuple(r))
        print(f"sort_{sz >> 20}M_i64key_f64pay_ms={t:.2f}", flush=True)

    # ---------------- 5. dense matmul rates (SpMM alt path) --------
    a_d = jnp.asarray(rng.random((10000, 10000)).astype(np.float32))

    @jax.jit
    def mm32(a_d, bf32):
        return jnp.dot(a_d, bf32, precision=lax.Precision.HIGHEST)

    t = pipelined(lambda: mm32(a_d, bf32), s_arr)
    print(f"dense_mm_10k_10k_128_f32H_ms={t:.2f}", flush=True)

    a_d64 = a_d.astype(jnp.float64)

    @jax.jit
    def mmoz(a_d64, bf64):
        return ozaki.matmul_f64(a_d64, bf64)

    t = pipelined(lambda: mmoz(a_d64, bf64), s_arr)
    print(f"ozaki_mm_10k_10k_128_f64_ms={t:.2f}", flush=True)

    # current SpMM paths for reference
    Asp = sps.random(10000, 10000, density=0.01, format="csr",
                     dtype=np.float64, random_state=101)
    Ad = formats.to_device(Asp)
    bdev = jnp.asarray(rng.random((10000, 128)))
    t = pipelined(lambda: hops._real_spmm(Ad, Ad.data, bdev, False),
                  s_arr, reps=5)
    print(f"spmm_f64_current_ms={t:.2f}", flush=True)
    Af = formats.to_device(Asp.astype(np.float32))
    bf = bdev.astype(jnp.float32)
    t = pipelined(lambda: hops._real_spmm(Af, Af.data, bf, False),
                  s_arr, reps=5)
    print(f"spmm_f32_current_ms={t:.2f}", flush=True)

    # densify f32 at 10k x 10k + matmul fused (SpMM alternative)
    flat10, vals10, cm10 = Af.sorted_flat_parts(Af.data)

    @jax.jit
    def densify_mm(flat10, vals10, bf):
        ad = _xla.densify_sorted(flat10, vals10,
                                 (10000, 10000) if not cm10
                                 else (10000, 10000))
        if cm10:
            return lax.dot_general(ad, bf, (((0,), (0,)), ((), ())),
                                   precision=lax.Precision.HIGHEST)
        return jnp.dot(ad, bf, precision=lax.Precision.HIGHEST)

    t = pipelined(lambda: densify_mm(flat10, vals10, bf), s_arr)
    print(f"spmm_f32_densify_mm_ms={t:.2f}", flush=True)


if __name__ == "__main__":
    main()
