"""Round-3 probe #2: validate + time the new structural SpGEMM paths on
hardware; decompose the f64 ELL SpMM cost."""
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


def median(fn, reps=5, warmup=2):
    for _ in range(warmup):
        fn()
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append((time.perf_counter() - t0) * 1e3)
    return float(np.median(ts))


def s_arr(r):
    return r.astype(jnp.float32).sum()


def s_csr(c):
    return (c.data.astype(jnp.float32).sum()
            + c.indices.astype(jnp.float32).sum())


def main():
    global RTT
    RTT = rtt()
    print(f"rtt_ms={RTT:.2f}", flush=True)

    X = sps.random(500, 5000, density=0.212, format="csr",
                   dtype=np.float64, random_state=100)
    XT = X.T.tocsc()
    A = formats.to_device(X)
    B = formats.to_device(XT)

    # correctness first: structural device product vs scipy
    C = hops.spgemm_device(A, B, out_dtype=np.float64)
    got = sps.csr_matrix(
        (np.asarray(C.data), np.asarray(C.indices),
         np.asarray(C.indptr)), shape=(500, 500))
    oracle = X @ XT
    oracle.sort_indices()
    err = np.abs(got.toarray() - oracle.toarray()).max()
    print(f"structural_device_err={err:.2e} nnz={got.nnz} "
          f"oracle={oracle.nnz}", flush=True)

    t = pipelined(lambda: hops.spgemm_device(A, B, sync_check=False),
                  s_csr)
    print(f"headline_structural_ms={t:.2f}", flush=True)

    t = pipelined(lambda: hops.spgemm_device(A, B, triangular=True,
                                             sync_check=False), s_csr)
    print(f"gram_structural_ms={t:.2f}", flush=True)

    # ESC with wave syncs on the headline
    t = median(lambda: hops.spgemm_esc_arrays(A, B, np.float64)[0],
               reps=3)
    print(f"esc_wave_ms={t:.1f}", flush=True)

    # sparse-in sparse-out e2e from scipy
    import sparse_dot_tpu as sdt
    t = median(lambda: sdt.dot_product(X, XT), reps=5)
    print(f"e2e_warm_ms={t:.1f}", flush=True)

    # ---- f64 ELL SpMM decomposition --------------------------------
    rng = np.random.default_rng(0)
    Asp = sps.random(10000, 10000, density=0.01, format="csr",
                     dtype=np.float64, random_state=101)
    Ad = formats.to_device(Asp)
    bdev = jnp.asarray(rng.random((10000, 128)))
    binned = Ad.ell_parts_binned()
    segs, cols_flat, vals_flat, invpos = binned
    print(f"segs={segs[:4]}... nseg={len(segs)} "
          f"flat={cols_flat.shape}", flush=True)

    n = 128
    b_hi, b_lo = ozaki.hilo(bdev)

    # (a) current full path
    t = pipelined(lambda: _xla.ell_spmm_binned(
        cols_flat, vals_flat, bdev, invpos, segs=segs, split_b=True),
        s_arr, reps=5)
    print(f"f64_binned_current_ms={t:.2f}", flush=True)

    # (b) gather-only cost (two planes, no f64 math): sum in f32
    @jax.jit
    def gather_only(cols_flat, b_hi, b_lo):
        acc = jnp.zeros((n,), jnp.float32)
        off = 0
        for rmax, rows in segs:
            cnt = rows * rmax
            cp = lax.slice(cols_flat, (off,), (off + cnt,))
            off += cnt
            acc = acc + b_hi[cp].sum(axis=0) + b_lo[cp].sum(axis=0)
        return acc

    t = pipelined(lambda: gather_only(cols_flat, b_hi, b_lo), s_arr,
                  reps=5)
    print(f"f64_gather_only_ms={t:.2f}", flush=True)

    # (c) interleaved single-plane gather (hi|lo in one row)
    b_cat = jnp.concatenate([b_hi, b_lo], axis=1)  # (k, 2n) f32

    @jax.jit
    def gather_cat(cols_flat, b_cat):
        acc = jnp.zeros((2 * n,), jnp.float32)
        off = 0
        for rmax, rows in segs:
            cnt = rows * rmax
            cp = lax.slice(cols_flat, (off,), (off + cnt,))
            off += cnt
            acc = acc + b_cat[cp].sum(axis=0)
        return acc

    t = pipelined(lambda: gather_cat(cols_flat, b_cat), s_arr, reps=5)
    print(f"f64_gather_cat_ms={t:.2f}", flush=True)

    # (d) full f64 product but with one concatenated gather
    @jax.jit
    def binned_cat(cols_flat, vals_flat, b_cat, invpos):
        outs = []
        off = 0
        for rmax, rows in segs:
            cnt = rows * rmax
            cp = lax.slice(cols_flat, (off,), (off + cnt,)).reshape(
                rows, rmax)
            vp = lax.slice(vals_flat, (off,), (off + cnt,)).reshape(
                rows, rmax)
            off += cnt
            g = b_cat[cp.reshape(-1)].reshape(rows, rmax, 2 * n)
            gb = (g[:, :, :n].astype(jnp.float64)
                  + g[:, :, n:].astype(jnp.float64))
            outs.append(jnp.sum(vp[:, :, None] * gb, axis=1))
        c_sorted = jnp.concatenate(outs)
        return c_sorted[invpos]

    t = pipelined(lambda: binned_cat(cols_flat, vals_flat, b_cat,
                                     invpos), s_arr, reps=5)
    c1 = binned_cat(cols_flat, vals_flat, b_cat, invpos)
    oracle_mm = Asp @ np.asarray(bdev)
    err = np.abs(np.asarray(c1) - oracle_mm).max()
    print(f"f64_binned_cat_ms={t:.2f} err={err:.2e}", flush=True)

    # (e) f32-pair compute: hi/lo vals x hi/lo b, 3 f32 elementwise
    # passes + f64 only at combine. Accuracy probe included.
    vh, vl = ozaki.hilo(vals_flat)

    @jax.jit
    def binned_pair(cols_flat, b_cat, invpos, vh, vl):
        outs = []
        off = 0
        for rmax, rows in segs:
            cnt = rows * rmax
            cp = lax.slice(cols_flat, (off,), (off + cnt,)).reshape(
                rows, rmax)
            vhp = lax.slice(vh, (off,), (off + cnt,)).reshape(rows, rmax)
            vlp = lax.slice(vl, (off,), (off + cnt,)).reshape(rows, rmax)
            off += cnt
            g = b_cat[cp.reshape(-1)].reshape(rows, rmax, 2 * n)
            gh, gl = g[:, :, :n], g[:, :, n:]
            # f64 accumulation of f32-exact partial products:
            # v*b = vh*gh + (vh*gl + vl*gh) + vl*gl(negligible kept)
            p_hi = jnp.sum(
                (vhp[:, :, None] * gh).astype(jnp.float64), axis=1)
            p_mid = jnp.sum(
                (vhp[:, :, None] * gl + vlp[:, :, None] * gh).astype(
                    jnp.float64), axis=1)
            outs.append(p_hi + p_mid)
        c_sorted = jnp.concatenate(outs)
        return c_sorted[invpos]

    t = pipelined(lambda: binned_pair(cols_flat, b_cat, invpos, vh, vl),
                  s_arr, reps=5)
    c2 = binned_pair(cols_flat, b_cat, invpos, vh, vl)
    err = np.abs(np.asarray(c2) - oracle_mm).max()
    print(f"f64_binned_pair_ms={t:.2f} err={err:.2e}", flush=True)

    # f32 for reference with cat layout idea (n=128 single plane)
    Af = formats.to_device(Asp.astype(np.float32))
    bf = bdev.astype(jnp.float32)
    t = pipelined(lambda: hops._real_spmm(Af, Af.data, bf, False),
                  s_arr, reps=5)
    print(f"f32_current_ms={t:.2f}", flush=True)


if __name__ == "__main__":
    main()
