"""Round-4 probe (real TPU): decompose the f64 SpMM 8.55 ms.

BASELINE config 1 (10k x 10k @1% CSR f64, n=128) runs the binned-ELL
windowed-gather kernel at 55.4% of the sorted-gather roof (4.74 ms roof
vs 8.55 ms measured).  Questions:

  1. what does the PURE gather cost (no math)?          -> fusion loss?
  2. what does f32-only multiply-reduce cost?           -> f64 VPU tax?
  3. does a slot-blocked scan formulation fuse better?
  4. does a pair-plane (hi/lo separate) exact reduce beat the
     recombine-to-f64 form?
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


def pipelined(fn, scalarize, reps=6, warmup=2):
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


def main():
    global RTT
    RTT = rtt()
    print(f"rtt_ms={RTT:.2f}", flush=True)

    rng = np.random.default_rng(0)
    Asp = sps.random(10000, 10000, density=0.01, format="csr",
                     dtype=np.float64, random_state=101)
    A = formats.to_device(Asp)
    b = jnp.asarray(rng.random((10000, 128)))
    n = 128

    # reference answer
    oracle = Asp @ np.asarray(b)

    # --- v0: current shipped path ------------------------------------
    t = pipelined(lambda: hops._real_spmm(A, A.data, b, False), s_arr)
    print(f"v0_current_ms={t:.3f}", flush=True)

    segs, cols_flat, vals_flat, invpos = A.ell_parts_binned()
    print(f"segs={segs} flat={cols_flat.shape[0]}", flush=True)

    b_hi, b_lo = _oz.hilo(b)
    b_cat = jnp.concatenate([b_hi, b_lo], axis=1)  # (k, 256) f32

    # --- v1: pure windowed gather, touch-reduce in f32 (no f64) ------
    @jax.jit
    def v1(cols_flat, b_cat):
        outs = []
        off = 0
        for rmax, rows in segs:
            cnt = rows * rmax
            cp = lax.slice(cols_flat, (off,), (off + cnt,))
            off += cnt
            g = b_cat[cp]                      # (cnt, 256) f32
            outs.append(g.sum(dtype=jnp.float32))
        return jnp.stack(outs).sum()

    t = pipelined(lambda: v1(cols_flat, b_cat), s_arr)
    print(f"v1_pure_gather_ms={t:.3f}", flush=True)

    # --- v2: gather + f32 multiply-reduce (wrong numerics; VPU probe) -
    v32 = vals_flat.astype(jnp.float32)

    @jax.jit
    def v2(cols_flat, v32, b_cat):
        outs = []
        off = 0
        for rmax, rows in segs:
            cnt = rows * rmax
            cp = lax.slice(cols_flat, (off,), (off + cnt,))
            vp = lax.slice(v32, (off,), (off + cnt,)).reshape(rows, rmax)
            off += cnt
            g = b_cat[cp].reshape(rows, rmax, 256)
            c = jnp.sum(vp[:, :, None] * g, axis=1)
            outs.append(c.sum(dtype=jnp.float32))
        return jnp.stack(outs).sum()

    t = pipelined(lambda: v2(cols_flat, v32, b_cat), s_arr)
    print(f"v2_f32_reduce_ms={t:.3f}", flush=True)

    # --- v3: gather + recombine f64 + f64 reduce (current math, no
    #         unpermute) ------------------------------------------------
    @jax.jit
    def v3(cols_flat, vals_flat, b_cat):
        outs = []
        off = 0
        for rmax, rows in segs:
            cnt = rows * rmax
            cp = lax.slice(cols_flat, (off,), (off + cnt,))
            vp = lax.slice(vals_flat, (off,), (off + cnt,)).reshape(
                rows, rmax)
            off += cnt
            g = b_cat[cp]
            bg = (g[:, :n].astype(jnp.float64)
                  + g[:, n:].astype(jnp.float64)).reshape(rows, rmax, n)
            c = jnp.sum(vp[:, :, None] * bg, axis=1)
            outs.append(c.sum(dtype=jnp.float32))
        return jnp.stack(outs).sum()

    t = pipelined(lambda: v3(cols_flat, vals_flat, b_cat), s_arr)
    print(f"v3_f64_reduce_ms={t:.3f}", flush=True)

    # --- v4: pair-plane exact reduce: v64 * (hi + lo) without forming
    #         the f64 bg: products v*hi and v*lo in f64 (widen), sum.
    #         Same flops, maybe different fusion shape. --------------
    @jax.jit
    def v4(cols_flat, vals_flat, b_cat):
        outs = []
        off = 0
        for rmax, rows in segs:
            cnt = rows * rmax
            cp = lax.slice(cols_flat, (off,), (off + cnt,))
            vp = lax.slice(vals_flat, (off,), (off + cnt,)).reshape(
                rows, rmax)
            off += cnt
            g = b_cat[cp].reshape(rows, rmax, 256)
            hi = g[:, :, :n]
            lo = g[:, :, n:]
            s = jnp.sum(
                vp[:, :, None] * (hi.astype(jnp.float64)
                                  + lo.astype(jnp.float64)),
                axis=1)
            outs.append(s.sum(dtype=jnp.float32))
        return jnp.stack(outs).sum()

    t = pipelined(lambda: v4(cols_flat, vals_flat, b_cat), s_arr)
    print(f"v4_pairplane_ms={t:.3f}", flush=True)

    # --- v5: slot-blocked scan: gather 8 slots/step, f64 FMA carry ---
    def v5_seg(cp2, vp2, b_cat, rows, rmax):
        # cp2 (rows, rmax) i32, vp2 (rows, rmax) f64
        nblk = rmax // 8

        def step(carry, blk):
            cpb, vpb = blk  # (rows, 8), (rows, 8)
            g = b_cat[cpb.reshape(-1)]             # (rows*8, 256)
            bg = (g[:, :n].astype(jnp.float64)
                  + g[:, n:].astype(jnp.float64)).reshape(rows, 8, n)
            return carry + jnp.sum(vpb[:, :, None] * bg, axis=1), None

        cb = jnp.moveaxis(cp2.reshape(rows, nblk, 8), 1, 0)
        vb = jnp.moveaxis(vp2.reshape(rows, nblk, 8), 1, 0)
        init = jnp.zeros((rows, n), jnp.float64)
        out, _ = lax.scan(step, init, (cb, vb))
        return out

    @jax.jit
    def v5(cols_flat, vals_flat, b_cat):
        outs = []
        off = 0
        for rmax, rows in segs:
            cnt = rows * rmax
            cp = lax.slice(cols_flat, (off,), (off + cnt,)).reshape(
                rows, rmax)
            vp = lax.slice(vals_flat, (off,), (off + cnt,)).reshape(
                rows, rmax)
            off += cnt
            c = v5_seg(cp, vp, b_cat, rows, rmax)
            outs.append(c.sum(dtype=jnp.float32))
        return jnp.stack(outs).sum()

    t = pipelined(lambda: v5(cols_flat, vals_flat, b_cat), s_arr)
    print(f"v5_scan8_ms={t:.3f}", flush=True)

    # --- v9: v4 form as the FULL kernel (un-permute + concat) --------
    @jax.jit
    def v9(cols_flat, vals_flat, b_cat):
        outs = []
        off = 0
        for rmax, rows in segs:
            cnt = rows * rmax
            cp = lax.slice(cols_flat, (off,), (off + cnt,))
            vp = lax.slice(vals_flat, (off,), (off + cnt,)).reshape(
                rows, rmax)
            off += cnt
            g = b_cat[cp].reshape(rows, rmax, 256)
            hi = g[:, :, :n]
            lo = g[:, :, n:]
            c = jnp.sum(
                vp[:, :, None] * (hi.astype(jnp.float64)
                                  + lo.astype(jnp.float64)),
                axis=1)
            outs.append(c)
        return jnp.concatenate(outs)[invpos]

    t = pipelined(lambda: v9(cols_flat, vals_flat, b_cat), s_arr)
    print(f"v9_full_v4form_ms={t:.3f}", flush=True)
    got = np.asarray(v9(cols_flat, vals_flat, b_cat))
    print(f"v9_err={np.abs(got - oracle).max():.3e}", flush=True)

    # --- v10: f32 path, reshape-first form ---------------------------
    Af = formats.to_device(Asp.astype(np.float32))
    bf = b.astype(jnp.float32)
    segs32, cols32, vals32, invpos32 = Af.ell_parts_binned()
    t = pipelined(lambda: hops._real_spmm(Af, Af.data, bf, False), s_arr)
    print(f"v10_f32_current_ms={t:.3f}", flush=True)

    @jax.jit
    def v10(cols_flat, vals_flat, bf):
        outs = []
        off = 0
        for rmax, rows in segs32:
            cnt = rows * rmax
            cp = lax.slice(cols_flat, (off,), (off + cnt,))
            vp = lax.slice(vals_flat, (off,), (off + cnt,)).reshape(
                rows, rmax)
            off += cnt
            g = bf[cp].reshape(rows, rmax, n)
            outs.append(jnp.sum(vp[:, :, None] * g, axis=1))
        return jnp.concatenate(outs)[invpos32]

    t = pipelined(lambda: v10(cols32, vals32, bf), s_arr)
    print(f"v10_f32_reshapefirst_ms={t:.3f}", flush=True)

    # --- v7: df64 pair accumulation, f32 ops only --------------------
    # products p = v*(hi+lo) and running sum kept as (s_hi, s_lo) f32
    # pairs via two_sum — exact to ~2^-48, no f64 VPU emulation.
    vh = vals_flat.astype(jnp.float32)
    vl = (vals_flat - vh.astype(jnp.float64)).astype(jnp.float32)

    @jax.jit
    def v7(cols_flat, vh, vl, b_cat):
        outs = []
        off = 0
        for rmax, rows in segs:
            cnt = rows * rmax
            cp = lax.slice(cols_flat, (off,), (off + cnt,))
            vhp = lax.slice(vh, (off,), (off + cnt,)).reshape(rows, rmax)
            vlp = lax.slice(vl, (off,), (off + cnt,)).reshape(rows, rmax)
            off += cnt
            g = b_cat[cp].reshape(rows, rmax, 256)
            ghi = g[:, :, :n]
            glo = g[:, :, n:]

            # exact product v*b as df64 with f32 two-prod via fma-free
            # split: p_hi = vh*ghi (rounded), err recovered with
            # Dekker's two_prod needs fma; approximate with the cross
            # terms only (drops vl*glo ~ 2^-48 rel):
            p_hi = vhp[:, :, None] * ghi
            p_lo = (vhp[:, :, None] * glo + vlp[:, :, None] * ghi)

            # sum along rmax: accumulate hi and lo in f32 separately,
            # then combine in f64 once (error: rmax*2^-24 on the lo
            # plane only -> ~2^-24 * 2^-24 rel = fine; hi plane f32 sum
            # loses rmax*2^-24 REL -- recovered by summing hi in f64?
            # No: this probe measures the CHEAPEST possible pair form:
            s_hi = jnp.sum(p_hi.astype(jnp.float64), axis=1)
            s_lo = jnp.sum(p_lo, axis=1, dtype=jnp.float32)
            c = s_hi + s_lo.astype(jnp.float64)
            outs.append(c.sum(dtype=jnp.float32))
        return jnp.stack(outs).sum()

    t = pipelined(lambda: v7(cols_flat, vh, vl, b_cat), s_arr)
    print(f"v7_pairacc_ms={t:.3f}", flush=True)

    # --- v8: f64 b gathered directly (X64 pair gather) ---------------
    @jax.jit
    def v8(cols_flat, vals_flat, b):
        outs = []
        off = 0
        for rmax, rows in segs:
            cnt = rows * rmax
            cp = lax.slice(cols_flat, (off,), (off + cnt,))
            vp = lax.slice(vals_flat, (off,), (off + cnt,)).reshape(
                rows, rmax)
            off += cnt
            bg = b[cp].reshape(rows, rmax, n)
            c = jnp.sum(vp[:, :, None] * bg, axis=1)
            outs.append(c.sum(dtype=jnp.float32))
        return jnp.stack(outs).sum()

    t = pipelined(lambda: v8(cols_flat, vals_flat, b), s_arr)
    print(f"v8_f64gather_ms={t:.3f}", flush=True)

    # sanity: v3 matches oracle
    @jax.jit
    def full_v3(cols_flat, vals_flat, b_cat):
        outs = []
        off = 0
        for rmax, rows in segs:
            cnt = rows * rmax
            cp = lax.slice(cols_flat, (off,), (off + cnt,))
            vp = lax.slice(vals_flat, (off,), (off + cnt,)).reshape(
                rows, rmax)
            off += cnt
            g = b_cat[cp]
            bg = (g[:, :n].astype(jnp.float64)
                  + g[:, n:].astype(jnp.float64)).reshape(rows, rmax, n)
            outs.append(jnp.sum(vp[:, :, None] * bg, axis=1))
        return jnp.concatenate(outs)[invpos]

    got = np.asarray(full_v3(cols_flat, vals_flat, b_cat))
    print(f"v3_err={np.abs(got - oracle).max():.3e}", flush=True)


if __name__ == "__main__":
    main()
