"""Stage decomposition of the ESC block body at the 1M x 1M fixture
(one 4.2M-slot block, int64 keys, 4 dup passes): where do the 456 ms
go?"""
import time
from functools import partial

import numpy as np
import scipy.sparse as sps
import jax
import jax.numpy as jnp
from jax import lax

from sparse_dot_tpu import formats
from sparse_dot_tpu.ops import _xla, host as hops


def log(s):
    print(time.strftime("%H:%M:%S"), s, flush=True)


def pipelined(fn, scalarize, reps=3, warmup=1):
    def run_all():
        scalars = [scalarize(fn()) for _ in range(reps)]
        return float(jnp.stack(scalars).sum())
    for _ in range(warmup):
        run_all()
    t0 = time.perf_counter()
    run_all()
    return (time.perf_counter() - t0) * 1e3 / reps


def s_arr(r):
    return r.astype(jnp.float32).sum()


def s_tuple(t):
    return sum(x.astype(jnp.float32).sum() for x in t)


def main():
    x = jnp.ones((8,))
    float(x.sum())
    log("warm")

    m1 = 1_000_000
    rng1 = np.random.default_rng(7)
    nnz1 = 2_000_000
    A1m = sps.csr_matrix(
        (rng1.standard_normal(nnz1),
         (rng1.integers(0, m1, nnz1), rng1.integers(0, m1, nnz1))),
        shape=(m1, m1))
    A1m.sum_duplicates()
    A1m.sort_indices()
    Ad = formats.to_device(A1m)
    Bd = Ad
    m, k = Ad.shape
    n = Bd.shape[1]
    a_indptr_np = np.asarray(Ad.indptr).astype(np.int64)
    a_cols_np = np.asarray(Ad.indices).astype(np.int64)
    b_indptr_np = np.asarray(Bd.indptr).astype(np.int64)
    ext = b_indptr_np[a_cols_np + 1] - b_indptr_np[a_cols_np]
    ext_cum = np.concatenate([[0], np.cumsum(ext)])
    e_blk = int(ext_cum[-1])
    nnz_blk = int(a_indptr_np[-1])
    mb_bucket = hops._pow2_bucket(m, lo=256)
    e_pad = hops._pow2_bucket(e_blk)
    nnz_pad = hops._pow2_bucket(nnz_blk, lo=1 << 10)
    dup_passes = 4
    log(f"e_pad={e_pad} nnz_pad={nnz_pad} mb={mb_bucket}")

    perm_np = np.argsort(a_cols_np, kind="stable").astype(np.int32)
    perm = jnp.asarray(perm_np)
    rows_full = Ad.row_indices()
    rows_blk = (rows_full.astype(jnp.int32))[perm]
    cols_blk = Ad.indices.astype(jnp.int32)[perm]
    chans = [Ad.data[perm]]
    pad = nnz_pad - nnz_blk
    rows_blk = jnp.concatenate(
        [rows_blk, jnp.full((pad,), mb_bucket, jnp.int32)])
    cols_blk = jnp.concatenate([cols_blk, jnp.zeros((pad,), jnp.int32)])
    chans = [jnp.concatenate([c, jnp.zeros((pad,), c.dtype)])
             for c in chans]
    a_vals_blk = jnp.stack(chans)
    ext_blk = ext[perm_np]
    offsets = np.concatenate(
        [[0], np.cumsum(ext_blk), np.full(pad, e_blk, np.int64)]
    ).astype(np.int32)
    offsets_d = jnp.asarray(offsets)
    e_total = jnp.asarray(e_blk, jnp.int32)
    b_indptr_dev = jnp.asarray(b_indptr_np.astype(np.int32))
    b_indices_dev = Bd.indices
    b_chans = jnp.stack([Bd.data])

    kdt = jnp.int64

    # stage A: expansion (segment ids + gathers + products)
    @partial(jax.jit, static_argnames=("e_pad", "mb"))
    def expand_only(rows_blk, cols_blk, a_vals, offsets, e_total,
                    b_indptr, b_indices, b_data, e_pad, mb):
        nnz_pad_ = rows_blk.shape[0]
        t_ = jnp.arange(e_pad, dtype=offsets.dtype)
        j = _xla.segment_ids_from_offsets(offsets, e_pad, nnz_pad_ - 1)
        valid = t_ < e_total
        pos = (t_ - offsets[j]).astype(jnp.int32)
        bpos = jnp.clip(b_indptr[cols_blk[j]].astype(jnp.int32) + pos,
                        0, b_indices.shape[0] - 1)
        row = rows_blk[j].astype(kdt)
        col = b_indices[bpos].astype(kdt)
        row = jnp.where(valid, row, mb)
        key = row * n + jnp.where(valid, col, 0)
        v = a_vals[0][j] * b_data[0][bpos]
        return key, jnp.where(valid, v, 0)

    run_exp = lambda: expand_only(  # noqa: E731
        rows_blk, cols_blk, a_vals_blk, offsets_d, e_total,
        b_indptr_dev, b_indices_dev, b_chans, e_pad=e_pad,
        mb=mb_bucket)
    t = pipelined(run_exp, lambda kv: s_arr(kv[1]))
    log(f"expand_only_ms={t:.1f}")

    # stage A1: segment ids alone
    @partial(jax.jit, static_argnames=("e_pad",))
    def segids(offsets, e_pad):
        return _xla.segment_ids_from_offsets(
            offsets, e_pad, offsets.shape[0] - 2)

    t = pipelined(lambda: segids(offsets_d, e_pad=e_pad), s_arr)
    log(f"segment_ids_ms={t:.1f}")

    key, val = run_exp()

    # stage B: first sort (key + 1 f64 payload)
    @jax.jit
    def sort1(key, val):
        return lax.sort((key, val), dimension=0, num_keys=1)

    t = pipelined(lambda: sort1(key, val), lambda o: s_arr(o[1]))
    log(f"sort1_ms={t:.1f}")
    skey, sval = sort1(key, val)

    # stage C: dup passes
    @partial(jax.jit, static_argnames=("dup_passes",))
    def dups(skey, sval, dup_passes):
        svals = [sval]
        for p in range(dup_passes):
            sh = 1 << p
            same = jnp.concatenate(
                [skey[sh:] == skey[:-sh], jnp.zeros((sh,), jnp.bool_)])
            for c in range(len(svals)):
                shifted = jnp.concatenate(
                    [svals[c][sh:], jnp.zeros((sh,), svals[c].dtype)])
                svals[c] = svals[c] + jnp.where(same, shifted, 0)
        return tuple(svals)

    t = pipelined(lambda: dups(skey, sval, dup_passes=dup_passes),
                  lambda o: s_arr(o[0]))
    log(f"dup_passes_ms={t:.1f} ({dup_passes} passes)")

    # stage D: head/seg + compaction sort
    @jax.jit
    def compact(skey, sval):
        svalid = skey < jnp.asarray(mb_bucket, kdt) * n
        head = jnp.concatenate(
            [jnp.ones((1,), jnp.bool_), skey[1:] != skey[:-1]]) & svalid
        seg = _xla.prefix_sum(head) - 1
        count = seg[-1] + 1
        rank = jnp.where(head, seg, e_pad)
        compacted = lax.sort((rank, skey, sval), dimension=0,
                             num_keys=1)
        return compacted[1], compacted[2], count

    t = pipelined(lambda: compact(skey, sval),
                  lambda o: s_arr(o[1]))
    log(f"compact_ms={t:.1f}")

    # full kernel for reference
    kern = partial(
        _xla.esc_spgemm_block, rows_blk, cols_blk, a_vals_blk,
        offsets_d, e_total, b_indptr_dev, b_indices_dev, b_chans,
        jnp.asarray(0, jnp.int32),
        e_pad=e_pad, mb=mb_bucket, n=n, nchan=1, key64=True,
        dup_passes=dup_passes,
    )
    t = pipelined(kern, lambda o: s_tuple(o[:-1]))
    log(f"full_kernel_ms={t:.1f}")
    log("PROBE5 DONE")


if __name__ == "__main__":
    main()
