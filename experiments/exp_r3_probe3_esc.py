"""ESC block-body decomposition on the headline workload: where do the
~450 ms/block go?"""
import time
from functools import partial
import numpy as np
import scipy.sparse as sps
import jax
import jax.numpy as jnp
from jax import lax

from sparse_dot_tpu import formats
from sparse_dot_tpu.config import config
from sparse_dot_tpu.ops import _xla, host as hops


def pipelined(fn, scalarize, reps=4, warmup=1):
    def run_all():
        scalars = [scalarize(fn()) for _ in range(reps)]
        return float(jnp.stack(scalars).sum())
    for _ in range(warmup):
        run_all()
    t0 = time.perf_counter()
    run_all()
    return (time.perf_counter() - t0) * 1e3 / reps


def s_tuple(t):
    return sum(x.astype(jnp.float32).sum() for x in t)


def main():
    x = jnp.ones((8,))
    float(x.sum())

    X = sps.random(500, 5000, density=0.212, format="csr",
                   dtype=np.float64, random_state=100)
    XT = X.T.tocsc()
    A = formats.to_device(X)
    B = hops._to_csr(formats.to_device(XT))
    m, k = A.shape
    n = B.shape[1]

    # replicate the driver's planning for the FIRST block
    a_indptr_np = np.asarray(A.indptr).astype(np.int64)
    a_cols_np = np.asarray(A.indices).astype(np.int64)
    b_indptr_np = np.asarray(B.indptr).astype(np.int64)
    ext = b_indptr_np[a_cols_np + 1] - b_indptr_np[a_cols_np]
    ext_cum = np.concatenate([[0], np.cumsum(ext)])
    row_ext = ext_cum[a_indptr_np[1:]] - ext_cum[a_indptr_np[:-1]]
    row_nnz = a_indptr_np[1:] - a_indptr_np[:-1]
    budget = 1 << 22

    lo = 0
    hi = lo + 1
    e_blk = int(row_ext[lo])
    while hi < m and e_blk + int(row_ext[hi]) <= budget:
        e_blk += int(row_ext[hi])
        hi += 1
    mb = hi - lo
    plo, phi = int(a_indptr_np[lo]), int(a_indptr_np[hi])
    nnz_blk = phi - plo
    mb_bucket = hops._pow2_bucket(mb, lo=256)
    e_pad = hops._pow2_bucket(e_blk)
    nnz_pad = hops._pow2_bucket(nnz_blk, lo=1 << 10)
    max_dup = int(row_nnz[lo:hi].max())
    dup_passes = max(0, int(np.ceil(np.log2(max(max_dup, 1)))))
    print(f"block: mb={mb} nnz={nnz_blk} e_blk={e_blk} e_pad={e_pad} "
          f"nnz_pad={nnz_pad} dup_passes={dup_passes}", flush=True)

    rows_full = A.row_indices()
    rows_blk = rows_full[plo:phi].astype(jnp.int32) - lo
    cols_blk = A.indices[plo:phi].astype(jnp.int32)
    chans = [A.data[plo:phi]]
    pad = nnz_pad - nnz_blk
    if pad:
        rows_blk = jnp.concatenate(
            [rows_blk, jnp.full((pad,), mb_bucket, jnp.int32)])
        cols_blk = jnp.concatenate(
            [cols_blk, jnp.zeros((pad,), jnp.int32)])
        chans = [jnp.concatenate([c, jnp.zeros((pad,), c.dtype)])
                 for c in chans]
    a_vals_blk = jnp.stack(chans)
    offsets = ext_cum[plo: phi + 1] - ext_cum[plo]
    offsets = np.concatenate(
        [offsets, np.full(nnz_pad - nnz_blk, e_blk, np.int64)]
    ).astype(np.int32)
    offsets_d = jnp.asarray(offsets)
    e_total = jnp.asarray(e_blk, jnp.int32)
    b_indptr_dev = jnp.asarray(b_indptr_np.astype(np.int32))
    b_indices_dev = B.indices
    b_chans = jnp.stack([B.data])
    row_off = jnp.asarray(lo, jnp.int32)

    full = partial(_xla.esc_spgemm_block, rows_blk, cols_blk,
                   a_vals_blk, offsets_d, e_total, b_indptr_dev,
                   b_indices_dev, b_chans, row_off,
                   e_pad=e_pad, mb=mb_bucket, n=n, nchan=1,
                   key64=False, dup_passes=dup_passes)
    t = pipelined(full, s_tuple)
    print(f"esc_block_full_ms={t:.1f}", flush=True)

    # stage A: expansion only (segment ids + gathers + products)
    @partial(jax.jit, static_argnames=("e_pad", "mb"))
    def expand_only(rows_blk, cols_blk, a_vals, offsets, e_total,
                    b_indptr, b_indices, b_data, e_pad, mb):
        kdt = jnp.int32
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

    t = pipelined(lambda: expand_only(
        rows_blk, cols_blk, a_vals_blk, offsets_d, e_total,
        b_indptr_dev, b_indices_dev, b_chans, e_pad=e_pad,
        mb=mb_bucket), s_tuple)
    print(f"esc_expand_only_ms={t:.1f}", flush=True)

    key, val = expand_only(rows_blk, cols_blk, a_vals_blk, offsets_d,
                           e_total, b_indptr_dev, b_indices_dev,
                           b_chans, e_pad=e_pad, mb=mb_bucket)

    # stage B: first sort
    @jax.jit
    def sort1(key, val):
        return lax.sort((key, val), dimension=0, num_keys=1)

    t = pipelined(lambda: sort1(key, val), s_tuple)
    print(f"esc_sort1_ms={t:.1f}", flush=True)
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
                  s_tuple)
    print(f"esc_dup_passes_ms={t:.1f} ({dup_passes} passes)", flush=True)

    # stage D: head/seg + compaction sort
    @jax.jit
    def compact(skey, sval):
        svalid = skey < jnp.asarray(mb_bucket, jnp.int32) * n
        head = jnp.concatenate(
            [jnp.ones((1,), jnp.bool_), skey[1:] != skey[:-1]]) & svalid
        seg = _xla.prefix_sum(head) - 1
        count = seg[-1] + 1
        rank = jnp.where(head, seg, e_pad)
        compacted = lax.sort((rank, skey, sval), dimension=0,
                             num_keys=1)
        return compacted[1], compacted[2], count

    t = pipelined(lambda: compact(skey, sval), s_tuple)
    print(f"esc_compact_ms={t:.1f}", flush=True)

    # full ESC wall time at two budgets (sort kernel pinned; the
    # adaptive driver would route this workload to the blocked body)
    config.spgemm_esc_force_sort = True
    for bud in (1 << 22, 1 << 23):
        config.spgemm_esc_block_elements = bud
        t0 = time.perf_counter()
        hops.spgemm_esc_arrays(A, B, np.float64)
        t1 = (time.perf_counter() - t0) * 1e3
        t0 = time.perf_counter()
        hops.spgemm_esc_arrays(A, B, np.float64)
        t2 = (time.perf_counter() - t0) * 1e3
        print(f"esc_e2e_budget{bud >> 20}M_ms={min(t1, t2):.0f}",
              flush=True)
    config.spgemm_esc_block_elements = 1 << 22


if __name__ == "__main__":
    main()
