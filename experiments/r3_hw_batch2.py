"""Round-3 hardware batch #2.

1. random-row gather bandwidth (the honest SpMM roofline denominator)
2. lax.sort variants at 4M (i32 vs i64 keys, payload widths, stable)
3. 1M x 1M ESC with the new host-plan cache (+ per-phase decomposition)
4. adaptive ESC warm re-check
"""
import time
import traceback

import numpy as np
import scipy.sparse as sps
import jax
import jax.numpy as jnp
from jax import lax
from functools import partial


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


def _pipe(fn, reps=6):
    def run_all():
        return float(jnp.stack(
            [fn().astype(jnp.float32).sum() for _ in range(reps)]
        ).sum())
    run_all(); run_all()
    t0 = time.perf_counter()
    run_all()
    return (time.perf_counter() - t0) * 1e3 / reps


from sparse_dot_tpu import formats  # noqa: E402
from sparse_dot_tpu.config import config  # noqa: E402
from sparse_dot_tpu.ops import host as hops, _xla  # noqa: E402
import sparse_dot_tpu as sdt  # noqa: E402


@phase("1. random-row gather bandwidth")
def p1():
    rng = np.random.default_rng(0)
    k, n, nnz = 10000, 128, 1_000_000
    idx = jnp.asarray(rng.integers(0, k, nnz).astype(np.int32))

    for name, dt, cols in (("f32 512B rows", np.float32, n),
                           ("f32 1KB rows", np.float32, 2 * n)):
        b = jnp.asarray(rng.random((k, cols)).astype(dt))

        @jax.jit
        def g(b=b):
            return b[idx].sum(axis=0)

        t = _pipe(g)
        gb = nnz * cols * np.dtype(dt).itemsize / 1e9
        log(f"gather {name}: {t:.3f} ms -> {gb / (t * 1e-3):.0f} GB/s")


@phase("2. sort variants at 4M")
def p2():
    rng = np.random.default_rng(1)
    N = 1 << 22
    k32 = jnp.asarray(rng.integers(0, 1 << 30, N).astype(np.int32))
    k64 = jnp.asarray(rng.integers(0, 1 << 40, N).astype(np.int64))
    v64 = jnp.asarray(rng.random(N))
    v32 = jnp.asarray(rng.random(N).astype(np.float32))
    i32 = jnp.arange(N, dtype=jnp.int32)

    cases = {
        "i32key+f64": lambda: lax.sort((k32, v64), num_keys=1)[1],
        "i64key+f64": lambda: lax.sort((k64, v64), num_keys=1)[1],
        "i32key+f32": lambda: lax.sort((k32, v32), num_keys=1)[1],
        "i32key+i32": lambda: lax.sort((k32, i32), num_keys=1)[0]
        .astype(jnp.float32),
        "i32key stable +i32+f64": lambda: lax.sort(
            (k32, i32, v64), num_keys=1, is_stable=True)[2],
        "i64key+i32+f64 (esc-like)": lambda: lax.sort(
            (k64, i32, v64), num_keys=1)[2],
    }
    for name, fn in cases.items():
        f = jax.jit(fn)
        try:
            t = _pipe(f)
            log(f"sort {name}: {t:.1f} ms")
        except Exception as e:
            log(f"sort {name}: FAIL {str(e).splitlines()[0][:120]}")


A1m = None


@phase("3. 1M x 1M ESC (plan cache)")
def p3():
    global A1m
    m1 = 1_000_000
    rng1 = np.random.default_rng(7)
    nnz1 = 2_000_000
    A1m = sps.csr_matrix(
        (rng1.standard_normal(nnz1),
         (rng1.integers(0, m1, nnz1), rng1.integers(0, m1, nnz1))),
        shape=(m1, m1))
    A1m.sum_duplicates()
    A1m.sort_indices()
    for rep in range(3):
        t0 = time.perf_counter()
        C1m = sdt.dot_product(A1m, A1m)
        log(f"1M ESC rep{rep}: {(time.perf_counter() - t0) * 1e3:.0f} ms"
            f" nnz={C1m.nnz}")


@phase("3b. 1M block decomposition")
def p3b():
    # Rebuild the single block exactly as the driver does and time the
    # kernel alone, then the readbacks.
    Ad = formats.to_device(A1m)
    Bd = Ad
    from sparse_dot_tpu.ops.host import (_pow2_bucket, _value_channels,
                                         coo_parts)
    m, k = Ad.shape
    n = Bd.shape[1]
    a_indptr_np = np.asarray(Ad.indptr).astype(np.int64)
    a_cols_np = np.asarray(Ad.indices).astype(np.int64)
    b_indptr_np = np.asarray(Bd.indptr).astype(np.int64)
    ext = b_indptr_np[a_cols_np + 1] - b_indptr_np[a_cols_np]
    ext_cum = np.concatenate([[0], np.cumsum(ext)])
    lo, hi = 0, m
    plo, phi = 0, int(a_indptr_np[-1])
    e_blk = int(ext_cum[-1])
    nnz_blk = phi - plo
    mb_bucket = _pow2_bucket(hi - lo, lo=256)
    e_pad = _pow2_bucket(e_blk)
    nnz_pad = _pow2_bucket(nnz_blk, lo=1 << 10)
    key64 = (mb_bucket + 1) * n >= (1 << 31)
    row_nnz = np.diff(a_indptr_np)
    dup_passes = max(0, int(np.ceil(np.log2(max(row_nnz.max(), 1)))))
    log(f"block: mb_bucket={mb_bucket} e_pad={e_pad} nnz_pad={nnz_pad} "
        f"key64={key64} dup_passes={dup_passes}")

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
    b_chans = jnp.stack([Bd.data])
    row_off = jnp.asarray(0, jnp.int32)

    kern = partial(
        _xla.esc_spgemm_block, rows_blk, cols_blk, a_vals_blk,
        offsets_d, e_total, b_indptr_dev, Bd.indices, b_chans, row_off,
        e_pad=e_pad, mb=mb_bucket, n=n, nchan=1, key64=key64,
        dup_passes=dup_passes,
    )

    def scal():
        out = kern()
        return sum(x.astype(jnp.float32).sum() for x in out[:-1])

    def run_all(reps=3):
        return float(jnp.stack([scal() for _ in range(reps)]).sum())
    run_all(1)
    t0 = time.perf_counter()
    run_all(3)
    log(f"1M block kernel device: {(time.perf_counter() - t0) / 3 * 1e3:.0f} ms")

    out = kern()
    t0 = time.perf_counter()
    _ = np.asarray(out[0])
    _ = np.asarray(out[1])
    log(f"1M block full readback: {(time.perf_counter() - t0) * 1e3:.0f} ms")


@phase("4. adaptive ESC warm")
def p4():
    X = sps.random(500, 5000, density=0.212, format="csr",
                   dtype=np.float64, random_state=100)
    Ad = formats.to_device(X)
    Bd = hops._to_csr(formats.to_device(X.T.tocsc()))
    ts = []
    for _ in range(4):
        t0 = time.perf_counter()
        data, idx, indptr = hops.spgemm_esc_arrays(Ad, Bd, np.float64)
        ts.append((time.perf_counter() - t0) * 1e3)
    log(f"adaptive ESC ms={[round(t) for t in ts]}")


def main():
    t0 = time.time()
    x = jnp.ones((8,))
    float(x.sum())
    log(f"warm after {time.time() - t0:.0f}s")
    for p in (p1, p2, p3, p3b, p4):
        p()
    log("BATCH2 DONE")


if __name__ == "__main__":
    main()
