"""Does one (nnz -> (size, W)) windowed set-scatter beat W separate
(nnz -> size) scatters?  XLA:TPU serializes scatters per INDEX, so
writing hi|lo|indicator as one 3-wide row per index could collapse the
densify phase's three scatters into one."""
import time
import numpy as np
import jax
import jax.numpy as jnp


def log(s):
    print(time.strftime("%H:%M:%S"), s, flush=True)


def pipelined(fn, reps=6, warmup=2):
    def run_all():
        return float(jnp.stack(
            [fn().astype(jnp.float32).sum() for _ in range(reps)]
        ).sum())
    for _ in range(warmup):
        run_all()
    best = None
    for _ in range(2):
        t0 = time.perf_counter()
        run_all()
        dt = (time.perf_counter() - t0) * 1e3
        best = dt if best is None else min(best, dt)
    return best / reps


def main():
    x = jnp.ones((8,))
    float(x.sum())
    log("warm")
    rng = np.random.default_rng(0)
    nnz, size = 530_000, 2_500_000
    dest = jnp.asarray(
        np.sort(rng.choice(size, nnz, replace=False)).astype(np.int32))
    hi = jnp.asarray(rng.random(nnz).astype(np.float32))
    lo = jnp.asarray((rng.random(nnz) * 1e-8).astype(np.float32))

    @jax.jit
    def two_scatters(hi, lo):
        a = jnp.zeros((size,), jnp.float32).at[dest].set(
            hi, mode="drop", unique_indices=True,
            indices_are_sorted=True)
        b = jnp.zeros((size,), jnp.float32).at[dest].set(
            lo, mode="drop", unique_indices=True,
            indices_are_sorted=True)
        return a + b

    @jax.jit
    def one_scatter_w2(hi, lo):
        upd = jnp.stack([hi, lo], axis=1)
        buf = jnp.zeros((size, 2), jnp.float32).at[dest].set(
            upd, mode="drop", unique_indices=True,
            indices_are_sorted=True)
        return buf[:, 0] + buf[:, 1]

    @jax.jit
    def one_scatter_w3(hi, lo):
        upd = jnp.stack([hi, lo, jnp.ones_like(hi)], axis=1)
        buf = jnp.zeros((size, 3), jnp.float32).at[dest].set(
            upd, mode="drop", unique_indices=True,
            indices_are_sorted=True)
        return buf[:, 0] + buf[:, 1] + buf[:, 2]

    @jax.jit
    def one_scatter_w4(hi, lo):
        upd = jnp.stack([hi, lo, jnp.ones_like(hi),
                         jnp.zeros_like(hi)], axis=1)
        buf = jnp.zeros((size, 4), jnp.float32).at[dest].set(
            upd, mode="drop", unique_indices=True,
            indices_are_sorted=True)
        return buf[:, 0] + buf[:, 1] + buf[:, 2]

    for name, fn in (("two separate", two_scatters),
                     ("one w=2", one_scatter_w2),
                     ("one w=3", one_scatter_w3),
                     ("one w=4", one_scatter_w4)):
        try:
            r1 = np.asarray(fn(hi, lo))
            r0 = np.asarray(two_scatters(hi, lo))
            extra = 1.0 if "w=3" in name or "w=4" in name else 0.0
            ok = np.allclose(
                r1.sum(), r0.sum() + extra * nnz, rtol=1e-5)
            t = pipelined(lambda: fn(hi, lo))
            log(f"{name}: {t:.2f} ms (check={'OK' if ok else 'BAD'})")
        except Exception as e:
            log(f"{name}: FAIL {str(e).splitlines()[0][:140]}")

    # --- windowed GATHER: the ESC expansion is 93% gathers ------------
    gsize, gn = 2_097_152, 1 << 22
    gidx = jnp.asarray(
        np.sort(rng.integers(0, gsize, gn)).astype(np.int32))
    cols4 = jnp.asarray(rng.random((gsize, 4)).astype(np.float32))
    c1 = cols4[:, 0]
    c2 = cols4[:, 1]
    c3 = cols4[:, 2]
    c4 = cols4[:, 3]

    @jax.jit
    def four_gathers(c1, c2, c3, c4):
        return c1[gidx] + c2[gidx] + c3[gidx] + c4[gidx]

    @jax.jit
    def one_window_gather(cols4):
        g = cols4[gidx]
        return g[:, 0] + g[:, 1] + g[:, 2] + g[:, 3]

    for name, fn, args in (
        ("four 1-wide gathers", four_gathers, (c1, c2, c3, c4)),
        ("one 4-wide gather", one_window_gather, (cols4,)),
    ):
        r = np.asarray(fn(*args))
        r0 = np.asarray(four_gathers(c1, c2, c3, c4))
        ok = np.allclose(r, r0)
        t = pipelined(lambda: fn(*args))
        log(f"{name}: {t:.2f} ms (check={'OK' if ok else 'BAD'})")

    log("SCATTER PROBE DONE")


if __name__ == "__main__":
    main()
