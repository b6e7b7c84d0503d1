"""Can Mosaic/Pallas gather rows of a VMEM-resident table with a
per-element index vector?  Tests several formulations on the real TPU."""
import time
import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

rng = np.random.default_rng(0)
K, N = 2048, 128
ROWS, RMAX = 256, 128
table = jnp.asarray(rng.random((K, N)).astype(np.float32))
idx = jnp.asarray(rng.integers(0, K, (ROWS, RMAX)).astype(np.int32))
vals = jnp.asarray(rng.random((ROWS, RMAX)).astype(np.float32))


def try_one(name, fn):
    try:
        out = fn()
        out = np.asarray(out)
        # oracle
        oracle = (np.asarray(vals)[:, :, None]
                  * np.asarray(table)[np.asarray(idx)]).sum(axis=1)
        err = np.abs(out - oracle).max()
        print(f"{name}: OK err={err:.2e}", flush=True)
        return True
    except Exception as e:
        msg = str(e).split(chr(10))[0][:200]
        print(f"{name}: FAIL {type(e).__name__}: {msg}", flush=True)
        return False


# 1. jnp.take along axis 0 inside kernel
def k_take(idx_ref, vals_ref, table_ref, o_ref):
    ix = idx_ref[...]            # (ROWS, RMAX)
    g = jnp.take(table_ref[...], ix.reshape(-1), axis=0)
    g = g.reshape(ROWS, RMAX, N)
    o_ref[...] = jnp.sum(vals_ref[...][:, :, None] * g, axis=1)


def run_take():
    return pl.pallas_call(
        k_take,
        out_shape=jax.ShapeDtypeStruct((ROWS, N), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(idx, vals, table)


# 2. fori loop over rmax: per-slot row gather via dynamic slice of one
#    row at a time... per (row, slot) scalar loop is too slow; instead
#    loop over RMAX gathering a column of indices at once -> still a
#    vector gather. Try take_along_axis formulation per rmax step.
def k_loop(idx_ref, vals_ref, table_ref, o_ref):
    def body(r, acc):
        ix = idx_ref[:, r]                       # (ROWS,)
        g = jnp.take(table_ref[...], ix, axis=0)  # (ROWS, N)
        return acc + vals_ref[:, r][:, None] * g
    o_ref[...] = lax.fori_loop(0, RMAX, body,
                               jnp.zeros((ROWS, N), jnp.float32))


def run_loop():
    return pl.pallas_call(
        k_loop,
        out_shape=jax.ShapeDtypeStruct((ROWS, N), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(idx, vals, table)


# 3. lax.gather explicit
def k_gather(idx_ref, vals_ref, table_ref, o_ref):
    ix = idx_ref[...].reshape(-1, 1)
    g = lax.gather(
        table_ref[...], ix,
        lax.GatherDimensionNumbers(
            offset_dims=(1,), collapsed_slice_dims=(0,),
            start_index_map=(0,)),
        slice_sizes=(1, N), mode=lax.GatherScatterMode.CLIP,
    )
    g = g.reshape(ROWS, RMAX, N)
    o_ref[...] = jnp.sum(vals_ref[...][:, :, None] * g, axis=1)


def run_gather():
    return pl.pallas_call(
        k_gather,
        out_shape=jax.ShapeDtypeStruct((ROWS, N), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(idx, vals, table)


x = jnp.ones((8,)); float(x.sum())
ok1 = try_one("take_bulk", run_take)
ok2 = try_one("take_loop_rmax", run_loop)
ok3 = try_one("lax_gather", run_gather)

# time whichever worked
def pipelined(fn, reps=8):
    def run_all():
        return float(jnp.stack(
            [fn().sum() for _ in range(reps)]).sum())
    run_all(); run_all()
    t0 = time.perf_counter()
    run_all()
    return (time.perf_counter() - t0) * 1e3 / reps


for name, ok, fn in (("take_bulk", ok1, run_take),
                     ("take_loop_rmax", ok2, run_loop),
                     ("lax_gather", ok3, run_gather)):
    if ok:
        t = pipelined(fn)
        gb = ROWS * RMAX * N * 4 / 1e9
        print(f"{name}: {t:.3f} ms ({gb / (t * 1e-3):.0f} GB/s eff)",
              flush=True)
