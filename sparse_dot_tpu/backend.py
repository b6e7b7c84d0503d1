"""Backend capability probing and service introspection.

The reference's init layer locates ``libmkl_rt`` and probes the usable
integer width at import (``_mkl_interface/_load_library.py:31-96``,
``__init__.py:62-125``).  The TPU-native analog probes the XLA backend:
which platform is active, whether it supports complex dtypes natively
(TPU backends do not — complex compute is decomposed into planar
real/imaginary parts by the op layer), and basic device topology.

Also hosts the service-function analogs of MKL's
``MKL_Get_Version(_String)`` / ``MKL_Get_Max_Threads`` /
``MKL_Set_Num_Threads`` family (``_mkl_interface/_cfunctions.py:729-771``).
"""

import functools
import os

import numpy as np

from .config import __version__

# x64 must be enabled so float64/complex128 semantics match the reference
# (scipy/NumPy default to float64).  This must happen before the first JAX
# array is created.
import jax

jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: the tunnel/remote TPU compile path is
# slow (tens of seconds per program), so cache compiled executables
# across processes.  Opt out with SPARSE_DOT_JAX_CACHE=0 or point the
# env var at another directory.
_cache_dir = os.environ.get("SPARSE_DOT_JAX_CACHE", "")
if _cache_dir != "0":
    if not _cache_dir:
        _cache_dir = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".jax_cache",
        )
    try:
        os.makedirs(_cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", _cache_dir)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

import jax.numpy as jnp  # noqa: E402


@functools.lru_cache(maxsize=None)
def default_platform():
    return jax.default_backend()


@functools.lru_cache(maxsize=None)
def supports_native_complex(platform=None):
    """True if the active XLA backend compiles complex dtypes.

    CPU/GPU do; TPU backends generally do not, in which case complex ops
    run as four real products (planar decomposition) in the op layer.
    """
    platform = platform or default_platform()
    if platform in ("cpu", "gpu", "cuda", "rocm"):
        return True
    if platform == "tpu":
        # XLA:TPU has no native complex support; worse, probing it
        # through a tunnel backend can poison the client with a
        # deferred UNIMPLEMENTED that surfaces at the next device_put
        # (or hang the remote compile helper), so never attempt the
        # compile here — complex runs planar (4 real products).
        return False
    # Unknown platform: probe once with a tiny program.  Tunnel
    # backends defer execution (block_until_ready is a no-op), so the
    # probe must READ a value to prove the program actually ran.
    try:
        x = jnp.ones((2, 2), dtype=np.complex64)
        return bool(np.isfinite(complex((x * x).sum())))
    except Exception:
        return False


def _probe_compiles(fn):
    """True when the program compiles AND produces a readable value on
    the active backend (tunnel backends defer execution, so the read is
    the real test)."""
    try:
        out = jax.tree_util.tree_leaves(fn())[0]
        float(jnp.asarray(out).astype(jnp.float32).sum())
        return True
    except Exception:
        return False


@functools.lru_cache(maxsize=None)
def supports_full_f64_range():
    """True when the backend represents f64's full dynamic range.

    XLA:TPU's X64 rewriter emulates f64 as a pair of f32 ops, so the
    EXPONENT range is f32's: magnitudes above ~3.4e38 become inf and
    tiny magnitudes flush to zero at the device boundary (measured on
    v5e: ``jnp.asarray(np.float64(1e100))`` reads back inf).  Probed
    with one scalar round-trip and cached.  The op layer warns when
    f64 operands exceed the representable window on such backends
    (MKL computes those inputs exactly; silence would be a silent
    wrong answer)."""
    try:
        return bool(np.isfinite(float(jnp.asarray(np.float64(1e100)))))
    except Exception:
        return False


@functools.lru_cache(maxsize=None)
def supports_f64_lu():
    """XLA:TPU's LuDecomposition expander only implements F32/C64
    ("Only F32 and C64 types are implemented in LuDecomposition" —
    measured on v5e); on such backends the direct solver factors in
    f32 and refines iteratively to f64 accuracy.  Accelerators take
    the conservative answer without probing: a failed probe costs a
    full compile round-trip, and even a successful emulated-f64
    factorization would be slower than the mixed-precision path."""
    if default_platform() != "cpu":
        return False
    import jax.scipy.linalg as jsl

    a = jnp.asarray(np.eye(4) * 2.0 + np.ones((4, 4)))
    return _probe_compiles(lambda: jsl.lu_factor(a))


@functools.lru_cache(maxsize=None)
def supports_f64_qr():
    """f64 Householder QR availability.  On TPU the X64 rewriter turns
    the QR loop into an enormous program (compiles stall for minutes on
    v5e), so accelerators route f64 least-squares to the CGLS device
    loop instead — faster AND exact."""
    if default_platform() != "cpu":
        return False
    a = jnp.asarray(np.eye(4) * 2.0 + np.ones((4, 4)))
    return _probe_compiles(lambda: jnp.linalg.qr(a))


# ---------------------------------------------------------------------------
# Service functions (MKL service-family analogs)
# ---------------------------------------------------------------------------


def get_version():
    """Return a dict describing the backend, analogous to ``MKLVersion``
    (``_mkl_interface/_structs.py:66-76``)."""
    return {
        "framework_version": __version__,
        "jax_version": jax.__version__,
        "platform": default_platform(),
        "device_kind": jax.devices()[0].device_kind if jax.devices() else "none",
        "num_devices": jax.device_count(),
    }


def get_version_string():
    """Analog of ``mkl_get_version_string``
    (``_mkl_interface/_cfunctions.py:753-768``)."""
    v = get_version()
    return (
        f"sparse_dot_tpu {v['framework_version']} on JAX {v['jax_version']} "
        f"[{v['platform']}: {v['device_kind']} x{v['num_devices']}]"
    )


_num_threads_hint = [None]


def get_max_threads():
    """Analog of ``mkl_get_max_threads`` (``_cfunctions.py:738``): the
    parallel width of the backend.  Returns the explicit hint if one was
    set (so set/get round-trip like MKL's); otherwise the local device
    count on accelerators or the host CPU count on CPU."""
    if _num_threads_hint[0] is not None:
        return _num_threads_hint[0]
    platform = default_platform()
    if platform == "cpu":
        return os.cpu_count() or 1
    return jax.local_device_count()


def get_device_count():
    return jax.device_count()


def set_num_threads(n):
    """Accepted for API compatibility with ``mkl_set_num_threads``
    (``_cfunctions.py:742-747``).  XLA owns its own scheduling, so this
    records a hint rather than reconfiguring a thread pool."""
    if n < 1:
        raise ValueError("Number of threads must be a positive integer")
    _num_threads_hint[0] = int(n)


def set_num_threads_local(n):
    """Analog of ``mkl_set_num_threads_local`` (``_cfunctions.py:745``):
    returns the previous setting; 0 resets to the global default."""
    previous = _num_threads_hint[0] or 0
    if n == 0:
        _num_threads_hint[0] = None
        return previous
    set_num_threads(n)
    return previous


def free_buffers():
    """Analog of ``mkl_free_buffers`` (``_cfunctions.py:747``): release
    cached backend memory where possible."""
    jax.clear_caches()
