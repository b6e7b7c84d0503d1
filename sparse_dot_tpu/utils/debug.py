"""Debug / tracing utilities.

Analog of the reference's debug machinery
(``/root/reference/sparse_dot_mkl/_mkl_interface/_common.py:97-155``):
a module-global debug flag, a conditional printer, a phase wall-clock
timer, and a per-call backend info dump.  On top of that, phases are
annotated with ``jax.profiler`` trace markers so device traces show the
same phase structure the reference's ``debug_timer`` printed.
"""

import time

import jax

from ..config import config


def set_debug_mode(debug):
    """Activate or deactivate debug mode.  Analog of
    ``sparse_dot_mkl.set_debug_mode`` (``_common.py:97-105``)."""
    if not isinstance(debug, bool):
        raise ValueError("Debug mode must be set with a boolean")
    config.debug = debug


def is_debug_mode():
    return config.debug


def debug_print(msg):
    """Print a message only when debug mode is on (``_common.py:125-135``)."""
    if config.debug:
        print(msg)


def debug_timer(msg=None, old_time=None):
    """Wall-clock phase timer (``_common.py:138-155``).

    Usage::

        t = debug_timer()
        ...work...
        t = debug_timer("Phase name", t)
    """
    if not config.debug:
        return None
    now = time.time()
    if msg is not None and old_time is not None:
        print(f"{msg}: {(now - old_time) * 1000:.3f} ms")
    return now


def print_backend_debug():
    """Per-call backend info dump, analog of ``print_mkl_debug``
    (``_common.py:108-122``)."""
    if not config.debug:
        return
    from ..backend import get_version_string

    print(get_version_string())
    print(f"Index interface: {config.interface} ({config.index_dtype})")


class trace_phase:
    """Context manager adding a jax.profiler annotation + debug timing."""

    def __init__(self, name):
        self.name = name
        self._trace = None
        self._t = None

    def __enter__(self):
        self._trace = jax.profiler.TraceAnnotation(self.name)
        self._trace.__enter__()
        self._t = debug_timer()
        return self

    def __exit__(self, *exc):
        debug_timer(self.name, self._t)
        return self._trace.__exit__(*exc)
