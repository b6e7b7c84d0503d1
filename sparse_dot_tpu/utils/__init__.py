from .debug import (
    set_debug_mode,
    debug_print,
    debug_timer,
    print_backend_debug,
    is_debug_mode,
)

__all__ = [
    "set_debug_mode",
    "debug_print",
    "debug_timer",
    "print_backend_debug",
    "is_debug_mode",
]
