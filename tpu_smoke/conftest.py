"""TPU smoke-suite configuration: unlike ``tests/`` (which pins the CPU
backend for the full oracle matrix), this suite runs on whatever real
accelerator the environment provides and SKIPS itself on CPU.

Run with:  python -m pytest tpu_smoke/ -q
"""

import jax
import pytest


def pytest_collection_modifyitems(config, items):
    if jax.default_backend() == "cpu":
        skip = pytest.mark.skip(
            reason="TPU smoke suite requires an accelerator backend"
        )
        for item in items:
            item.add_marker(skip)
