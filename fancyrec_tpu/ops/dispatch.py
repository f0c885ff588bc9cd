"""Kernel dispatch policy: force portable (pure-XLA) lowerings.

The Pallas fast paths (ops/gru_scan.py, ops/brand_pallas.py) auto-gate on
"single TPU device at trace time". That is the right default for live
training, but it is a property of the *tracing process*, not of the traced
program -- a serialized artifact (jax.export / StableHLO) produced on a
TPU host would bake a Mosaic custom call into bytes that must also load
on CPU or on a future multi-device runtime. Serialization paths wrap
tracing in `portable_lowering()` so every auto-gated kernel picks its
pure-XLA fallback (proven numerically equivalent in the kernel tests).
"""

from __future__ import annotations

import threading
from contextlib import contextmanager

_STATE = threading.local()


def portable_mode() -> bool:
    """True while tracing under `portable_lowering()` (thread-local)."""
    return getattr(_STATE, "portable", False)


@contextmanager
def portable_lowering():
    """Force auto-gated Pallas kernels to their XLA fallbacks while tracing."""
    prev = getattr(_STATE, "portable", False)
    _STATE.portable = True
    try:
        yield
    finally:
        _STATE.portable = prev
