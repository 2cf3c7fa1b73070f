"""Pallas TPU kernels (flash decode/prefill attention, in-place cache append,
fused dequant matmul) + the interpret-mode switch.

``use_interpret()`` decides whether pallas_calls lower to Mosaic (TPU) or run
in interpret mode (CPU tests, the 8-virtual-device mesh, the driver's
multi-chip dry run).  Auto mode keys off the default backend so the same
engine code path — including the shard_map-wrapped mesh kernels — runs
everywhere.
"""

from __future__ import annotations

import jax

_INTERPRET = None  # None = auto: interpret unless running on real TPU


def set_interpret(value) -> None:
    """Force pallas interpret mode on/off (None restores auto)."""
    global _INTERPRET
    _INTERPRET = value


def use_interpret() -> bool:
    if _INTERPRET is not None:
        return _INTERPRET
    # "axon" is the remote-TPU relay platform; anything else (cpu) interprets
    return jax.default_backend() not in ("tpu", "axon")
