"""Shared helpers for Pallas TPU kernels.

Kernels in this package run compiled on TPU and in interpreter mode
elsewhere (CPU test mesh), chosen automatically per backend.
"""

from __future__ import annotations

import jax

LANE = 128      # TPU lane width (fixed)
SUBLANE_F32 = 8  # min sublane tile for f32


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


def round_up(x: int, m: int) -> int:
    return cdiv(x, m) * m


def on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def interpret_mode() -> bool:
    """Pallas interpret=True everywhere except real TPU."""
    return not on_tpu()
