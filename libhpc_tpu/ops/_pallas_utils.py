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


def tile_cumsum(x, axis: int):
    """Inclusive prefix sum along `axis` of a 2D static-shape tile, built
    from log2(n) shift-adds (Hillis–Steele). Mosaic does not lower `cumsum`
    inside kernels, so kernels use this instead — it is the literal TPU
    analog of the reference's warp-scan
    (lib/gpu/util/include/cudaHelper.cuh:33-60: __shfl_up_sync ladder).

    Validated compiled on v5e for both axes of (sublane, lane) tiles; keep
    the non-scanned dimension full-width (Mosaic rejects shift-concats on
    width-1 arrays: 'offset mismatch on non-concat dimension')."""
    import jax.numpy as jnp

    n = x.shape[axis]
    d = 1
    while d < n:
        zeros_shape = list(x.shape)
        zeros_shape[axis] = d
        zeros = jnp.zeros(zeros_shape, x.dtype)
        shifted = jnp.concatenate(
            [zeros, jax.lax.slice_in_dim(x, 0, n - d, axis=axis)], axis=axis
        )
        x = x + shifted
        d *= 2
    return x
