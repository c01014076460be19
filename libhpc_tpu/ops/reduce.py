"""Segmented and hierarchical reductions.

TPU-native descendant of the reference's global-reduce tree kernels
(lib/gpu/radix_gpu/include/cuda_global_reduce_from_local.cuh:60-120 — the
hierarchical 1024-fan-in multi-pass reduce): on TPU the tree collapses into
XLA `segment_sum` / tiled Pallas loops, and the cross-chip level becomes
`jax.lax.psum` over a mesh axis (libhpc_tpu.parallel.collectives).

Public API:
  segment_sum / segment_max / segment_min — thin, num_segments-static wrappers
  tree_reduce_sum(x)   — explicit hierarchical 1024-fan-in reduction (parity
                         with the reference's multi-pass loop; same result as
                         jnp.sum but exercises the tiled path)
  row_sum_pallas(x2d)  — Pallas row-wise reduction of a 2D array
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from libhpc_tpu.ops._pallas_utils import LANE, cdiv, interpret_mode

FAN_IN = 1024  # same fan-in as the reference tree


@partial(jax.jit, static_argnames=("num_segments",))
def segment_sum(data, segment_ids, num_segments: int):
    return jax.ops.segment_sum(data, segment_ids, num_segments=num_segments)


@partial(jax.jit, static_argnames=("num_segments",))
def segment_max(data, segment_ids, num_segments: int):
    return jax.ops.segment_max(data, segment_ids, num_segments=num_segments)


@partial(jax.jit, static_argnames=("num_segments",))
def segment_min(data, segment_ids, num_segments: int):
    return jax.ops.segment_min(data, segment_ids, num_segments=num_segments)


@jax.jit
def tree_reduce_sum(x):
    """Multi-pass 1024-fan-in sum — the reference's reduce-until-one loop
    (cuda_global_reduce_from_local.cuh:60-120) expressed with static shapes.

    Each pass pads to a multiple of FAN_IN and sums FAN_IN-wide groups; the
    number of passes is static (derived from input size).
    """
    x = x.reshape(-1)
    while x.shape[0] > 1:
        n = x.shape[0]
        n_pad = cdiv(n, FAN_IN) * FAN_IN
        xp = jnp.zeros((n_pad,), x.dtype).at[:n].set(x)
        x = jnp.sum(xp.reshape(n_pad // FAN_IN, FAN_IN), axis=1)
    return x[0]


def _row_sum_kernel(x_ref, o_ref):
    o_ref[:] = jnp.sum(x_ref[:], axis=1, keepdims=True)


@jax.jit
def row_sum_pallas(x):
    """Row-wise sum of a 2D (M, N) array, tiled over rows."""
    m, n = x.shape
    tile_m = 8
    m_pad = cdiv(m, tile_m) * tile_m
    n_pad = cdiv(n, LANE) * LANE
    xp = jnp.zeros((m_pad, n_pad), x.dtype).at[:m, :n].set(x)
    out = pl.pallas_call(
        _row_sum_kernel,
        grid=(m_pad // tile_m,),
        in_specs=[
            pl.BlockSpec((tile_m, n_pad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec((tile_m, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_pad, 1), x.dtype),
        interpret=interpret_mode(),
    )(xp)
    return out[:m, 0]
