"""Exclusive / inclusive scans.

TPU-native descendant of the reference's hierarchical 1024-fan-in exclusive
scan (lib/gpu/radix_gpu/include/cuda_hierarchical_exclusive_scan_localT_1024.cuh,
SURVEY.md §2.11c): upsweep tile scans + top-level scan + downsweep offset
propagation.

On TPU the Pallas grid executes *sequentially* on a core, so the whole
upsweep/downsweep tree collapses into a single pass that keeps a running
carry in SMEM — the idiomatic TPU formulation. Within a (8, 128) VMEM tile
the scan is hierarchical exactly like the reference: lane-wise cumsum (VPU
log-step shifts) composed with a sublane-level scan of row sums.

Public API:
  exclusive_scan(x)         — XLA fallback (jnp.cumsum based), any backend
  exclusive_scan_pallas(x)  — tiled Pallas kernel, 1D f32/i32 input
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from libhpc_tpu.ops._pallas_utils import LANE, cdiv, interpret_mode, tile_cumsum

SUBLANES = 8
WIDE = 512              # lanes per row (4 lane-tiles); 8×512 = 4k elements
TILE = SUBLANES * WIDE  # per grid step — wide rows keep the shift-add scan
                        # static (fast Mosaic compiles) while amortizing the
                        # sequential-grid step overhead


@jax.jit
def exclusive_scan(x):
    """Exclusive prefix sum along the last axis (XLA path)."""
    c = jnp.cumsum(x, axis=-1)
    return c - x


@jax.jit
def inclusive_scan(x):
    return jnp.cumsum(x, axis=-1)


def _scan_tile_kernel(x_ref, o_ref, carry_ref):
    """One (SUBLANES, 128) block per grid step: an in-kernel fori_loop walks
    8-row chunks (the proven Mosaic-compatible scan shape), carrying the
    running prefix in a loop value; the cross-block carry lives in SMEM.
    This is the reference's hierarchical upsweep/downsweep
    (cuda_hierarchical_exclusive_scan_localT_1024.cuh) collapsed onto the
    sequential TPU grid."""
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        carry_ref[0, 0] = jnp.zeros((), x_ref.dtype)

    x = x_ref[0]                                   # (8, WIDE)
    lane_inc = tile_cumsum(x, axis=1)              # within-row scan
    # row-level scan: broadcast row totals to full lane width first —
    # Mosaic rejects shift-concats on width-1 arrays
    row_tot_b = jnp.broadcast_to(lane_inc[:, WIDE - 1 : WIDE], x.shape)
    row_excl = tile_cumsum(row_tot_b, axis=0) - row_tot_b
    carry = carry_ref[0, 0]
    o_ref[0] = carry + row_excl + (lane_inc - x)
    carry_ref[0, 0] = carry + jnp.sum(x)


@partial(jax.jit, static_argnames=())
def exclusive_scan_pallas(x):
    """Tiled exclusive scan of a 1D array via Pallas.

    Pads to a multiple of 1024 (padding-invariant: zeros do not perturb the
    prefix of valid elements).
    """
    (n,) = x.shape
    n_pad = max(TILE, cdiv(n, TILE) * TILE)
    xp = jnp.zeros((n_pad,), x.dtype).at[:n].set(x)
    xt = xp.reshape(n_pad // TILE, SUBLANES, WIDE)
    out = pl.pallas_call(
        _scan_tile_kernel,
        grid=(n_pad // TILE,),
        in_specs=[
            pl.BlockSpec((1, SUBLANES, WIDE), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec((1, SUBLANES, WIDE), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(xt.shape, x.dtype),
        scratch_shapes=[pltpu.SMEM((1, 1), x.dtype)],
        interpret=interpret_mode(),
    )(xt)
    return out.reshape(n_pad)[:n]
