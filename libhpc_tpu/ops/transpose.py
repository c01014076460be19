"""Tiled matrix transpose.

TPU-native descendant of the reference's bank-conflict-free shared-memory
transpose (lib/gpu/util/include/cudaUtils.cuh:9-37 `kernel_transpose` and the
stall_short testsuite ladder, cuda_tut_stall_short.cuh:6-57). On TPU the
shared-memory tile becomes a VMEM block and the +1-padding trick is replaced
by lane-aligned (128×128) tiles; the in-tile transpose runs on the VPU's
shuffle network via `jnp .T`.

Used by the radix pipeline (local↔localT layout flips, SURVEY.md §3.1) and
exposed as a standalone op.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from libhpc_tpu.ops._pallas_utils import cdiv, interpret_mode

TILE = 128


def _transpose_kernel(x_ref, o_ref):
    o_ref[:] = x_ref[:].T


@jax.jit
def transpose_pallas(x):
    """(M, N) -> (N, M) via 128×128 VMEM tiles."""
    m, n = x.shape
    m_pad = cdiv(m, TILE) * TILE
    n_pad = cdiv(n, TILE) * TILE
    xp = jnp.zeros((m_pad, n_pad), x.dtype).at[:m, :n].set(x)
    out = pl.pallas_call(
        _transpose_kernel,
        grid=(m_pad // TILE, n_pad // TILE),
        in_specs=[
            pl.BlockSpec((TILE, TILE), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec((TILE, TILE), lambda i, j: (j, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, m_pad), x.dtype),
        interpret=interpret_mode(),
    )(xp)
    return out[:n, :m]


@jax.jit
def transpose(x):
    """XLA-native transpose (the baseline the Pallas kernel is benched against)."""
    return x.T
