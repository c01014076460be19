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


from functools import partial  # noqa: E402


@partial(jax.jit, static_argnames=("tile",))
def transpose_pallas(x, tile: int = 1024):
    """(M, N) -> (N, M) via tile×tile VMEM blocks.

    Aligned shapes skip the padding copy entirely (it used to cost a full
    extra HBM pass on the 8192² bench). Tile sweep on v5e (4096², f32):
    256 -> 553 GB/s, 512 -> 593, 1024 -> 637 (~8 MB VMEM) vs XLA 719 —
    the Pallas kernel reaches 0.89x XLA, so the public `transpose` stays
    the XLA path and this kernel serves the in-pipeline layout flips."""
    m, n = x.shape
    m_pad = cdiv(m, tile) * tile
    n_pad = cdiv(n, tile) * tile
    xp = x
    if (m_pad, n_pad) != (m, n):
        xp = jnp.zeros((m_pad, n_pad), x.dtype).at[:m, :n].set(x)
    out = pl.pallas_call(
        _transpose_kernel,
        grid=(m_pad // tile, n_pad // tile),
        in_specs=[
            pl.BlockSpec((tile, tile), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec((tile, tile), lambda i, j: (j, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, m_pad), x.dtype),
        interpret=interpret_mode(),
    )(xp)
    if (m_pad, n_pad) != (m, n):
        out = out[:n, :m]
    return out


@jax.jit
def transpose(x):
    """XLA-native transpose (the baseline the Pallas kernel is benched against)."""
    return x.T
