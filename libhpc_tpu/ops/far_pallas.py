"""Pallas far-block kernel — the FarPane consumer (round 5).

Computes the far-set contribution to an SBELL SpMV entirely on-chip:
masked pane shuffles (gather), 8 FMA planes (block product), and one
small MXU one-hot matmul per stripe (scatter into the near kernel's
guarded output layout). Replaces the round-4 XLA FarGrouped path, whose
x row-gather cost ~14 ns per padded entry regardless of row width —
808 us at the 100M-nnz scale, as much as the entire near kernel
(attribution in sparse/sbell.py:FarPane docstring; measurements in
PERF_NOTES round 5).

Reference lineage: the far set is the TPU re-expression of the
reference's scattered-block handling in its hierarchical sparse grid
(lib/sparse/include/HashBlock.hpp insert-on-touch tail), and the
in-kernel one-hot scatter is this repo's standing replacement for the
rank-stable CUDA scatter kernels
(lib/gpu/radix_gpu/include/cuda_radix_scatter.cuh:104-180).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from libhpc_tpu.ops._pallas_utils import interpret_mode
from libhpc_tpu.sparse.sbell import B, FAR_SPS, LANE, FarPane


def _kernel(panes_ref, ep_ref, li_ref, bt_ref, oh_ref, x_ref, o_ref, *,
            d_max: int, e_pad: int):
    g = pl.program_id(0)

    for ss in range(FAR_SPS):
        s = g * FAR_SPS + ss
        idxb = jnp.broadcast_to(li_ref[ss:ss + 1, :], (B, LANE))
        epr = ep_ref[ss:ss + 1, :]
        gx = jnp.zeros((B, LANE), jnp.float32)
        for d in range(d_max):
            # panes arrives FLATTENED 1-D: a 2-D (S, D) scalar-prefetch
            # array lane-pads to (S, 128) in SMEM and overflows the 1 MB
            # SMEM budget past ~2k stripes (round 5)
            p = panes_ref[s * d_max + d]
            gathered = jnp.take_along_axis(x_ref[p], idxb, axis=1)
            sel = jnp.broadcast_to(epr == p, (B, LANE))
            gx = jnp.where(sel, gathered, gx)

        base = ss * B * B
        # prod[i, e] = sum_j bt[8j+i, e] * gx[j, e]  (same 8-FMA shape as
        # the near kernel's product; .astype supports the bf16 variant)
        pacc = bt_ref[base:base + B, :].astype(jnp.float32) * gx[0:1, :]
        for j in range(1, B):
            pacc = pacc + bt_ref[base + B * j:base + B * (j + 1), :] \
                .astype(jnp.float32) * gx[j:j + 1, :]

        # one-hot scatter: out[i, r] = sum_e pacc[i, e] * oh[e, r]
        oh_tile = oh_ref[ss * e_pad:(ss + 1) * e_pad, :]
        out = jax.lax.dot_general(
            pacc[:, :e_pad], oh_tile,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
        o_ref[ss * B:(ss + 1) * B, :] = out


@partial(jax.jit, static_argnums=(1, 2, 3))
def _far_call(args, n_grouped, d_max, e_pad):
    from libhpc_tpu.ops.spmv_pallas import VMEM_LIMIT

    panes, ep, li, bt, oh, x3 = args
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_grouped // FAR_SPS,),
        in_specs=[
            pl.BlockSpec((FAR_SPS, LANE), lambda g, *_: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((FAR_SPS, LANE), lambda g, *_: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((FAR_SPS * B * B, LANE), lambda g, *_: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((FAR_SPS * e_pad, LANE), lambda g, *_: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),      # x panes, resident
        ],
        out_specs=pl.BlockSpec((FAR_SPS * B, LANE),
                               lambda g, *_: (g, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        partial(_kernel, d_max=d_max, e_pad=e_pad),
        out_shape=jax.ShapeDtypeStruct((n_grouped * B, LANE),
                                       jnp.float32),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT),
        interpret=interpret_mode(),
    )(panes, ep, li, bt, oh, x3)


def far_pane_out_panes(fp: FarPane, x3: jax.Array, guarded_rows: int
                       ) -> jax.Array:
    """Far contribution in the near kernel's guarded output layout
    ((n_stripes + W_PANES - 1) * B, LANE). x3 is the guarded resident
    pane array the near kernel consumes."""
    out = _far_call((fp.panes.reshape(-1), fp.ep, fp.lidx, fp.bt, fp.oh,
                     x3),
                    fp.n_grouped, fp.d_max, fp.e_pad)
    return out[:guarded_rows]


def far_pane_out_panes_xla(fp: FarPane, x3: jax.Array, guarded_rows: int
                           ) -> jax.Array:
    """XLA fallback for matrices whose x panes exceed the kernel's
    resident VMEM budget (the row-chunked SBELL regime): gather + product
    + one-hot matmul, all in lane-major layout. Slower per entry (the
    XLA gather truth) but never VMEM-bound."""
    S, E = fp.ep.shape[0], fp.e_pad
    ep = jnp.maximum(fp.ep, 0)
    g = x3[ep, :, fp.lidx]                       # (S, LANE, B) [s,e,j]
    g = jnp.where((fp.ep >= 0)[:, :, None], g, 0.0)
    bt = fp.bt.reshape(S, B, B, LANE).astype(jnp.float32)  # [s,j,i,e]
    prod = jnp.einsum("sjie,sej->sie", bt, g,
                      preferred_element_type=jnp.float32,
                      precision="highest")
    oh = fp.oh.reshape(S, E, LANE)
    out = jnp.einsum("sie,ser->sir", prod[:, :, :E], oh,
                     preferred_element_type=jnp.float32,
                     precision="highest")
    return out.reshape(S * B, LANE)[:guarded_rows]
