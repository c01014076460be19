"""Pallas striped-BELL SpMV — the unstructured fast path (VERDICT r1 #1).

y = A @ x for an SBELL matrix (sparse/sbell.py), one fused kernel:

  per grid step (8 tiles = 1024 block slots = up to 64K stored nnz):
    - the (8*72, 128) value+meta plane streams HBM->VMEM through the
      Pallas grid pipeline (auto double-buffered) — ~97% of the kernel's
      HBM traffic and the roofline term;
    - x stays VMEM-resident as (n_panes+1, 8, 128) block-transposed panes;
      each tile's x-blocks are fetched with one 128-lane dynamic shuffle
      (`take_along_axis(axis=1)`, 373 G gathers/s measured) + select per
      pane the tile spans (dynamic fori_loop; column-sorted construction
      keeps typical spans at 1-2 panes) — the layout co-design that
      replaces XLA's 0.35 G rows/s HBM row-gather;
    - products are 8 VPU multiply-adds broadcasting one gathered x-entry
      row per block column index j;
    - the per-block-row reduction: one lane shuffle into row-sorted order
      (construction-time permutation), inclusive lane cumsum (7 shift-
      adds), and per-row boundary-difference gathers — count->scan->
      scatter (SURVEY.md §3.2) with the scatter replaced by prefix
      differences — accumulated into a VMEM-resident (n_stripes*8, 128)
      output at a dynamic 8-aligned sublane offset.

VMEM budget: 2x288 KB value stream + 4(n_panes+1) KB x + 4*n_stripes KB y
+ scratch — fine to ~2M columns; larger matrices should use
ops/spmv.py:bell_spmv (HBM row-gather path).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from libhpc_tpu.ops._pallas_utils import interpret_mode, tile_cumsum
from libhpc_tpu.sparse.sbell import (B, LANE, PANE_COLS, SBELL, STRIPE_ROWS,
                                     TPB, VROWS)


def _kernel(pane_ref, npan_ref, sid_ref, v_ref, x_ref, o_ref):
    g = pl.program_id(0)

    @pl.when(g == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    for t in range(TPB):
        base = t * VROWS
        meta0 = pltpu.bitcast(
            v_ref[base + B * B:base + B * B + 1, :], jnp.int32)  # (1,128)
        meta1 = pltpu.bitcast(
            v_ref[base + B * B + 1:base + B * B + 2, :], jnp.int32)
        col = meta0 & 0xFFFFFF
        perm = (meta0 >> 24) & 0x7F
        seg_s = meta1 & 0xFF
        seg_e = (meta1 >> 8) & 0xFF
        p = pane_ref[g * TPB + t]
        npan = npan_ref[g * TPB + t]
        sid = sid_ref[g * TPB + t]

        # ---- gather x blocks: one lane shuffle + select per spanned pane
        idx = jnp.broadcast_to(col & (LANE - 1), (B, LANE))
        w_of = jnp.broadcast_to(col >> 7, (B, LANE))
        gx = jnp.where(w_of == 0,
                       jnp.take_along_axis(x_ref[p], idx, axis=1), 0.0)

        def pane_body(w, acc):
            gw = jnp.take_along_axis(x_ref[p + w], idx, axis=1)
            return jnp.where(w_of == w, gw, acc)

        gx = jax.lax.fori_loop(1, npan, pane_body, gx)

        # ---- products: P[i, slot] = sum_j V[8j+i, slot] * x_j[slot]
        pacc = v_ref[base:base + B, :] * gx[0:1, :]
        for j in range(1, B):
            pacc = pacc + v_ref[base + B * j:base + B * (j + 1), :] \
                * gx[j:j + 1, :]

        # ---- row reduction: shuffle to row-sorted order, prefix-sum,
        # per-row boundary differences (exclusive-prefix semantics)
        pperm = jnp.take_along_axis(
            pacc, jnp.broadcast_to(perm, (B, LANE)), axis=1)
        c = tile_cumsum(pperm, axis=1)            # inclusive prefix
        ge_idx = jnp.broadcast_to(jnp.maximum(seg_e - 1, 0), (B, LANE))
        gs_idx = jnp.broadcast_to(jnp.maximum(seg_s - 1, 0), (B, LANE))
        ge = jnp.where(jnp.broadcast_to(seg_e == 0, (B, LANE)), 0.0,
                       jnp.take_along_axis(c, ge_idx, axis=1))
        gs = jnp.where(jnp.broadcast_to(seg_s == 0, (B, LANE)), 0.0,
                       jnp.take_along_axis(c, gs_idx, axis=1))
        yt = ge - gs                               # (8, 128 local rows)
        o_ref[pl.ds(sid * B, B), :] = o_ref[pl.ds(sid * B, B), :] + yt


@partial(jax.jit, static_argnums=(1, 2, 3))
def _sbell_call(args, n_tiles, n_stripes, n_panes):
    pane, npan, sid, vflat, x3 = args
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_tiles // TPB,),
        in_specs=[
            pl.BlockSpec((TPB * VROWS, LANE), lambda g, *_: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),      # x panes, resident
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((n_stripes * B, LANE), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret_mode(),
    )(pane, npan, sid, vflat, x3)


def sbell_spmv(sb: SBELL, x: jax.Array) -> jax.Array:
    """y = A @ x for SBELL A. x is f32 (ncols,); returns f32 (nrows,)."""
    m, n = sb.shape
    xpad = jnp.pad(x, (0, sb.n_panes * PANE_COLS - n))
    # x3[p, j, l] = x[PANE_COLS*p + B*l + j]; +1 zero guard pane keeps the
    # pipelined x_ref[p] read of all-pad tiles in bounds.
    x3 = xpad.reshape(sb.n_panes, LANE, B).transpose(0, 2, 1)
    x3 = jnp.pad(x3, ((0, 1), (0, 0), (0, 0)))
    out = _sbell_call((sb.pane, sb.npan, sb.sid, sb.vflat, x3),
                      sb.n_tiles, sb.n_stripes, sb.n_panes)
    # out[sid*8 + i, r] = y[STRIPE_ROWS*sid + 8*r + i]
    y = out.reshape(sb.n_stripes, B, LANE).transpose(0, 2, 1).reshape(-1)
    return y[:m]
