#!/usr/bin/env python
"""SBELL kernel lowering prototype (VERDICT #1).

Exercises every risky Mosaic construct of the striped-BELL SpMV design in
one toy kernel, checked against numpy:
  1. dynamic leading-index read of an x-pane:  x_ref[p]  on (P,8,128)
  2. take_along_axis(pane, idx, axis=1) with broadcast idx
  3. bitcast of a (1,128) f32 meta row -> int32
  4. dot_general((8,128),(128,128)) contracting dim1 x dim1 (one-hot scatter)
  5. dynamic-offset accumulate out_ref[pl.ds(sid*8,8),:] += Yt
  6. scalar-prefetch arrays (pane, sid) with a grouped grid

Run: python scripts/exp_sbell_proto.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from libhpc_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

LANE = 128
TPB = 8          # tiles per grid step (group)
VROWS = 72       # 64 value rows + 1 meta row + 7 pad rows


def make_kernel(n_tiles, n_panes, n_stripes):
    n_groups = n_tiles // TPB

    def kernel(pane_ref, sid_ref, v_ref, x_ref, o_ref):
        g = pl.program_id(0)

        @pl.when(g == 0)
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)

        for t in range(TPB):
            base = t * VROWS
            vt = v_ref[base:base + 64, :]                       # (64,128)
            meta = pltpu.bitcast(v_ref[base + 64:base + 65, :],
                                 jnp.int32)                      # (1,128)
            col = meta & 0x1FF
            row = (meta >> 9) & 0x7F
            p = pane_ref[g * TPB + t]
            sid = sid_ref[g * TPB + t]
            pane0 = x_ref[p]                                     # (8,128)
            pane1 = x_ref[p + 1]
            idx_lo = jnp.broadcast_to(col & 127, (8, LANE))
            g0 = jnp.take_along_axis(pane0, idx_lo, axis=1)
            g1 = jnp.take_along_axis(pane1, idx_lo, axis=1)
            gx = jnp.where(jnp.broadcast_to(col < 128, (8, LANE)), g0, g1)
            pacc = jnp.zeros((8, LANE), jnp.float32)
            for j in range(8):
                pacc = pacc + vt[8 * j:8 * j + 8, :] * gx[j:j + 1, :]
            ro = (jax.lax.broadcasted_iota(jnp.int32, (LANE, LANE), 0)
                  == row).astype(jnp.float32)                    # (128,128)
            yt = jax.lax.dot_general(
                pacc, ro, (((1,), (1,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32)              # (8,128)
            o_ref[pl.ds(sid * 8, 8), :] = o_ref[pl.ds(sid * 8, 8), :] + yt

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_groups,),
        in_specs=[
            pl.BlockSpec((TPB * VROWS, LANE), lambda g, *_: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),   # x panes, resident
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_stripes * 8, LANE), jnp.float32),
        grid_spec=grid_spec,
    )


def main():
    print("devices:", jax.devices())
    rng = np.random.default_rng(0)
    n_tiles, n_panes, n_stripes = 16, 4, 3

    # random toy data
    vals = rng.standard_normal((n_tiles, 64, LANE)).astype(np.float32)
    col = rng.integers(0, 256, (n_tiles, LANE)).astype(np.int32)
    row = rng.integers(0, 128, (n_tiles, LANE)).astype(np.int32)
    pane = rng.integers(0, n_panes - 1, n_tiles).astype(np.int32)
    sid = rng.integers(0, n_stripes, n_tiles).astype(np.int32)
    x = rng.standard_normal((n_panes, 8, LANE)).astype(np.float32)

    meta = (col | (row << 9)).astype(np.int32)
    vflat = np.zeros((n_tiles, VROWS, LANE), np.float32)
    vflat[:, :64] = vals
    vflat[:, 64] = meta.view(np.float32)
    vflat = vflat.reshape(n_tiles * VROWS, LANE)

    # numpy oracle
    out_ref = np.zeros((n_stripes * 8, LANE), np.float32)
    for t in range(n_tiles):
        p = pane[t]
        gx = np.where(col[t] < 128, x[p, :, col[t] & 127].T,
                      x[p + 1, :, col[t] & 127].T)        # (8,128)
        pacc = np.zeros((8, LANE), np.float32)
        for j in range(8):
            pacc += vals[t, 8 * j:8 * j + 8, :] * gx[j:j + 1, :]
        for l in range(LANE):
            out_ref[sid[t] * 8:sid[t] * 8 + 8, row[t, l]] += pacc[:, l]

    f = jax.jit(make_kernel(n_tiles, n_panes, n_stripes))
    out = np.asarray(f(jnp.asarray(pane), jnp.asarray(sid),
                       jnp.asarray(vflat), jnp.asarray(x)))
    ok = np.allclose(out, out_ref, rtol=1e-4, atol=1e-4)
    print("correct =", ok, " maxerr =", float(np.abs(out - out_ref).max()))


if __name__ == "__main__":
    main()
