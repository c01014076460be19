#!/usr/bin/env python
"""Probe Mosaic support for primitives the merge-path sort kernel needs:
  1. pltpu.roll with a *dynamic* (traced) shift, lane axis and sublane axis
  2. jnp.flip on sublane axis / lane axis
  3. dynamic ref slice read (scratch[pl.ds(q, rows)] with traced q)
  4. DMA from HBM at dynamic 128-aligned element offset into VMEM scratch

Run: LIBHPC_TEST_TPU=1 python scripts/exp_pallas_features.py
"""

import os
import sys
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from libhpc_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()


def probe(name, fn):
    try:
        out = fn()
        print(f"OK   {name}: {out}")
    except Exception as e:
        print(f"FAIL {name}: {type(e).__name__}: {str(e)[:200]}")


def main():
    print("devices:", jax.devices())
    R, L = 16, 128
    x = jnp.arange(R * L, dtype=jnp.int32).reshape(R, L)

    # 1a. dynamic lane roll
    def dyn_lane_roll():
        def k(s_ref, x_ref, o_ref):
            o_ref[:] = pltpu.roll(x_ref[:], s_ref[0], 1)

        out = pl.pallas_call(
            k,
            out_shape=jax.ShapeDtypeStruct((R, L), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(jnp.array([5], jnp.int32), x)
        ref = np.roll(np.asarray(x), 5, axis=1)
        return bool(np.array_equal(np.asarray(out), ref))

    probe("dynamic lane roll", dyn_lane_roll)

    # 1b. dynamic sublane roll
    def dyn_sub_roll():
        def k(s_ref, x_ref, o_ref):
            o_ref[:] = pltpu.roll(x_ref[:], s_ref[0], 0)

        out = pl.pallas_call(
            k,
            out_shape=jax.ShapeDtypeStruct((R, L), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(jnp.array([3], jnp.int32), x)
        ref = np.roll(np.asarray(x), 3, axis=0)
        return bool(np.array_equal(np.asarray(out), ref))

    probe("dynamic sublane roll", dyn_sub_roll)

    # 2a/2b. flips
    for axis in (0, 1):
        def flip(axis=axis):
            def k(x_ref, o_ref):
                o_ref[:] = jnp.flip(x_ref[:], axis=axis)

            out = pl.pallas_call(
                k,
                out_shape=jax.ShapeDtypeStruct((R, L), jnp.int32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(x)
            return bool(np.array_equal(np.asarray(out),
                                       np.flip(np.asarray(x), axis=axis)))

        probe(f"jnp.flip axis={axis}", flip)

    # 3. dynamic ref slice read
    def dyn_slice():
        def k(s_ref, x_ref, o_ref):
            o_ref[:] = x_ref[pl.ds(s_ref[0], 8), :]

        out = pl.pallas_call(
            k,
            out_shape=jax.ShapeDtypeStruct((8, L), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(jnp.array([4], jnp.int32), x)
        return bool(np.array_equal(np.asarray(out), np.asarray(x)[4:12]))

    probe("dynamic ref row slice", dyn_slice)

    # 4. DMA from HBM at dynamic row offset (scalar-prefetched)
    def dyn_dma():
        n_rows = 64
        big = jnp.arange(n_rows * L, dtype=jnp.int32).reshape(n_rows, L)

        def k(off_ref, x_hbm, o_ref, scr, sem):
            def body(scr, sem):
                dma = pltpu.make_async_copy(
                    x_hbm.at[pl.ds(off_ref[0], 8), :], scr, sem)
                dma.start()
                dma.wait()
                o_ref[:] = scr[:]
            pl.run_scoped(body, scr=pltpu.VMEM((8, L), jnp.int32),
                          sem=pltpu.SemaphoreType.DMA)

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((8, L), jnp.int32),
                            pltpu.SemaphoreType.DMA],
        )

        def k2(off_ref, x_hbm, o_ref, scr, sem):
            dma = pltpu.make_async_copy(
                x_hbm.at[pl.ds(off_ref[0] * 8, 8), :], scr, sem)
            dma.start()
            dma.wait()
            o_ref[:] = scr[:]

        out = pl.pallas_call(
            k2, out_shape=jax.ShapeDtypeStruct((8, L), jnp.int32),
            grid_spec=grid_spec,
        )(jnp.array([3], jnp.int32), big)
        return bool(np.array_equal(np.asarray(out), np.asarray(big)[24:32]))

    probe("dynamic-offset HBM DMA", dyn_dma)


if __name__ == "__main__":
    main()
