#!/usr/bin/env python
"""Lane-local gather rate (ROADMAP #1 primary candidate).

Measures Pallas same-shape `take_along_axis(table, idx, axis=0)` — a
per-lane permutation-gather where output[r, l] = table[idx[r, l], l].
If this runs near VPU speed (>> 0.35 G elem/s XLA row-gather ceiling),
a residue-partitioned ELL SpMV kernel is worth building: distribute each
row's nonzeros into slots whose lane index matches the column residue
mod 128, keep x resident in VMEM as (ncols/128, 128), and the x-gather
becomes this primitive.

Run: python scripts/exp_lane_gather.py
"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from libhpc_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

LANE = 128


def make_kernel(table_rows, idx_rows, blk_rows):
    """Per grid step: gather (blk_rows,128) values from a VMEM-resident
    (table_rows,128) table via same-shape-broadcasted take_along_axis."""

    def kernel(tab_ref, idx_ref, o_ref):
        tab = tab_ref[:]
        idx = idx_ref[:]
        # take_along_axis requires idx.shape == table.shape on sublane axis?
        # Per PERF_NOTES it needs same shape; emulate blockwise: gather
        # blk_rows outputs by clipping idx into table and using
        # jnp.take_along_axis with idx broadcast to the table's rows is not
        # same-shape; instead we test the documented same-shape form:
        o_ref[:] = jnp.take_along_axis(tab, idx, axis=0)

    grid = idx_rows // blk_rows
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((idx_rows, LANE), jnp.float32),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((table_rows, LANE), lambda g: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((blk_rows, LANE), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((blk_rows, LANE), lambda g: (g, 0),
                               memory_space=pltpu.VMEM),
    )


def time_fn(fn, *args, iters=16, small=1, reps=3):
    @partial(jax.jit, static_argnums=(2,))
    def runner(a, b, m):
        def body(_, acc):
            out = fn(a, b)
            return jax.lax.optimization_barrier(acc + out[0, 0])
        return jax.lax.fori_loop(0, m, body, jnp.float32(0))

    for m in (small, iters):
        float(runner(*args, m))

    def tmin(m):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(runner(*args, m))
            best = min(best, time.perf_counter() - t0)
        return best

    return max((tmin(iters) - tmin(small)) / (iters - small), 1e-9)


def main():
    print("devices:", jax.devices())
    rng = np.random.default_rng(0)
    for table_rows, idx_rows, blk in ((1024, 1 << 15, 512),
                                      (8192, 1 << 15, 512),
                                      (8192, 1 << 15, 2048)):
        tab = jnp.asarray(rng.random((table_rows, LANE), np.float32))
        # same-shape form requires idx shape == gathered block shape; the
        # take_along_axis same-shape restriction is idx.shape == out.shape
        # with values < table_rows. But tab block is (table_rows,128) and
        # idx block (blk,128) — differing shapes. Test both paths.
        idx = jnp.asarray(rng.integers(0, table_rows,
                                       (idx_rows, LANE), np.int32))
        try:
            f = make_kernel(table_rows, idx_rows, blk)
            out = np.asarray(f(tab, idx))
            i = np.asarray(idx)
            ok = np.allclose(out[3], np.asarray(tab)[i[3], np.arange(LANE)])
            t = time_fn(f, tab, idx)
            n = idx_rows * LANE
            print(f"tab={table_rows} idx_rows={idx_rows} blk={blk}: "
                  f"{t*1e3:7.3f} ms  {n/t/1e9:7.2f} G gathers/s  "
                  f"correct={ok}")
        except Exception as e:  # noqa: BLE001
            print(f"tab={table_rows} blk={blk} FAILED: "
                  f"{type(e).__name__}: {str(e)[:300]}")


if __name__ == "__main__":
    main()
