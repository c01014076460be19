#!/usr/bin/env python
"""In-kernel DMA gather rate (ROADMAP #1: past the XLA row-gather ceiling).

XLA row-gather runs at 0.35 G rows/s regardless of row width up to ~64B
(PERF_NOTES). Here: a Pallas kernel issuing many small dynamic-offset DMAs
from scalar-prefetched indices, all signaling one semaphore, waited in bulk.
If descriptor throughput beats 0.35 G/s, a BSR-DMA SpMV kernel is worth
building.

Rows are (8, 128) f32 tiles (4 KB) and (8x8)=32B-equivalent small reads are
emulated by gathering (8,128) and (1,128) rows.

Run: LIBHPC_TEST_TPU=1 python scripts/exp_dma_gather.py
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


def make_gather(n_rows_table, n_gather, rows_per_gather, G):
    """Gather n_gather row-groups of rows_per_gather (8-aligned) rows each,
    G DMAs in flight per grid step."""
    R = rows_per_gather

    def kernel(idx_ref, x_any, o_ref, scr, sem):
        g = pl.program_id(0)

        def issue(i, _):
            k = g * G + i
            cp = pltpu.make_async_copy(
                x_any.at[pl.ds(idx_ref[k] * R, R), :],
                scr.at[pl.ds(i * R, R), :], sem)
            cp.start()
            return 0

        jax.lax.fori_loop(0, G, issue, 0)
        # bulk wait: all G copies signal the same semaphore
        pltpu.semaphore_wait(sem, G)
        o_ref[:] = scr[:]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_gather // G,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((G * R, LANE), lambda g, *_: (g, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((G * R, LANE), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_gather * R, LANE), jnp.float32),
        grid_spec=grid_spec,
    )


def time_fn(fn, *args, iters=8, small=1, reps=3):
    @partial(jax.jit, static_argnums=(2,))
    def runner(idx, table, m):
        def body(_, acc):
            out = fn(idx, table)
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
    n_table = 1 << 13          # 8K groups in the table
    for R, n_gather in ((8, 1 << 16), (8, 1 << 17)):
        table = jnp.asarray(
            rng.random((n_table * R, LANE), np.float32))
        idx = jnp.asarray(
            rng.integers(0, n_table, n_gather, dtype=np.int32))
        for G in (64, 256, 1024):
            if n_gather % G:
                continue
            try:
                f = make_gather(n_table * R, n_gather, R, G)
                # correctness spot check
                out = np.asarray(f(idx, table))
                i0 = int(idx[5])
                ok = np.array_equal(out[5 * R:(5 + 1) * R],
                                    np.asarray(table)[i0 * R:(i0 + 1) * R])
                t = time_fn(f, idx, table, iters=8, small=1)
                rate = n_gather / t
                gbs = n_gather * R * LANE * 4 / t / 1e9
                print(f"R={R} G={G:5d}: {t*1e3:7.2f} ms  "
                      f"{rate/1e9:6.3f} G gathers/s  {gbs:7.1f} GB/s  "
                      f"correct={ok}")
            except Exception as e:  # noqa: BLE001
                print(f"R={R} G={G} FAILED: {type(e).__name__}: "
                      f"{str(e)[:120]}")
        del table


if __name__ == "__main__":
    main()
