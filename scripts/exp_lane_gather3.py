#!/usr/bin/env python
"""Axis-1 (lane) gather rate vs table width (VERDICT #1 design probe).

The BELL-Pallas SpMV design stores x block-transposed as xB (b, nbc) so a
single take_along_axis(axis=1) gathers whole x-blocks for many BELL blocks
at once. The open question: does the dynamic lane-gather cost scale with
the table WIDTH (lowered as W/128 shuffle+select passes) or stay O(1)?

Also probes:
  - idx narrower than table (idx (8, L), table (8, W), L != W)
  - gather from a broadcast (8→more sublanes) table
Run: python scripts/exp_lane_gather3.py
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


def time_fn(fn, *args, iters=16, small=1, reps=3):
    @partial(jax.jit, static_argnums=(2,))
    def runner(a, b, m):
        def body(_, acc):
            out = fn(a, b)
            return jax.lax.optimization_barrier(
                acc + out[0, 0].astype(jnp.float32))
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


def make_same(S, W, n_tiles):
    """out (S,W) = tab[s, idx[s,l]] — same-shape axis-1 gather."""
    def kernel(tab_ref, idx_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(tab_ref[:], idx_ref[:], axis=1)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_tiles * S, W), jnp.float32),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((S, W), lambda g: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((S, W), lambda g: (g, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((S, W), lambda g: (g, 0),
                               memory_space=pltpu.VMEM),
    )


def make_narrow(S, W, L, n_tiles):
    """idx (S,L) narrower than table (S,W)."""
    def kernel(tab_ref, idx_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(tab_ref[:], idx_ref[:], axis=1)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_tiles * S, L), jnp.float32),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((S, W), lambda g: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((S, L), lambda g: (g, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((S, L), lambda g: (g, 0),
                               memory_space=pltpu.VMEM),
    )


def main():
    print("devices:", jax.devices())
    rng = np.random.default_rng(0)
    n_tiles = 16

    print("--- same-shape axis-1, width sweep (S=8 sublanes) ---")
    for W in (128, 512, 2048, 7808):
        S = 8
        tab = jnp.asarray(rng.random((S, W), np.float32))
        idx = jnp.asarray(rng.integers(0, W, (n_tiles * S, W), np.int32))
        try:
            f = make_same(S, W, n_tiles)
            out = np.asarray(f(tab, idx))
            i = np.asarray(idx)
            ok = np.allclose(out[3], np.asarray(tab)[3, i[3]])
            t = time_fn(f, tab, idx)
            n = n_tiles * S * W
            print(f"W={W:5d}: {t*1e3:8.3f} ms  {n/t/1e9:7.2f} G gathers/s"
                  f"  correct={ok}")
        except Exception as e:  # noqa: BLE001
            print(f"W={W} FAILED: {type(e).__name__}: {str(e)[:160]}")

    print("--- narrow idx (L=512) vs table width ---")
    for W in (512, 2048, 7808):
        S, L = 8, 512
        tab = jnp.asarray(rng.random((S, W), np.float32))
        idx = jnp.asarray(rng.integers(0, W, (n_tiles * S, L), np.int32))
        try:
            f = make_narrow(S, W, L, n_tiles)
            out = np.asarray(f(tab, idx))
            i = np.asarray(idx)
            ok = np.allclose(out[3], np.asarray(tab)[3, i[3]])
            t = time_fn(f, tab, idx)
            n = n_tiles * S * L
            print(f"W={W:5d} L={L}: {t*1e3:8.3f} ms  {n/t/1e9:7.2f} "
                  f"G gathers/s  correct={ok}")
        except Exception as e:  # noqa: BLE001
            print(f"W={W} L={L} FAILED: {type(e).__name__}: {str(e)[:160]}")

    print("--- taller sublane counts at W=2048 ---")
    for S in (8, 32):
        W = 2048
        tab = jnp.asarray(rng.random((S, W), np.float32))
        idx = jnp.asarray(rng.integers(0, W, (n_tiles * S, W), np.int32))
        try:
            f = make_same(S, W, n_tiles)
            out = np.asarray(f(tab, idx))
            i = np.asarray(idx)
            ok = np.allclose(out[3], np.asarray(tab)[3 % S, i[3]])
            t = time_fn(f, tab, idx)
            n = n_tiles * S * W
            print(f"S={S:3d}: {t*1e3:8.3f} ms  {n/t/1e9:7.2f} G gathers/s"
                  f"  correct={ok}")
        except Exception as e:  # noqa: BLE001
            print(f"S={S} FAILED: {type(e).__name__}: {str(e)[:160]}")


if __name__ == "__main__":
    main()
