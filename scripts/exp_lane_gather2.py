#!/usr/bin/env python
"""In-kernel gather primitives, round 2 (VERDICT #1 design probe).

Measures every Mosaic-lowerable gather form against a VMEM-resident table:
  A. take_along_axis(tab (T,128), idx (T,128), axis=0)  — same-shape,
     per-lane sublane gather (the PERF_NOTES-documented form).
  B. same, but table bf16 (half the VMEM, same index work).
  C. take_along_axis(tab (S,L), idx (S,L), axis=1)       — per-sublane lane
     gather (dynamic lane shuffle).
  D. tab[idx] fancy 2D gather, idx (T,1) rows            — row gather.

Each wrapped in a grid so the op repeats over fresh idx tiles while the
table stays resident; rate = gathered elements / kernel time.

Run: python scripts/exp_lane_gather2.py
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


def time_fn(fn, *args, iters=16, small=1, reps=3):
    @partial(jax.jit, static_argnums=(2,))
    def runner(a, b, m):
        def body(_, acc):
            out = fn(a, b)
            return jax.lax.optimization_barrier(acc + out[0, 0].astype(jnp.float32))
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


def make_axis0(T, n_tiles, dtype):
    def kernel(tab_ref, idx_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(tab_ref[:], idx_ref[:], axis=0)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_tiles * T, LANE), dtype),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((T, LANE), lambda g: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((T, LANE), lambda g: (g, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((T, LANE), lambda g: (g, 0),
                               memory_space=pltpu.VMEM),
    )


def make_axis1(S, n_tiles, dtype):
    def kernel(tab_ref, idx_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(tab_ref[:], idx_ref[:], axis=1)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_tiles * S, LANE), dtype),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((S, LANE), lambda g: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((S, LANE), lambda g: (g, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((S, LANE), lambda g: (g, 0),
                               memory_space=pltpu.VMEM),
    )


def make_fancy_row(T, n_tiles, dtype):
    def kernel(tab_ref, idx_ref, o_ref):
        o_ref[:] = tab_ref[:][idx_ref[:, 0]]

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_tiles * T, LANE), dtype),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((T, LANE), lambda g: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((T, 1), lambda g: (g, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((T, LANE), lambda g: (g, 0),
                               memory_space=pltpu.VMEM),
    )


def main():
    print("devices:", jax.devices())
    rng = np.random.default_rng(0)
    n_tiles = 32

    for name, T, dtype, maker, idx_shape in (
        ("A axis0 T=1024 f32", 1024, jnp.float32, make_axis0, "full"),
        ("A axis0 T=4096 f32", 4096, jnp.float32, make_axis0, "full"),
        ("A axis0 T=8192 f32", 8192, jnp.float32, make_axis0, "full"),
        ("B axis0 T=8192 bf16", 8192, jnp.bfloat16, make_axis0, "full"),
        ("C axis1 S=1024 f32", 1024, jnp.float32, make_axis1, "full"),
        ("D fancy-row T=1024 f32", 1024, jnp.float32, make_fancy_row, "col"),
    ):
        tab = jnp.asarray(rng.random((T, LANE)), dtype)
        if idx_shape == "full":
            hi = T if "axis0" in name else LANE
            idx = jnp.asarray(
                rng.integers(0, hi, (n_tiles * T, LANE), np.int32))
        else:
            idx = jnp.asarray(
                rng.integers(0, T, (n_tiles * T, 1), np.int32))
        try:
            f = maker(T, n_tiles, dtype)
            out = np.asarray(f(tab, idx))
            i = np.asarray(idx)
            t_np = np.asarray(tab)
            if "axis0" in name:
                ok = np.allclose(
                    out[3].astype(np.float32),
                    t_np[i[3], np.arange(LANE)].astype(np.float32))
            elif "axis1" in name:
                ok = np.allclose(
                    out[3].astype(np.float32),
                    t_np[3 % T, i[3]].astype(np.float32))
            else:
                ok = np.allclose(out[3].astype(np.float32),
                                 t_np[i[3, 0]].astype(np.float32))
            t = time_fn(f, tab, idx)
            n = n_tiles * T * LANE
            print(f"{name}: {t*1e3:8.3f} ms  {n/t/1e9:7.2f} G gathers/s  "
                  f"correct={ok}")
        except Exception as e:  # noqa: BLE001
            print(f"{name} FAILED: {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()
