#!/usr/bin/env python
"""Sort-strategy calibration on real TPU (ROADMAP #2).

Measures the primitive rates that decide the large-sort architecture:
  1. lax.sort full-array baseline
  2. lax.sort batched per-chunk (candidate chunk phase)
  3. Pallas in-VMEM bitonic chunk sort (candidate chunk phase)
  4. Pallas single streaming compare-exchange stage (merge-pass unit cost)

Run: LIBHPC_TEST_TPU=1 python scripts/exp_sort.py
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
FLIP = np.int32(-(2**31))  # u32 order == (i32 ^ sign-bit) order


def _stage(v, i, k2: int, s: int, axis_len_rows: int):
    """One bitonic compare-exchange at distance d=2^s on (R,128) int32."""
    d = 1 << s
    if d >= LANE:
        axis, shift = 0, d // LANE
    else:
        axis, shift = 1, d
    size = v.shape[axis]
    fwd = pltpu.roll(v, size - shift, axis)  # partner for lower half (i+d)
    bwd = pltpu.roll(v, shift, axis)         # partner for upper half (i-d)
    upper = (i & d) != 0
    p = jnp.where(upper, bwd, fwd)
    take_min = ((i >> k2) & 1) == ((i >> s) & 1)
    return jnp.where(take_min, jnp.minimum(v, p), jnp.maximum(v, p))


def _chunk_sort_kernel(x_ref, o_ref, *, k: int):
    v = x_ref[:] ^ FLIP
    R, L = v.shape
    i = (jax.lax.broadcasted_iota(jnp.int32, (R, L), 0) * LANE
         + jax.lax.broadcasted_iota(jnp.int32, (R, L), 1))
    for k2 in range(1, k + 1):
        for s in range(k2 - 1, -1, -1):
            v = _stage(v, i, k2, s, R)
    o_ref[:] = v ^ FLIP


@partial(jax.jit, static_argnames=("log2c",))
def chunk_sort_pallas(x_i32, log2c: int):
    """Sort each chunk of 2^log2c elements independently (Pallas bitonic)."""
    n = x_i32.shape[0]
    C = 1 << log2c
    R = C // LANE
    n_chunks = n // C
    x2 = x_i32.reshape(n_chunks * R, LANE)
    out = pl.pallas_call(
        partial(_chunk_sort_kernel, k=log2c),
        out_shape=jax.ShapeDtypeStruct(x2.shape, x2.dtype),
        grid=(n_chunks,),
        in_specs=[pl.BlockSpec((R, LANE), lambda c: (c, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((R, LANE), lambda c: (c, 0),
                               memory_space=pltpu.VMEM),
    )(x2)
    return out.reshape(n)


def _one_stage_kernel(x_ref, o_ref, *, k2: int, s: int, base_rows: int):
    v = x_ref[:]
    R, L = v.shape
    c = pl.program_id(0)
    i = (jax.lax.broadcasted_iota(jnp.int32, (R, L), 0) * LANE
         + jax.lax.broadcasted_iota(jnp.int32, (R, L), 1)
         + c * (R * LANE))
    o_ref[:] = _stage(v, i, k2, s, R)


@partial(jax.jit, static_argnames=("k2", "s", "log2c"))
def one_stage_pallas(x_i32, k2: int, s: int, log2c: int):
    """One streaming compare-exchange stage with d < chunk (calibration)."""
    n = x_i32.shape[0]
    C = 1 << log2c
    R = C // LANE
    n_chunks = n // C
    x2 = x_i32.reshape(n_chunks * R, LANE)
    out = pl.pallas_call(
        partial(_one_stage_kernel, k2=k2, s=s, base_rows=R),
        out_shape=jax.ShapeDtypeStruct(x2.shape, x2.dtype),
        grid=(n_chunks,),
        in_specs=[pl.BlockSpec((R, LANE), lambda c: (c, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((R, LANE), lambda c: (c, 0),
                               memory_space=pltpu.VMEM),
    )(x2)
    return out.reshape(n)


def time_fn(fn, *args, iters=16, small=2, reps=3):
    @partial(jax.jit, static_argnums=(1,))
    def runner(x, m):
        def body(_, v):
            return jax.lax.optimization_barrier(fn(v))
        out = jax.lax.fori_loop(0, m, body, x)
        return jnp.sum(out.astype(jnp.float32) * 1e-9)

    for m in (small, iters):
        float(runner(args[0], m))

    def tmin(m):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(runner(args[0], m))
            best = min(best, time.perf_counter() - t0)
        return best

    return max((tmin(iters) - tmin(small)) / (iters - small), 1e-9)


def main():
    print("devices:", jax.devices())
    rng = np.random.default_rng(0)
    N = 1 << 23  # 8M
    xu = rng.integers(0, 2**32, size=N, dtype=np.uint32)
    xi = jnp.asarray(xu.view(np.int32))
    xuj = jnp.asarray(xu)

    # 1. lax.sort baseline
    t = time_fn(lambda v: jax.lax.sort(v), xuj, iters=8, small=2)
    print(f"lax.sort        8M: {t*1e3:8.2f} ms  {N/t/1e9:6.3f} G elem/s")

    # 2. batched chunk lax.sort (axis -1), chunk = 2^17
    for log2c in (14, 17):
        C = 1 << log2c
        x2 = xuj.reshape(N // C, C)
        t = time_fn(lambda v: jax.lax.sort(v, dimension=1), x2,
                    iters=8, small=2)
        print(f"lax.sort chunks 2^{log2c}: {t*1e3:8.2f} ms  "
              f"{N/t/1e9:6.3f} G elem/s")

    # 3. Pallas bitonic chunk sort
    for log2c in (14, 17):
        try:
            f = lambda v: chunk_sort_pallas(v, log2c)  # noqa: E731
            out = np.asarray(f(xi)).view(np.uint32)
            C = 1 << log2c
            ok = all(
                np.array_equal(np.sort(xu[i*C:(i+1)*C]), out[i*C:(i+1)*C])
                for i in range(0, N // C, max(1, N // C // 8))
            )
            t = time_fn(f, xi, iters=8, small=2)
            print(f"pallas bitonic  2^{log2c}: {t*1e3:8.2f} ms  "
                  f"{N/t/1e9:6.3f} G elem/s  correct={ok}")
        except Exception as e:
            print(f"pallas bitonic 2^{log2c} FAILED: {type(e).__name__}: "
                  f"{str(e)[:300]}")

    # 4. single streaming stage cost (lane-distance and sublane-distance)
    for k2, s in ((17, 6), (17, 13)):
        try:
            f = lambda v: one_stage_pallas(v, k2, s, 17)  # noqa: E731
            f(xi)
            t = time_fn(f, xi, iters=16, small=2)
            gbps = N * 8 / t / 1e9
            print(f"1 stage d=2^{s:<2}    : {t*1e3:8.2f} ms  {gbps:6.1f} GB/s "
                  f"({N/t/1e9:6.3f} G elem/s per stage)")
        except Exception as e:
            print(f"one_stage d=2^{s} FAILED: {type(e).__name__}: "
                  f"{str(e)[:300]}")


if __name__ == "__main__":
    main()
