#!/usr/bin/env python
"""Scatter-strategy calibration on real TPU (ROADMAP #4: particle writes).

All timed functions are (n,)->(n,) and CHAINED through the timing loop
(v -> fn(v)) so XLA cannot hoist loop-invariant work.

Run: LIBHPC_TEST_TPU=1 python scripts/exp_scatter.py
"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from libhpc_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()


def time_fn(fn, x0, iters=16, small=2, reps=3):
    @partial(jax.jit, static_argnums=(1,))
    def runner(x, m):
        def body(_, v):
            return jax.lax.optimization_barrier(fn(v))
        out = jax.lax.fori_loop(0, m, body, x)
        return jnp.sum(out[:256].astype(jnp.float32))

    for m in (small, iters):
        float(runner(x0, m))

    def tmin(m):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(runner(x0, m))
            best = min(best, time.perf_counter() - t0)
        return best

    return max((tmin(iters) - tmin(small)) / (iters - small), 1e-9)


def main():
    print("devices:", jax.devices())
    rng = np.random.default_rng(0)
    n = 1 << 20
    keys = jnp.asarray(rng.integers(0, n, size=n, dtype=np.int32))
    keys_sorted = jnp.sort(keys)
    perm = jnp.asarray(rng.permutation(n).astype(np.int32))
    v0 = jnp.asarray(rng.random(n, dtype=np.float32))

    cases = {
        # random duplicate keys, scatter-add into flat (n,) buffer
        "flat at[].add dup keys": lambda v:
            jnp.zeros((n,), jnp.float32).at[keys].add(v),
        # same but pre-sorted keys + hint
        "flat add sorted keys  ": lambda v:
            jnp.zeros((n,), jnp.float32).at[keys_sorted].add(
                v, indices_are_sorted=True),
        # segment_sum on sorted keys
        "segment_sum sorted    ": lambda v:
            jax.ops.segment_sum(v, keys_sorted, num_segments=n,
                                indices_are_sorted=True),
        # unique permutation scatter (radix-pass primitive)
        "permutation scatter   ": lambda v:
            jnp.zeros((n,), jnp.float32).at[perm].set(
                v, unique_indices=True),
        # inverse formulation
        "permutation gather    ": lambda v: v[perm],
        # 3D scatter-add like BlockGrid.write_batch (capacity, 16, 16)
        "3d tile scatter-add   ": lambda v:
            jnp.zeros((n // 256, 16, 16), jnp.float32).at[
                keys // 256, (keys // 16) % 16, keys % 16
            ].add(v).reshape(n),
        # linearized equivalent of the 3D scatter
        "3d linearized add     ": lambda v:
            jnp.zeros((n,), jnp.float32).at[keys].add(v),
    }
    for name, fn in cases.items():
        try:
            t = time_fn(fn, v0, iters=8, small=2)
            print(f"{name}: {t*1e3:8.2f} ms  {n/t/1e9:6.3f} G w/s")
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:150]}")


if __name__ == "__main__":
    main()
