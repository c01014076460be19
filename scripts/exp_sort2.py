#!/usr/bin/env python
"""Merge-path Pallas sort: TPU measurement vs lax.sort.

Run: LIBHPC_TEST_TPU=1 python scripts/exp_sort2.py [max_log2n]
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

from libhpc_tpu.ops.sort_pallas import merge_sort_u32  # noqa: E402


def time_fn(fn, x0, iters=8, small=2, reps=3):
    @partial(jax.jit, static_argnums=(1,))
    def runner(x, m):
        def body(_, v):
            return jax.lax.optimization_barrier(fn(v))
        out = jax.lax.fori_loop(0, m, body, x)
        return jnp.sum((out[:512] >> 16).astype(jnp.float32))

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
    max_log2n = int(sys.argv[1]) if len(sys.argv) > 1 else 25
    print("devices:", jax.devices())
    rng = np.random.default_rng(0)

    # correctness on TPU first (8M)
    n0 = 1 << 23
    x0 = rng.integers(0, 2**32, size=n0, dtype=np.uint32)
    got = np.asarray(merge_sort_u32(jnp.asarray(x0)))
    ok = np.array_equal(got, np.sort(x0))
    print(f"correct @8M: {ok}")
    if not ok:
        bad = np.nonzero(got != np.sort(x0))[0]
        print(f"  first mismatch at {bad[0]}, count {bad.size}")
        return

    for log2n in range(23, max_log2n + 1, 2):
        n = 1 << log2n
        x = jnp.asarray(rng.integers(0, 2**32, size=n, dtype=np.uint32))
        iters = max(2, min(8, (1 << 26) // n))
        t = time_fn(merge_sort_u32, x, iters=iters, small=1)
        print(f"merge_sort 2^{log2n}: {t*1e3:9.2f} ms  "
              f"{n/t/1e9:6.3f} G elem/s")
        if log2n <= 25:
            t = time_fn(lambda v: jax.lax.sort(v), x, iters=iters, small=1)
            print(f"lax.sort   2^{log2n}: {t*1e3:9.2f} ms  "
                  f"{n/t/1e9:6.3f} G elem/s")


if __name__ == "__main__":
    main()
