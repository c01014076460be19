#!/usr/bin/env python
"""Sort lever: lane-axis exchange as one static XOR lane-shuffle
(LIBHPC_SORT_LANE_XOR=1) vs the two-roll+select baseline (VERDICT r2 #3).

Run each setting in a separate process:
  LIBHPC_SORT_LANE_XOR=0 python scripts/exp_sort_lanexor.py
  LIBHPC_SORT_LANE_XOR=1 python scripts/exp_sort_lanexor.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from libhpc_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from libhpc_tpu.ops import sort_pallas  # noqa: E402


def main():
    n = 1 << 25
    print(f"LANE_XOR={sort_pallas.LANE_XOR}  "
          f"PAIR_MIN_ROWS={sort_pallas.PAIR_MIN_ROWS}  n=2^25")
    x = jax.jit(lambda k: jax.random.bits(k, (n,), jnp.uint32))(
        jax.random.key(0))
    x.block_until_ready()
    out = sort_pallas.merge_sort_u32(x)
    out.block_until_ready()
    si = jax.lax.bitcast_convert_type(out, jnp.int32) ^ jnp.int32(-(2**31))
    print("sorted:", bool(jnp.all(si[1:] >= si[:-1])))
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        sort_pallas.merge_sort_u32(x).block_until_ready()
        best = min(best, time.perf_counter() - t0)
    print(f"{best*1e3:.1f} ms  {n/best/1e9:.3f} G elem/s")


if __name__ == "__main__":
    main()
