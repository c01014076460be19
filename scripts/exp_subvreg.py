#!/usr/bin/env python
"""Sub-vreg pairing experiment: can the s=7..9 (1/2/4-row) exchange stages
use reshape block pairing instead of roll+select?

The vreg-aligned (>=8-row) pairing is a pure vreg-order reinterpretation
(2 ops/elem, sort v3). For 1/2/4-row distances the (.., 2, dr, 128)
reshape slices *inside* a vreg — Mosaic may lower it as cheap masked
sublane selects or as a strided relayout; only a measurement tells.

Run (separate processes per setting — jit caches would mix them):
  LIBHPC_SORT_PAIR_MIN_ROWS=8 python scripts/exp_subvreg.py   # baseline
  LIBHPC_SORT_PAIR_MIN_ROWS=1 python scripts/exp_subvreg.py   # all sublane
  LIBHPC_SORT_PAIR_MIN_ROWS=4 python scripts/exp_subvreg.py   # 4-row only
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
    print(f"PAIR_MIN_ROWS={sort_pallas.PAIR_MIN_ROWS}  n=2^25")
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
