#!/usr/bin/env python
"""The reference's headline workload: 500,000,000 u32 end-to-end sort.

Reference: ~360 ms / 1.39 G elem/s on RTX 3080 Ti
(/root/reference/README.md:52, tests/test_gpu_benchmark.cpp:12).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from libhpc_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from libhpc_tpu.ops.sort_pallas import merge_sort_u32  # noqa: E402


@jax.jit
def _sorted_and_checksum(out):
    """Sortedness in the sign-flipped i32 order domain (no i64) plus an
    order-independent u32 checksum to detect dropped/duplicated values."""
    s = jax.lax.bitcast_convert_type(out, jnp.int32) ^ jnp.int32(-(2**31))
    ok = jnp.all(s[1:] >= s[:-1])
    ck = jnp.sum(jax.lax.bitcast_convert_type(out, jnp.uint32)
                 .astype(jnp.uint64))
    return ok, ck


def main():
    sizes = [int(a) for a in sys.argv[1:]] or [500_000_000]
    print("devices:", jax.devices())
    for n in sizes:
        # generate on-device: 2 GB host->device through the relay tunnel
        # would dwarf the measurement (PERF_NOTES "axon relay quirks")
        x = jax.jit(lambda k: jax.random.bits(k, (n,), jnp.uint32))(
            jax.random.key(0))
        x.block_until_ready()
        ck_in = int(jnp.sum(x.astype(jnp.uint64)))

        out = merge_sort_u32(x)      # compile + warm
        out.block_until_ready()
        ok, ck = _sorted_and_checksum(out)
        print(f"n={n}: sorted={bool(ok)} checksum_match={int(ck) == ck_in}")

        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            merge_sort_u32(x).block_until_ready()
            best = min(best, time.perf_counter() - t0)
        print(f"{n} u32: {best*1e3:.1f} ms  {n/best/1e9:.3f} G elem/s  "
              f"(reference 3080Ti headline: 500M in ~360 ms / 1.39 G elem/s)")


if __name__ == "__main__":
    main()
