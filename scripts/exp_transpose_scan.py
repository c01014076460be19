#!/usr/bin/env python
"""TPU sweep: Pallas transpose tile sizes vs XLA; MXU scan vs XLA cumsum.

VERDICT r1 weak #4/#5: the round-1 Pallas transpose (196-318 GB/s) and
shift-add scan (1.7 G elem/s) both lost to XLA (352 GB/s, 4.2 G elem/s).

Run: python scripts/exp_transpose_scan.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from libhpc_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from libhpc_tpu.bench import harness  # noqa: E402
from libhpc_tpu.ops import scan, transpose  # noqa: E402


def main():
    print("devices:", jax.devices())
    rng = np.random.default_rng(0)

    n = 8192
    x = jnp.asarray(rng.standard_normal((n, n)).astype(np.float32))
    nbytes = 2 * n * n * 4

    # correctness once (device-side — a 268 MB host pull rides the slow relay)
    ok = bool(jnp.all(transpose.transpose_pallas(x, tile=512) == x.T))
    print("transpose correct:", ok)

    per = harness.time_iterated(lambda v: v.T, x, iters=16, iters_small=2)
    print(f"XLA .T            : {per*1e6:8.1f} us  {nbytes/per/1e9:6.1f} GB/s")
    for tile in (256, 512, 1024):
        f = lambda v, t=tile: transpose.transpose_pallas(v, tile=t)
        per = harness.time_iterated(f, x, iters=16, iters_small=2)
        print(f"pallas tile={tile:4d}  : {per*1e6:8.1f} us  "
              f"{nbytes/per/1e9:6.1f} GB/s")

    # scan
    for log2n in (22, 24, 26):
        m = 1 << log2n
        v = jnp.asarray(rng.standard_normal(m).astype(np.float32))
        got = scan.exclusive_scan_pallas(v)
        exp = jnp.cumsum(v) - v
        ok = bool(jnp.max(jnp.abs(got - exp)) < 1e-2 * jnp.sqrt(1.0 * m))
        per = harness.time_iterated(scan.exclusive_scan_pallas, v,
                                    iters=16, iters_small=2)
        print(f"mxu scan 2^{log2n}: ok={ok} {per*1e6:8.1f} us  "
              f"{m/per/1e9:6.2f} G elem/s  {2*m*4/per/1e9:6.1f} GB/s")
        per = harness.time_iterated(
            lambda w: jnp.cumsum(w) - w, v, iters=16, iters_small=2)
        print(f"xla cumsum 2^{log2n}:        {per*1e6:8.1f} us  "
              f"{m/per/1e9:6.2f} G elem/s")


if __name__ == "__main__":
    main()
