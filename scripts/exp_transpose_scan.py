#!/usr/bin/env python
"""TPU sweep: Pallas transpose tile sizes vs XLA; MXU scan vs XLA cumsum.

VERDICT r1 weak #4/#5: the round-1 Pallas transpose (196-318 GB/s) and
shift-add scan (1.7 G elem/s) both lost to XLA (352 GB/s, 4.2 G elem/s).

Run: python scripts/exp_transpose_scan.py [scan|xla_t|t256|t512|t1024] ...
(no args = all, scan first).
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


def log(*a):
    print(*a, flush=True)


def run_scan():
    rng = np.random.default_rng(0)
    for log2n in (22, 24, 26):
        m = 1 << log2n
        v = jnp.asarray(rng.standard_normal(m).astype(np.float32))
        got = scan.exclusive_scan_pallas(v)
        exp = jnp.cumsum(v) - v
        ok = bool(jnp.max(jnp.abs(got - exp)) < 1e-2 * np.sqrt(m))
        log(f"mxu scan 2^{log2n}: ok={ok}")
        per = harness.time_iterated(scan.exclusive_scan_pallas, v,
                                    iters=16, iters_small=2)
        log(f"mxu scan 2^{log2n}: {per*1e6:8.1f} us  "
            f"{m/per/1e9:6.2f} G elem/s  {2*m*4/per/1e9:6.1f} GB/s")
        per = harness.time_iterated(
            lambda w: jnp.cumsum(w) - w, v, iters=16, iters_small=2)
        log(f"xla cumsum 2^{log2n}:      {per*1e6:8.1f} us  "
            f"{m/per/1e9:6.2f} G elem/s")


def _tx(n=4096):
    rng = np.random.default_rng(0)
    return jnp.asarray(rng.standard_normal((n, n)).astype(np.float32))


def run_xla_t():
    x = _tx()
    nbytes = 2 * x.size * 4
    per = harness.time_iterated(lambda v: v.T, x, iters=32, iters_small=4)
    log(f"XLA .T 4096x4096  : {per*1e6:8.1f} us  {nbytes/per/1e9:6.1f} GB/s")


def run_tile(tile):
    x = _tx()
    nbytes = 2 * x.size * 4
    ok = bool(jnp.all(transpose.transpose_pallas(x, tile=tile) == x.T))
    log(f"pallas tile={tile:4d} correct: {ok}")
    per = harness.time_iterated(
        lambda v, t=tile: transpose.transpose_pallas(v, tile=t),
        x, iters=32, iters_small=4)
    log(f"pallas tile={tile:4d}  : {per*1e6:8.1f} us  "
        f"{nbytes/per/1e9:6.1f} GB/s")


def main():
    parts = sys.argv[1:] or ["scan", "xla_t", "t256", "t512", "t1024"]
    log("devices:", jax.devices())
    for p in parts:
        if p == "scan":
            run_scan()
        elif p == "xla_t":
            run_xla_t()
        else:
            run_tile(int(p[1:]))


if __name__ == "__main__":
    main()
