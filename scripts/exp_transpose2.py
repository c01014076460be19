#!/usr/bin/env python
"""Transpose: close the 11% gap to XLA or retire the kernel (VERDICT r2 #8).

Variants on 4096² and 8192² f32:
  xla                 jnp .T (the 719 GB/s bar)
  tile t              baseline square-tile kernel, t in {512, 1024}
  wide t              double-wide: in (t, 2t) -> out (2t, t), halves grid
                      steps, doubles output DMA height
  order t             column-major grid walk (j fastest on input cols)

Run: python scripts/exp_transpose2.py
"""

import os
import sys
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from libhpc_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from libhpc_tpu.bench import harness  # noqa: E402


def _kern(x_ref, o_ref):
    o_ref[:] = x_ref[:].T


def make_square(n, t):
    return pl.pallas_call(
        _kern,
        grid=(n // t, n // t),
        in_specs=[pl.BlockSpec((t, t), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((t, t), lambda i, j: (j, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, n), jnp.float32),
    )


def make_wide(n, t):
    return pl.pallas_call(
        _kern,
        grid=(n // t, n // (2 * t)),
        in_specs=[pl.BlockSpec((t, 2 * t), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((2 * t, t), lambda i, j: (j, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, n), jnp.float32),
    )


def make_tall(n, t):
    """Tall input blocks (2t, t) -> wide output (t, 2t)."""
    return pl.pallas_call(
        _kern,
        grid=(n // (2 * t), n // t),
        in_specs=[pl.BlockSpec((2 * t, t), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((t, 2 * t), lambda i, j: (j, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, n), jnp.float32),
    )


def make_order(n, t):
    """Grid transposed: output tiles walk row-major, input column-major."""
    return pl.pallas_call(
        _kern,
        grid=(n // t, n // t),
        in_specs=[pl.BlockSpec((t, t), lambda i, j: (j, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((t, t), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, n), jnp.float32),
    )


def t_us(fn, x0, iters=32):
    rs = sorted(
        harness.time_iterated(fn, x0, iters=iters,
                              iters_small=max(1, iters // 8), reps=4)
        for _ in range(3))
    return rs[1] * 1e6


def main():
    print("devices:", jax.devices())
    for n in (4096, 8192):
        x = jnp.ones((n, n), jnp.float32)
        gb = 2 * n * n * 4 / 1e9

        def chain(call):
            return lambda v: call(v)  # (n,n)->(n,n), self-chaining

        per = t_us(lambda v: jnp.swapaxes(v, 0, 1) + 0.0, x)
        print(f"n={n} xla      : {per:8.1f} us  {gb/per*1e6:6.1f} GB/s")
        for name, mk, ts in (
            ("tile", make_square, (512, 1024)),
            ("wide", make_wide, (512, 1024)),
            ("tall", make_tall, (512, 1024)),
            ("order", make_order, (1024,)),
        ):
            for t in ts:
                try:
                    call = jax.jit(mk(n, t))
                    per = t_us(chain(call), x)
                    print(f"n={n} {name} {t:5d}: {per:8.1f} us  "
                          f"{gb/per*1e6:6.1f} GB/s", flush=True)
                except Exception as e:  # noqa: BLE001
                    print(f"n={n} {name} {t:5d}: FAIL {type(e).__name__}: "
                          f"{str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
