#!/usr/bin/env python
"""BSR block-size sweep for unstructured SpMV (ROADMAP #1).

The gather cost is per-*block-row* (measured: 0.35 G row-gathers/s at b=8,
0.37 at b=16, bandwidth-bound by b=128), while BSR fill-in grows with b.
This sweep finds the per-matrix optimum of
    true_nnz_rate = (0.37G * b*b) / fill_ratio
empirically on cant-like / pwtk-like FEM stand-ins.

Run: LIBHPC_TEST_TPU=1 python scripts/exp_bsr.py
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

from libhpc_tpu.bench import matrices  # noqa: E402
from libhpc_tpu.sparse.bsr import BSR  # noqa: E402
from libhpc_tpu.ops import spmv  # noqa: E402


def time_fn(fn, x0, aux, iters=16, small=2, reps=3):
    """fn(v, aux) -> v-like. aux passed as a jit ARGUMENT so large matrices
    don't get constant-folded into the program (the relay rejects >limit
    compile payloads with HTTP 413)."""
    @partial(jax.jit, static_argnums=(2,))
    def runner(x, aux, m):
        def body(_, v):
            return jax.lax.optimization_barrier(fn(v, aux))
        out = jax.lax.fori_loop(0, m, body, x)
        return jnp.sum(out[:256].astype(jnp.float32))

    for m in (small, iters):
        float(runner(x0, aux, m))

    def tmin(m):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(runner(x0, aux, m))
            best = min(best, time.perf_counter() - t0)
        return best

    return max((tmin(iters) - tmin(small)) / (iters - small), 1e-9)


def main():
    print("devices:", jax.devices())
    for name in ("cant", "pwtk"):
        A = matrices.load_or_synthesize(name)
        nnz = A.nnz
        print(f"--- {name}: {A.shape[0]} rows, {nnz/1e6:.2f}M nnz")
        y_ref = A @ np.linspace(-1, 1, A.shape[1]).astype(np.float32)
        for b in (8, 16, 32):
            bsr = BSR.from_scipy(A, block=b)
            x = jnp.asarray(
                np.linspace(-1, 1, bsr.shape[1]).astype(np.float32))
            y = np.asarray(spmv.bsr_spmv(bsr, x))[:A.shape[0]]
            ok = np.allclose(y, y_ref, rtol=2e-3, atol=2e-3)
            # chain x -> y needs square padded shape; pad x instead
            def step(v, bsr):
                y = spmv.bsr_spmv(bsr, v)
                return y[:bsr.shape[1]] if y.shape[0] >= bsr.shape[1] \
                    else jnp.pad(y, (0, bsr.shape[1] - y.shape[0]))
            t = time_fn(step, x, bsr, iters=8, small=2)
            fill = bsr.fill_ratio()
            print(f"  bsr  b={b:3d}: {t*1e3:7.2f} ms  "
                  f"{nnz/t/1e9:6.2f} Gnnz/s (true)  "
                  f"{bsr.nnz_stored/t/1e9:6.2f} Gnnz/s (stored)  "
                  f"fill={fill:.2f}  correct={ok}")

            from libhpc_tpu.sparse.bell import BELL
            bell = BELL.from_bsr(bsr)
            y = np.asarray(spmv.bell_spmv(bell, x))[:A.shape[0]]
            ok = np.allclose(y, y_ref, rtol=2e-3, atol=2e-3)

            def step_bell(v, bell):
                y = spmv.bell_spmv(bell, v)
                return y[:bell.shape[1]] if y.shape[0] >= bell.shape[1] \
                    else jnp.pad(y, (0, bell.shape[1] - y.shape[0]))
            t = time_fn(step_bell, x, bell, iters=8, small=2)
            print(f"  bell b={b:3d}: {t*1e3:7.2f} ms  "
                  f"{nnz/t/1e9:6.2f} Gnnz/s (true)  "
                  f"{bell.nnz_stored/t/1e9:6.2f} Gnnz/s (stored)  "
                  f"fill={bell.fill_ratio():.2f}  K={bell.K}  correct={ok}")


if __name__ == "__main__":
    main()
