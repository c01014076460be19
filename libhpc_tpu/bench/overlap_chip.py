"""Single-chip DMA/compute overlap evidence (VERDICT r1 weak #6).

The TPU analog of the reference's stream-overlap compute-intensity sweep
(lib/gpu/transfer_overlap_testsuite/src/cuda_tut_transfer_overlap.cu:
144-218, unroll4/8 sweep): one Pallas kernel streams (ROWS,128) f32
blocks HBM->VMEM through the auto-double-buffered grid pipeline and runs
W rounds of VPU work per block. If the pipeline overlaps DMA with
compute, wall time per step is max(t_dma, W*t_unit); if it serialized,
it would be t_dma + W*t_unit.

Reported per W:   t(W) us/step
Derived:          t_unit from the compute-bound slope (large W),
                  overlap_efficiency = (t_dma + C - t_fused) / min(t_dma, C)
                  at the W* where compute C = W*t_unit best matches t_dma
                  (1.0 = perfect overlap, 0.0 = fully serial).

Run: python -m libhpc_tpu.bench.overlap_chip
"""

from __future__ import annotations

import json
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from libhpc_tpu.ops._pallas_utils import interpret_mode

ROWS = 2048          # rows per grid step: 1 MB blocks
LANE = 128
WS = (0, 1, 2, 4, 8, 16, 32, 64)


def _kernel(x_ref, o_ref, *, w: int):
    v = x_ref[:]
    acc = v
    for _ in range(w):
        # dependent multiply-adds: not fusable, not hoistable
        acc = acc * 1.000001 + v
    # fold EVERY row into the output — emitting only a slice lets Mosaic
    # dead-code the chain for all unused rows (measured: flat t(W))
    o_ref[:] = acc.reshape(ROWS // 8, 8, LANE).sum(axis=0)


@partial(jax.jit, static_argnums=(1,))
def _sweep_step(x, w):
    steps = x.shape[0] // ROWS
    return pl.pallas_call(
        partial(_kernel, w=w),
        grid=(steps,),
        in_specs=[pl.BlockSpec((ROWS, LANE), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((8, LANE), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((steps * 8, LANE), jnp.float32),
        interpret=interpret_mode(),
    )(x)


def _time_sweep(x, w, iters=96, small=12, reps=4):
    """Delta-method timing; the input rides through optimization_barrier
    each iteration so the streaming pallas_call cannot be hoisted."""
    import time

    @partial(jax.jit, static_argnums=(1, 2))
    def runner(v, w, m):
        def body(_, carry):
            vb, acc = carry
            out = _sweep_step(vb, w)
            return jax.lax.optimization_barrier(vb), acc + out[:8, :]
        _, acc = jax.lax.fori_loop(
            0, m, body, (v, jnp.zeros((8, LANE), jnp.float32)))
        return jnp.sum(acc[:1, :1])

    def fetch(m):
        return float(runner(x, w, m))

    fetch(small)
    fetch(iters)

    def tmin(m):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            fetch(m)
            best = min(best, time.perf_counter() - t0)
        return best

    return max((tmin(iters) - tmin(small)) / (iters - small), 1e-9)


def run(mb: int = 512):
    # sized so the W=0 delta reading is >=50 ms: relay jitter is ms-scale,
    # so sub-ms sweeps (the first committed version) produce pure noise
    steps = mb * 1024 * 1024 // (ROWS * LANE * 4)
    x = jnp.ones((steps * ROWS, LANE), jnp.float32)
    nbytes = x.size * 4

    times = {}
    for w in WS:
        times[w] = _time_sweep(x, w) / steps
    t0 = times[WS[0]]
    # compute-unit time from the compute-bound tail slope
    t_unit = (times[WS[-1]] - times[WS[-2]]) / (WS[-1] - WS[-2])
    # pick W* where estimated compute is closest to the DMA floor
    wstar = min(WS[1:], key=lambda w: abs(w * t_unit - t0))
    c = wstar * t_unit
    eff = (t0 + c - times[wstar]) / min(t0, c) if min(t0, c) > 0 else 0.0
    out = {
        "bench": "singlechip_dma_compute_overlap",
        "block_mb": ROWS * LANE * 4 / 1e6,
        "stream_gb_per_s": round(nbytes / (t0 * steps) / 1e9, 1),
        "us_per_step": {str(w): round(t * 1e6, 3) for w, t in times.items()},
        "compute_unit_us": round(t_unit * 1e6, 4),
        "w_star": wstar,
        "overlap_efficiency": round(float(eff), 3),
        "platform": jax.devices()[0].platform,
    }
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    from libhpc_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    run()
