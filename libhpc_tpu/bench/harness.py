"""Benchmark + roofline harness (SURVEY.md §5.5: structured JSON results).

Measurement methodology (important on remote-attached TPUs): per-dispatch
latency through the runtime can be milliseconds and `block_until_ready` may
acknowledge before device completion. So every timing here:

  1. iterates the op M times *inside one jitted program* with
     `lax.optimization_barrier` between iterations (prevents fusion/DCE),
  2. forces completion by fetching a scalar probe that data-depends on the
     final iterate,
  3. uses the delta between a large and a small M to cancel dispatch,
     fetch, and program-entry overhead,
  4. repeats and takes the minimum (the noise floor is one-sided).

This replaces the reference's cudaEvent harness
(tests/test_gpu_benchmark/test_gpu_benchmark.cpp:96-126) — events don't
exist here, but in-program iteration gives the same isolation.
"""

from __future__ import annotations

import json
import time
from dataclasses import dataclass, field
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _probe(tree):
    """Cheap scalar that depends on every leaf of the output."""
    leaves = jax.tree_util.tree_leaves(tree)
    acc = jnp.zeros((), jnp.float32)
    for leaf in leaves:
        # full reduction (not a slice): stays legal on sharded arrays,
        # and still data-depends on every element of the output
        acc = acc + jnp.sum(leaf).astype(jnp.float32)
    return acc


def time_iterated(step_fn, x0, iters: int = 32, iters_small: int = 4,
                  reps: int = 3) -> float:
    """Seconds per application of step_fn (x -> x-like), delta method."""

    @partial(jax.jit, static_argnums=(1,))
    def runner(x, m):
        def body(_, x):
            return jax.tree_util.tree_map(
                jax.lax.optimization_barrier, step_fn(x)
            )
        out = jax.lax.fori_loop(0, m, body, x)
        return _probe(out)

    def fetch(m):
        return float(runner(x0, m))

    fetch(iters_small)  # compile small
    fetch(iters)        # compile large

    def tmin(m):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            fetch(m)
            best = min(best, time.perf_counter() - t0)
        return best

    t_small = tmin(iters_small)
    t_large = tmin(iters)
    per = (t_large - t_small) / (iters - iters_small)
    return max(per, 1e-9)


def measure_hbm_bandwidth(nbytes: int = 1 << 27, dtype=jnp.float32) -> float:
    """Empirical HBM speed-of-light: bytes/s of x *= c streaming passes."""
    n = nbytes // jnp.dtype(dtype).itemsize
    x = jnp.full((n,), 1.0, dtype)
    per = time_iterated(lambda v: v * 1.0000001, x, iters=36, iters_small=4)
    return 2 * nbytes / per


def spmv_bytes(nnz: int, nrows: int, ncols: int, dtype_size: int = 4,
               index_size: int = 4) -> int:
    """Minimum HBM traffic for one CSR SpMV (roofline numerator):
    values + column indices + one read of x + one write of y + indptr."""
    return (
        nnz * (dtype_size + index_size)
        + ncols * dtype_size
        + nrows * dtype_size
        + (nrows + 1) * index_size
    )


def format_spmv_bytes(fmt, obj, nrows: int, ncols: int) -> int:
    """Per-format HBM traffic model (VERDICT r1 #2b): count the bytes the
    format ACTUALLY streams (its stored values + index arrays + x + y) so
    roofline fractions are physically <= 1 for every format."""
    xy = (nrows + ncols) * 4
    if fmt == "csr":
        return spmv_bytes(obj.data.size, nrows, ncols)
    if fmt == "ell":
        return obj.vals.size * (4 + 4) + xy
    if fmt == "dia":
        return obj.data.size * 4 + obj.ndiags * 4 + xy
    if fmt == "bell":
        return obj.blocks.size * 4 + obj.indices.size * 4 + xy
    if fmt == "sbell":
        return obj.hbm_bytes
    raise KeyError(fmt)


@dataclass
class BenchResult:
    metric: str
    value: float
    unit: str
    vs_baseline: float
    extra: dict = field(default_factory=dict)

    def json_line(self) -> str:
        d = dict(metric=self.metric, value=self.value, unit=self.unit,
                 vs_baseline=self.vs_baseline)
        d.update(self.extra)
        return json.dumps(d)


def bench_spmv_square(matvec, x0, nnz: int, nrows: int, ncols: int,
                      hbm_bytes_per_s: float, iters: int = 32,
                      bytes_moved: int | None = None) -> dict:
    """Roofline stats for a square-matrix matvec (chained x -> A@x).

    bytes_moved defaults to the CSR traffic model; pass the format's own
    model (format_spmv_bytes) so roofline_fraction is physically <= 1."""
    per = time_iterated(matvec, x0, iters=iters,
                        iters_small=max(1, iters // 8))
    if bytes_moved is None:
        bytes_moved = spmv_bytes(nnz, nrows, ncols)
    return dict(
        seconds=per,
        gflops=2 * nnz / per / 1e9,
        nnz_per_s=nnz / per,
        achieved_bytes_per_s=bytes_moved / per,
        roofline_fraction=(bytes_moved / per) / hbm_bytes_per_s,
    )
