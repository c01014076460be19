"""Benchmark + roofline harness (SURVEY.md §5.5: structured JSON results).

Replaces the reference's cudaEvent/chrono harnesses
(tests/test_gpu_benchmark/test_gpu_benchmark.cpp:96-126) with
block_until_ready timing and an *empirically measured* HBM speed-of-light:
the roofline denominator is what a pure streaming kernel actually achieves
on this chip, not a datasheet number — the same spirit as the reference
benchmarking its own transfer overlap rather than quoting specs.
"""

from __future__ import annotations

import json
import time
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp


def time_fn(fn, *args, warmup: int = 2, iters: int = 10) -> float:
    """Median wall seconds per call (compile excluded by warmup)."""
    for _ in range(warmup):
        out = fn(*args)
        jax.block_until_ready(out)
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2]


def measure_hbm_bandwidth(nbytes: int = 1 << 29, dtype=jnp.float32) -> float:
    """Empirical HBM speed-of-light: bytes/s of y = x + 1 over a large array
    (reads + writes nbytes each → 2*nbytes moved)."""
    n = nbytes // jnp.dtype(dtype).itemsize
    x = jnp.arange(n, dtype=dtype)

    @jax.jit
    def copy_add(x):
        return x + 1.0

    t = time_fn(copy_add, x, warmup=2, iters=5)
    return 2 * nbytes / t


def spmv_bytes(nnz: int, nrows: int, ncols: int, dtype_size: int = 4,
               index_size: int = 4) -> int:
    """Minimum HBM traffic for one CSR SpMV (the roofline numerator):
    data + column indices + one read of x + one write of y + indptr."""
    return (
        nnz * (dtype_size + index_size)   # values + indices
        + ncols * dtype_size              # x read (perfect reuse)
        + nrows * dtype_size              # y write
        + (nrows + 1) * index_size        # indptr
    )


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


def bench_spmv(spmv_fn, A_container, x, nnz: int, nrows: int, ncols: int,
               hbm_bytes_per_s: float, iters: int = 20) -> dict:
    """Time an SpMV callable and compute roofline stats."""
    t = time_fn(spmv_fn, A_container, x, warmup=3, iters=iters)
    bytes_moved = spmv_bytes(nnz, nrows, ncols)
    return dict(
        seconds=t,
        gflops=2 * nnz / t / 1e9,
        nnz_per_s=nnz / t,
        achieved_bytes_per_s=bytes_moved / t,
        roofline_fraction=(bytes_moved / t) / hbm_bytes_per_s,
    )
