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
                  reps: int = 3, operand=None) -> float:
    """Seconds per application of step_fn (x -> x-like), delta method.

    operand: optional pytree passed as step_fn(x, operand) and fed to the
    jit as an ARGUMENT — pass large matrices this way, never close over
    them (closure constants embed in the remote compile payload: HTTP 413
    past ~300 MB, round-1 lesson)."""

    @partial(jax.jit, static_argnums=(2,))
    def runner(x, op, m):
        def body(_, x):
            y = step_fn(x) if op is None else step_fn(x, op)
            return jax.tree_util.tree_map(jax.lax.optimization_barrier, y)
        out = jax.lax.fori_loop(0, m, body, x)
        return _probe(out)

    def fetch(m):
        return float(runner(x0, operand, m))

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
    """Empirical HBM speed-of-light: bytes/s of x *= c streaming passes
    (counts read + write traffic of a 50/50 mix)."""
    n = nbytes // jnp.dtype(dtype).itemsize
    x = jnp.full((n,), 1.0, dtype)
    per = time_iterated(lambda v: v * 1.0000001, x, iters=36, iters_small=4)
    return 2 * nbytes / per


def measure_hbm_read_bandwidth(nbytes: int = 1 << 29,
                               dtype=jnp.float32) -> float:
    """Read-only HBM speed-of-light: bytes/s of fused multiply-reduce
    passes (the reduction fuses the scale, so nothing is written back).

    Needed because read-only streams run faster than the 50/50 probe —
    and the SBELL value stream is ~90% pure read, so its own-bytes
    fraction against the 50/50 probe can legitimately exceed 1.0 (seen
    in round 4: 1.07 with a probe that read 8% under the kernel's
    demonstrated stream rate). The speed-of-light denominator should be
    the max over both probes."""
    n = nbytes // jnp.dtype(dtype).itemsize
    x = jnp.full((n,), 1.0, dtype)

    @partial(jax.jit, static_argnums=(1,))
    def runner(x, m):
        def body(i, acc):
            # iteration-dependent MAX (not a multiply: XLA factors
            # sum(x*c) into c*sum(x) and hoists the whole read — measured
            # 1094 GB/s, past the physical 819); max fuses into the
            # reduce (no temp written) and cannot be factored out
            return acc + jnp.sum(
                jnp.maximum(x, 1e-9 * i.astype(jnp.float32)))
        return jax.lax.fori_loop(0, m, body, jnp.zeros((), jnp.float32))

    def fetch(m):
        return float(runner(x, m))

    # default 512 MB: the array must NOT fit v5e's 128 MB VMEM, or the
    # loop re-reads it from VMEM and reports >1 TB/s (measured)
    fetch(2)
    fetch(12)

    def tmin(m, reps=3):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            fetch(m)
            best = min(best, time.perf_counter() - t0)
        return best

    per = max((tmin(12) - tmin(2)) / 10, 1e-9)
    return nbytes / per


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


def format_spmv_rw_bytes(fmt, obj, nrows: int, ncols: int):
    """(read_bytes, write_bytes) split of format_spmv_bytes.

    Needed for the mixed speed-of-light: SpMV traffic is read-dominated
    (matrix + x read, only y written), and read-only HBM streams run
    ~10-15% faster than the 50/50 probe — judging a 95%-read kernel
    against the 50/50 number produced fractions > 1 (round 4)."""
    total = format_spmv_bytes(fmt, obj, nrows, ncols)
    if fmt == "sbell":
        wr = obj.n_stripes * 1024 * 4
        far = getattr(obj, "far", None)
        if far is not None:
            if hasattr(far, "oh"):       # FarPane: guarded output add
                wr += far.n_grouped * 8 * 128 * 4
            else:                        # FarBlocks: touched y rows rmw
                wr += far.n_far * 8 * 4
    else:
        wr = nrows * 4
    return total - wr, wr


def mixed_speed_of_light(bw_read: float, bw_rw: float, rd_bytes: int,
                         wr_bytes: int) -> float:
    """Speed-of-light (bytes/s) for a stream with the given read/write
    byte mix, from the two probes: per-byte read cost a = 1/bw_read,
    write cost b = 2/bw_rw - a (the 50/50 probe spends a+b per 2 bytes)."""
    a = 1.0 / bw_read
    b = max(2.0 / bw_rw - a, a * 0.5)
    total = rd_bytes + wr_bytes
    fr = rd_bytes / total
    fw = wr_bytes / total
    return 1.0 / (fr * a + fw * b)


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
