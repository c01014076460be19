#!/usr/bin/env python
"""100M-nnz single-chip SBELL SpMV (BASELINE configs[4] scale; VERDICT r2
#5 'committed 100M-nnz number').

Matrix: block_random_fast FEM-like, ~12.6M rows, ~100M nnz. The x panes +
output (~96 MB) trip the VMEM cap, so this exercises the row-chunked
kernel path end-to-end at scale.

Run: python scripts/exp_sbell_100m.py [n_block_rows]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from libhpc_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from libhpc_tpu.bench import harness  # noqa: E402
from libhpc_tpu.bench.matrices import block_random_fast  # noqa: E402
from libhpc_tpu.ops import spmv_pallas  # noqa: E402
from libhpc_tpu.sparse.sbell import SBELL  # noqa: E402


def main():
    # 200k block rows x 8 blocks x 64 = ~100M nnz (dedupe trims ~3%);
    # pass 1_600_000 for the 633M-nnz stress variant
    nbr = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    print("devices:", jax.devices(), flush=True)
    t0 = time.perf_counter()
    A = block_random_fast(nbr, blocks_per_row=8, half_band=6,
                          far_fraction=0.01, seed=3)
    m, n = A.shape
    print(f"matrix: {m} rows, {A.nnz/1e6:.1f}M nnz "
          f"({time.perf_counter()-t0:.0f}s gen)", flush=True)
    t0 = time.perf_counter()
    sb = SBELL.from_scipy(A)
    resident = spmv_pallas._resident_bytes(sb.n_stripes, sb.n_panes)
    print(f"SBELL: tiles={sb.n_tiles}, fill={sb.fill_ratio(A.nnz):.2f}, "
          f"far_frac={sb.far_fraction:.4f}, resident={resident/1e6:.0f} MB "
          f"(cap {spmv_pallas.VMEM_CAP/1e6:.0f} MB -> "
          f"{'chunked' if resident > spmv_pallas.VMEM_CAP else 'resident'}) "
          f"({time.perf_counter()-t0:.0f}s build)", flush=True)

    hbm = harness.measure_hbm_bandwidth()
    print(f"HBM: {hbm/1e9:.0f} GB/s", flush=True)

    x = jnp.asarray(np.linspace(-1, 1, n).astype(np.float32))
    y = np.asarray(spmv_pallas.sbell_spmv(sb, x))
    # spot oracle: scipy matvec on 3 row windows (full 12.6M-row matvec on
    # host is fine too, ~seconds)
    y_ref = A @ np.asarray(x)
    ok = np.allclose(y, y_ref, rtol=2e-3, atol=2e-3)
    print(f"correct: {ok}", flush=True)

    # time with sb as a JIT ARGUMENT: closing over a 300+ MB matrix embeds
    # it in the remote compile payload (HTTP 413, round-1 lesson). The
    # chunk plan is already cached on the object (the correctness call
    # above), so the chunked path traces cleanly.
    import time as _t
    from functools import partial

    x3 = spmv_pallas.x_to_panes(sb, jnp.pad(x, (0, sb.n_panes * 1024 - n)))
    # host-computed chunk plan (a static tuple) rides the closure: the
    # per-object plan cache does not survive jit pytree reconstruction
    plan = spmv_pallas._chunk_plan(sb) \
        if spmv_pallas._resident_bytes(sb.n_stripes, sb.n_panes) \
        > spmv_pallas.VMEM_CAP else None

    @partial(jax.jit, static_argnums=(2,))
    def runner(sbv, x3v, iters):
        def body(_, v):
            return jax.tree_util.tree_map(
                jax.lax.optimization_barrier,
                spmv_pallas.sbell_spmv_panes(sbv, v, chunk_plan=plan))
        out = jax.lax.fori_loop(0, iters, body, x3v)
        return jnp.sum(out)

    def fetch(it):
        return float(runner(sb, x3, it))

    fetch(2); fetch(12)  # compile both sizes
    def tmin(it):
        best = float("inf")
        for _ in range(3):
            t0 = _t.perf_counter()
            fetch(it)
            best = min(best, _t.perf_counter() - t0)
        return best
    per = max((tmin(12) - tmin(2)) / 10, 1e-9)
    nbytes = harness.format_spmv_bytes("sbell", sb, m, n)
    print(f"sbell_100M: {per*1e3:.2f} ms  {A.nnz/per/1e9:.2f} Gnnz/s  "
          f"own-bytes fraction {nbytes/per/hbm:.3f}", flush=True)


if __name__ == "__main__":
    main()
