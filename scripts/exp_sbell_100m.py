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
    nbr = int(sys.argv[1]) if len(sys.argv) > 1 else 1_600_000
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

    nbytes = harness.format_spmv_bytes("sbell", sb, m, n)
    r = harness.bench_spmv_square(
        lambda v: spmv_pallas.sbell_spmv(sb, v), x, A.nnz, m, n, hbm,
        iters=16, bytes_moved=nbytes)
    print(f"sbell_100M: {r['seconds']*1e3:.2f} ms  "
          f"{r['nnz_per_s']/1e9:.2f} Gnnz/s  "
          f"own-bytes fraction {r['roofline_fraction']:.3f}", flush=True)


if __name__ == "__main__":
    main()
