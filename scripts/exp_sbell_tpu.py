#!/usr/bin/env python
"""SBELL Pallas SpMV on real TPU: correctness + roofline (VERDICT #1).

Run: python scripts/exp_sbell_tpu.py [cant|pwtk|poisson] ...
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

from libhpc_tpu.bench import matrices, harness  # noqa: E402
from libhpc_tpu.sparse.sbell import SBELL  # noqa: E402
from libhpc_tpu.ops.spmv_pallas import sbell_spmv  # noqa: E402


def main():
    print("devices:", jax.devices())
    names = sys.argv[1:] or ["cant", "pwtk"]
    hbm = harness.measure_hbm_bandwidth()
    print(f"HBM speed-of-light: {hbm/1e9:.0f} GB/s")
    for name in names:
        if name == "poisson":
            A = matrices.poisson2d(1024)
        else:
            A = matrices.load_or_synthesize(name)
        m, n = A.shape
        t0 = time.perf_counter()
        sb = SBELL.from_scipy(A)
        t_build = time.perf_counter() - t0
        x = jnp.asarray(np.linspace(-1, 1, n).astype(np.float32))
        y = np.asarray(sbell_spmv(sb, x))
        ok = np.allclose(y, A @ np.asarray(x), rtol=2e-3, atol=2e-3)
        nbytes = harness.format_spmv_bytes("sbell", sb, m, n)
        csr_bytes = harness.spmv_bytes(A.nnz, m, n)
        print(f"--- {name}: {m} rows, {A.nnz/1e6:.2f}M nnz, "
              f"tiles={sb.n_tiles}, fill={sb.fill_ratio(A.nnz):.2f}, "
              f"build {t_build:.1f}s, correct={ok}")
        r = harness.bench_spmv_square(
            lambda v: sbell_spmv(sb, v), x, A.nnz, m, n, hbm,
            iters=64, bytes_moved=nbytes)
        print(f"    {r['seconds']*1e6:8.1f} us  "
              f"{r['nnz_per_s']/1e9:6.2f} Gnnz/s  "
              f"own-bytes roofline {r['roofline_fraction']:.3f}  "
              f"csr-bytes frac {csr_bytes/r['seconds']/hbm:.3f}")


if __name__ == "__main__":
    main()
