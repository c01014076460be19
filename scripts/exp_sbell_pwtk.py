#!/usr/bin/env python
"""SBELL SpMV on the second BASELINE matrix class (pwtk, 11.5M-nnz FEM).

BASELINE configs[1] names both cant and pwtk; bench.py headlines cant —
this records the pwtk-class number so the ">=80% of HBM roofline on
SuiteSparse matrices" claim is backed on both.

Run: python scripts/exp_sbell_pwtk.py [names...]
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from libhpc_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from libhpc_tpu.bench import harness, matrices  # noqa: E402
from libhpc_tpu.ops.spmv_pallas import sbell_spmv  # noqa: E402
from libhpc_tpu.sparse.sbell import SBELL  # noqa: E402


def main():
    names = sys.argv[1:] or ["pwtk", "cant"]
    hbm = harness.measure_hbm_bandwidth()
    print(f"hbm {hbm/1e9:.1f} GB/s")
    for name in names:
        A = matrices.load_or_synthesize(name)
        sb = SBELL.from_scipy(A)
        m, n = A.shape
        x = jnp.asarray(np.linspace(-1.0, 1.0, n, dtype=np.float32))
        y_ref = A @ np.asarray(x)
        ok = bool(np.allclose(np.asarray(sbell_spmv(sb, x)), y_ref,
                              rtol=2e-3, atol=2e-3))
        r = harness.bench_spmv_square(
            lambda v: sbell_spmv(sb, v), x, A.nnz, m, n, hbm, iters=64,
            bytes_moved=harness.format_spmv_bytes("sbell", sb, m, n))
        csr_frac = harness.spmv_bytes(A.nnz, m, n) / r["seconds"] / hbm
        print(json.dumps({
            "matrix": name, "nnz": int(A.nnz), "correct": ok,
            "gnnz_per_s": round(r["nnz_per_s"] / 1e9, 2),
            "own_bytes_fraction": round(r["roofline_fraction"], 4),
            "csr_bytes_fraction": round(csr_frac, 4),
            "platform": jax.devices()[0].platform,
        }))


if __name__ == "__main__":
    main()
