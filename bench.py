#!/usr/bin/env python
"""Headline benchmark: CSR SpMV roofline fraction on one TPU chip.

Runs the BASELINE.json configs[0]-class workload (5-point Poisson, 10k-row
class scaled up to exercise HBM) through the best single-chip SpMV path and
reports the fraction of empirically-measured HBM speed-of-light achieved.
Target (BASELINE.md): ≥0.80 → vs_baseline = fraction / 0.80.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""

import json
import sys


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from libhpc_tpu.bench import matrices, harness
    from libhpc_tpu.sparse import CSR, ELL
    from libhpc_tpu.ops import spmv

    # Poisson on a 1024×1024 grid → ~1.05M rows, ~5.2M nnz (HBM-resident,
    # large enough to stream; the 10k-row configs[0] system is a subset case)
    n_grid = 1024
    A = matrices.poisson2d(n_grid)
    nrows, ncols = A.shape
    nnz = A.nnz

    csr = CSR.from_scipy(A)
    ell = ELL.from_csr(csr)
    x = jnp.asarray(np.linspace(-1.0, 1.0, ncols, dtype=np.float32))

    # correctness gate (vs scipy oracle) before timing
    y_ref = A @ np.asarray(x)
    y_ell = np.asarray(spmv.ell_spmv(ell, x))
    ok = bool(np.allclose(y_ell, y_ref, rtol=1e-3, atol=1e-3))

    hbm = harness.measure_hbm_bandwidth()

    res_ell = harness.bench_spmv(spmv.ell_spmv, ell, x, nnz, nrows, ncols, hbm)
    res_csr = harness.bench_spmv(spmv.csr_spmv, csr, x, nnz, nrows, ncols, hbm)
    best = max(res_ell, res_csr, key=lambda r: r["roofline_fraction"])

    frac = best["roofline_fraction"] if ok else 0.0
    print(json.dumps({
        "metric": "csr_spmv_roofline_fraction",
        "value": round(frac, 4),
        "unit": "fraction_of_measured_hbm_speed_of_light",
        "vs_baseline": round(frac / 0.80, 4),
        "correct": ok,
        "gflops": round(best["gflops"], 2),
        "nnz_per_s": round(best["nnz_per_s"] / 1e9, 3),
        "hbm_gb_per_s": round(hbm / 1e9, 1),
        "ell_fraction": round(res_ell["roofline_fraction"], 4),
        "csr_fraction": round(res_csr["roofline_fraction"], 4),
        "platform": jax.devices()[0].platform,
    }))


if __name__ == "__main__":
    sys.exit(main())
