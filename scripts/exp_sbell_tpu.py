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


def probe():
    """Cost of the candidate far-path primitives at small nfar."""
    import numpy as np
    rng = np.random.default_rng(0)
    hbm = harness.measure_hbm_bandwidth()
    print(f"HBM: {hbm/1e9:.0f} GB/s")
    n, nbr = 62464, 7808
    for nfar in (1024, 4096, 16384):
        bc = jnp.asarray(rng.integers(0, nbr, nfar, dtype=np.int32))
        br = jnp.asarray(np.sort(rng.integers(0, nbr, nfar)).astype(np.int32))
        blk = jnp.asarray(rng.standard_normal((nfar, 8, 8)).astype(np.float32))

        def far_step(v):
            xb = v.reshape(-1, 8)
            g = xb[bc]                                    # flat row-gather
            p = jnp.einsum("nij,nj->ni", blk, g,
                           preferred_element_type=jnp.float32)
            y = jnp.zeros((nbr, 8), jnp.float32).at[br].add(p)
            return y.reshape(-1)

        per = harness.time_iterated(far_step,
                                    jnp.ones((n,), jnp.float32), iters=32,
                                    iters_small=4)
        print(f"nfar={nfar:6d}: flat gather+einsum+scatter {per*1e6:8.1f} us")


def main():
    print("devices:", jax.devices())
    names = sys.argv[1:] or ["cant", "pwtk"]
    if names[0] == "probe":
        probe(); return
    hbm = harness.measure_hbm_bandwidth()
    print(f"HBM speed-of-light: {hbm/1e9:.0f} GB/s")
    for name in names:
        if name == "poisson":
            A = matrices.poisson2d(1024)
        elif name.endswith("0"):   # cant0/pwtk0: pure banded, no far set
            base = dict(cant0=(62_000 // 8, 8, 6), pwtk0=(218_000 // 8, 7, 40))[name]
            A = matrices.block_random(base[0], blocks_per_row=base[1],
                                      half_band=base[2], far_fraction=0.0,
                                      seed=1)
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
