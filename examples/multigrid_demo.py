"""Multigrid V-cycle vs CG on the Poisson model problem.

Run: python examples/multigrid_demo.py [k]   (grid is (2^k - 1)²)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import numpy as np
import jax
import jax.numpy as jnp

from libhpc_tpu.ops import multigrid as mg, solver
from libhpc_tpu.sparse import DIA
from libhpc_tpu.bench.matrices import poisson2d


def main(k=7):
    n = (1 << k) - 1
    h = 1.0 / (n + 1)
    rng = np.random.default_rng(0)
    f = jnp.asarray(rng.random((n, n)).astype(np.float32))

    t0 = time.perf_counter()
    u, res = mg.mg_solve(f, h=h, n_cycles=10)
    jax.block_until_ready(u)
    print(f"MG: {n}x{n} grid, 10 V-cycles in "
          f"{time.perf_counter()-t0:.3f}s, |r|={float(res):.2e}")

    A = poisson2d(n) / (h * h)
    dia = DIA.from_scipy(A)
    t0 = time.perf_counter()
    x, it, r2 = solver.cg(lambda v: dia @ v, f.ravel(), tol=1e-6,
                          max_iter=5000)
    jax.block_until_ready(x)
    print(f"CG: {int(it)} iters in {time.perf_counter()-t0:.3f}s")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 7)
