"""Solve the 10k-row 5-point Poisson system with CG (BASELINE configs[0]).

Run: python examples/poisson_cg.py [grid_n]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import numpy as np
import jax
import jax.numpy as jnp

from libhpc_tpu.bench.matrices import poisson2d
from libhpc_tpu.sparse import CSR, DIA
from libhpc_tpu.ops import solver


def main(n=100):
    A = poisson2d(n)                     # n² rows
    print(f"system: {A.shape[0]} rows, {A.nnz} nnz")
    dia = DIA.from_scipy(A)              # zero-gather fast path
    rng = np.random.default_rng(0)
    x_true = rng.random(A.shape[0]).astype(np.float32)
    b = jnp.asarray(A @ x_true)

    t0 = time.perf_counter()
    x, it, res2 = solver.cg(lambda v: dia @ v, b, tol=1e-6, max_iter=5000)
    jax.block_until_ready(x)
    dt = time.perf_counter() - t0
    err = float(jnp.max(jnp.abs(x - x_true)))
    print(f"CG: {int(it)} iters, {dt:.3f}s, max|err|={err:.2e}")

    diag = jnp.asarray(A.diagonal().astype(np.float32))
    x2, it2, _ = solver.pcg(lambda v: dia @ v, diag, b, tol=1e-6,
                            max_iter=5000)
    print(f"PCG: {int(it2)} iters")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 100)
