"""Geometric multigrid (V-cycle) for the 2D Poisson model problem.

The flagship composite workload: weighted-Jacobi smoothing (VPU), 5-point
matrix-free operator (zero-gather stencil, ops.stencil), full-weighting
restriction and bilinear prolongation (static strided slices — no gather),
recursion unrolled at trace time into one XLA program.

Vertex-centered hierarchy: interior grids of size n = 2^k - 1, coarse point
(i, j) sits at fine (2i+1, 2j+1). Operator A_h = (4u - Σ neighbors) / h²
with Dirichlet zero boundary — matches
libhpc_tpu.bench.matrices.poisson2d(n) scaled by 1/h².
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def poisson_op(u, h: float):
    """A_h u for the 5-point Laplacian on spacing h (zero Dirichlet)."""
    up = jnp.pad(u, 1)
    return (
        4.0 * u
        - up[:-2, 1:-1]
        - up[2:, 1:-1]
        - up[1:-1, :-2]
        - up[1:-1, 2:]
    ) / (h * h)


def restrict_fw(r):
    """Full-weighting restriction (2m+1)² → m²."""
    c = r[1::2, 1::2]
    n_ = r[0:-1:2, 1::2]
    s_ = r[2::2, 1::2]
    w_ = r[1::2, 0:-1:2]
    e_ = r[1::2, 2::2]
    nw = r[0:-1:2, 0:-1:2]
    ne = r[0:-1:2, 2::2]
    sw = r[2::2, 0:-1:2]
    se = r[2::2, 2::2]
    return (4.0 * c + 2.0 * (n_ + s_ + w_ + e_) + (nw + ne + sw + se)) / 16.0


def prolong_bilinear(e):
    """Bilinear prolongation m² → (2m+1)² (zero Dirichlet halo)."""
    m = e.shape[0]
    n = 2 * m + 1
    ep = jnp.pad(e, 1)  # (m+2, m+2), zero boundary
    out = jnp.zeros((n, n), e.dtype)
    out = out.at[1::2, 1::2].set(e)
    # edge midpoints between vertically adjacent coarse points
    vert = 0.5 * (ep[:-1, 1:-1] + ep[1:, 1:-1])    # (m+1, m)
    out = out.at[0::2, 1::2].set(vert)
    horiz = 0.5 * (ep[1:-1, :-1] + ep[1:-1, 1:])   # (m, m+1)
    out = out.at[1::2, 0::2].set(horiz)
    # face centers: average of 4 coarse neighbors
    quad = 0.25 * (ep[:-1, :-1] + ep[:-1, 1:] + ep[1:, :-1] + ep[1:, 1:])
    out = out.at[0::2, 0::2].set(quad)
    return out


def smooth_jacobi(u, f, h: float, n_iter: int, omega: float = 0.8):
    inv_d = omega * (h * h) / 4.0

    def body(_, u):
        return u + inv_d * (f - poisson_op(u, h))

    return jax.lax.fori_loop(0, n_iter, body, u)


def v_cycle(u, f, h: float, pre: int = 2, post: int = 2,
            coarse_iters: int = 32):
    """One V-cycle; recursion unrolled at trace time down to a 1-3 point
    coarsest grid solved by smoothing."""
    n = u.shape[0]
    if n <= 3:
        return smooth_jacobi(u, f, h, coarse_iters)
    u = smooth_jacobi(u, f, h, pre)
    r = f - poisson_op(u, h)
    rc = restrict_fw(r)
    ec = v_cycle(jnp.zeros_like(rc), rc, 2.0 * h, pre, post, coarse_iters)
    u = u + prolong_bilinear(ec)
    return smooth_jacobi(u, f, h, post)


@partial(jax.jit, static_argnames=("h", "n_cycles", "pre", "post"))
def mg_solve(f, h: float = 1.0, n_cycles: int = 10, pre: int = 2,
             post: int = 2):
    """n_cycles V-cycles from a zero initial guess. Returns (u, res_norm)."""
    u = jnp.zeros_like(f)

    def body(_, u):
        return v_cycle(u, f, h, pre, post)

    u = jax.lax.fori_loop(0, n_cycles, body, u)
    res = f - poisson_op(u, h)
    return u, jnp.sqrt(jnp.sum(res * res))
