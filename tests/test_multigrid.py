"""Multigrid tests — oracle: scipy sparse direct solve; property: V-cycle
contraction factor."""

import numpy as np
import pytest
import jax.numpy as jnp

from libhpc_tpu.ops import multigrid as mg
from test_spmv_spmm import poisson2d


def test_restrict_prolong_shapes(rng):
    r = jnp.asarray(rng.random((15, 15)).astype(np.float32))
    rc = mg.restrict_fw(r)
    assert rc.shape == (7, 7)
    e = mg.prolong_bilinear(rc)
    assert e.shape == (15, 15)


def test_prolong_of_smooth_is_accurate():
    """Bilinear prolongation reproduces a linear function exactly away from
    the boundary."""
    m = 7
    xs = np.arange(1, m + 1) / (m + 1)
    f = np.add.outer(xs, 2 * xs).astype(np.float32)
    e = np.asarray(mg.prolong_bilinear(jnp.asarray(f)))
    n = 2 * m + 1
    xf = np.arange(1, n + 1) / (n + 1)
    expect = np.add.outer(xf, 2 * xf).astype(np.float32)
    interior = (slice(2, -2), slice(2, -2))
    np.testing.assert_allclose(e[interior], expect[interior], atol=1e-5)


def test_operator_matches_matrix(rng):
    n = 31
    h = 1.0 / (n + 1)
    A = poisson2d(n) / (h * h)
    u = rng.random((n, n)).astype(np.float32)
    got = np.asarray(mg.poisson_op(jnp.asarray(u), h))
    expect = (A @ u.ravel()).reshape(n, n)
    np.testing.assert_allclose(got, expect, rtol=1e-4, atol=1e-2)


def test_vcycle_contracts(rng):
    """One V-cycle reduces the residual by a large factor (textbook ~0.1)."""
    n = 63
    h = 1.0 / (n + 1)
    f = jnp.asarray(rng.random((n, n)).astype(np.float32))
    u1, r1 = mg.mg_solve(f, h=h, n_cycles=1)
    u2, r2 = mg.mg_solve(f, h=h, n_cycles=2)
    assert float(r2) < 0.35 * float(r1)


def test_mg_matches_direct_solve(rng):
    import scipy.sparse.linalg as spla

    n = 63
    h = 1.0 / (n + 1)
    f_grid = rng.random((n, n)).astype(np.float32)
    A = (poisson2d(n) / (h * h)).tocsc()
    expect = spla.spsolve(A.astype(np.float64),
                          f_grid.ravel().astype(np.float64)).reshape(n, n)
    u, res = mg.mg_solve(jnp.asarray(f_grid), h=h, n_cycles=12)
    np.testing.assert_allclose(np.asarray(u), expect, rtol=2e-3, atol=2e-3)


def test_mg_beats_cg_in_work(rng):
    """V-cycle count to 1e-5 residual ≪ CG iteration count (the point of
    multigrid)."""
    from libhpc_tpu.ops import solver
    from libhpc_tpu.sparse import DIA

    n = 63
    h = 1.0 / (n + 1)
    f_grid = rng.random((n, n)).astype(np.float32)
    u, res = mg.mg_solve(jnp.asarray(f_grid), h=h, n_cycles=8)
    b_norm = float(np.linalg.norm(f_grid))
    assert float(res) / b_norm < 1e-4

    A = poisson2d(n) / (h * h)
    dia = DIA.from_scipy(A)
    _, it_cg, _ = solver.cg(lambda v: dia @ v,
                            jnp.asarray(f_grid.ravel()), tol=1e-4,
                            max_iter=1000)
    assert 8 * 4 < int(it_cg)  # ~4 smoothing sweeps per cycle vs CG iters


def test_mg_vmap_batched_rhs(rng):
    """Batched right-hand sides via vmap (many independent solves in one
    program — the XLA-native replacement for the reference's thread-pool
    task parallelism)."""
    import jax

    n = 31
    h = 1.0 / (n + 1)
    fs = rng.random((4, n, n)).astype(np.float32)
    solve = jax.vmap(lambda f: mg.mg_solve(f, h=h, n_cycles=10)[0])
    us = np.asarray(solve(jnp.asarray(fs)))
    for i in range(4):
        u_i, _ = mg.mg_solve(jnp.asarray(fs[i]), h=h, n_cycles=10)
        np.testing.assert_allclose(us[i], np.asarray(u_i), rtol=1e-4,
                                   atol=1e-4)


# ---- cell-centered (2^k, GSPMD-shardable) hierarchy ------------------------

def test_cc_transfer_adjoint(rng):
    """restrict_cc == (1/4)·prolong_cc^T (discrete adjoint property)."""
    m = 8
    u = rng.random((m, m)).astype(np.float64).astype(np.float32)
    v = rng.random((2 * m, 2 * m)).astype(np.float32)
    lhs = float(jnp.sum(mg.prolong_cc(jnp.asarray(u)) * jnp.asarray(v)))
    rhs = 4.0 * float(jnp.sum(jnp.asarray(u) *
                              mg.restrict_cc(jnp.asarray(v))))
    np.testing.assert_allclose(lhs, rhs, rtol=1e-4)


def test_cc_vcycle_contracts(rng):
    n = 64
    h = 1.0 / n
    f = jnp.asarray(rng.random((n, n)).astype(np.float32))
    _, r1 = mg.mg_solve_cc(f, h=h, n_cycles=1)
    _, r2 = mg.mg_solve_cc(f, h=h, n_cycles=2)
    assert float(r2) < 0.4 * float(r1)


def test_cc_matches_direct(rng):
    """Oracle: dense matrix of the *same* reflective-ghost operator (built
    by applying it to identity columns), solved with numpy."""
    n = 16
    h = 1.0 / n
    f_grid = rng.random((n, n)).astype(np.float32)
    import jax

    eye = jnp.eye(n * n, dtype=jnp.float32).reshape(n * n, n, n)
    cols = jax.vmap(lambda e: mg.poisson_op_cc(e, h).ravel())(eye)
    A = np.asarray(cols).T.astype(np.float64)
    expect = np.linalg.solve(A, f_grid.ravel().astype(np.float64)).reshape(n, n)
    u, _ = mg.mg_solve_cc(jnp.asarray(f_grid), h=h, n_cycles=12)
    np.testing.assert_allclose(np.asarray(u), expect, rtol=5e-3, atol=5e-3)


def test_cc_sharded_gspmd_matches(rng):
    """The distributed multigrid: jit with a row-sharded rhs on the 8-device
    mesh — every level divides evenly; XLA partitions stencils + transfers
    and the answer matches the single-device run."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    from libhpc_tpu.parallel.mesh import make_mesh_1d

    n = 64
    h = 1.0 / n
    f_grid = rng.random((n, n)).astype(np.float32)
    u_ref, _ = mg.mg_solve_cc(jnp.asarray(f_grid), h=h, n_cycles=4)

    mesh = jax.make_mesh((8,), ("x",),
                         axis_types=(jax.sharding.AxisType.Auto,))
    fs = jax.device_put(jnp.asarray(f_grid), NamedSharding(mesh, P("x")))
    u_sh, _ = mg.mg_solve_cc(fs, h=h, n_cycles=4)
    np.testing.assert_allclose(np.asarray(u_sh), np.asarray(u_ref),
                               rtol=1e-5, atol=1e-5)
