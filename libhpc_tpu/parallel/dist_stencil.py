"""Distributed ghost-cell stencils (BASELINE.json configs[3]).

Row-partitions a 2D (or 3D, leading-axis) field over the mesh and applies a
stencil with halo exchange, using the overlapped interior/boundary split
from libhpc_tpu.parallel.halo. This is the end-to-end re-expression of the
reference's ghost-cell stencil workloads
(test_hpc_benchmark.cpp:354-601 over HPCHighDimensionFlatArray halos).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from libhpc_tpu.containers import HaloArray
from libhpc_tpu.ops.stencil import (box_sum_halo, poisson5_halo,
                                    poisson7_halo)
from libhpc_tpu.parallel import halo as _halo


def dist_blur2d_fn(mesh: Mesh, radius: int = 8, axis: str = "x",
                   overlap: bool = True):
    """Jitted distributed 2D box blur: (m, n) row-sharded -> same sharding.

    The X (lane) pass is purely local; the Y pass crosses shard boundaries
    and uses the halo exchange.
    """
    from libhpc_tpu.ops.stencil import box_sum_1d

    r = radius

    def y_stencil(padded):
        # (k + 2r, n) -> (k, n): the SAME box_sum_halo kernel the
        # single-chip path runs, fed exchange-filled ghost rows (one extra
        # zero row satisfies the kernel's lo >= r+1 cumsum shift slot)
        h = HaloArray.from_padded(jnp.pad(padded, ((1, 0), (0, 0))),
                                  lo=(r + 1, 0), hi=(r, 0))
        return box_sum_halo(h, r, axis=0)

    def body(x):
        bx = box_sum_1d(x, r, axis=1)          # local lane pass
        if overlap:
            return _halo.halo_stencil_overlapped(bx, y_stencil, r, axis)
        return y_stencil(_halo.pad_with_halo(bx, r, axis))

    f = jax.shard_map(body, mesh=mesh, in_specs=P(axis), out_specs=P(axis))
    return jax.jit(f)


def dist_poisson_fn(mesh: Mesh, axis: str = "x"):
    """Jitted distributed matrix-free 5-point Poisson operator on a
    row-sharded (m, n) grid — the distributed operator used by multigrid /
    CG on the model problem."""

    def p5(padded):
        # (k + 2, n) -> (k, n): shared poisson5_halo kernel; row ghosts
        # came from the exchange, column ghosts are zero Dirichlet
        h = HaloArray.from_padded(jnp.pad(padded, ((0, 0), (1, 1))),
                                  lo=(1, 1), hi=(1, 1))
        return poisson5_halo(h)

    def body(x):
        return _halo.halo_stencil_overlapped(x, p5, 1, axis)

    return jax.jit(
        jax.shard_map(body, mesh=mesh, in_specs=P(axis), out_specs=P(axis))
    )


def dist_poisson3d_fn(mesh: Mesh, axis: str = "x"):
    """Distributed matrix-free 7-point 3D Poisson on a (z, y, x)-grid
    sharded along the leading z axis (configs[3]: 3D stencil across chips).

    The halo machinery is 2D-agnostic in its leading axis; the stencil body
    treats each shard as (z_local + 2, y, x)."""

    def p7(padded):
        # (k + 2, y, x) -> (k, y, x): shared poisson7_halo kernel
        h = HaloArray.from_padded(
            jnp.pad(padded, ((0, 0), (1, 1), (1, 1))),
            lo=(1, 1, 1), hi=(1, 1, 1))
        return poisson7_halo(h)

    def body(x):
        top, bot = _halo.exchange_halo_1d(
            x.reshape(x.shape[0], -1), 1, axis
        )
        padded = jnp.concatenate(
            [top.reshape(1, *x.shape[1:]), x, bot.reshape(1, *x.shape[1:])],
            axis=0,
        )
        return p7(padded)

    return jax.jit(
        jax.shard_map(body, mesh=mesh, in_specs=P(axis), out_specs=P(axis))
    )


def dist_poisson_2dmesh_fn(mesh: Mesh, axes=("py", "px")):
    """5-point Poisson on a grid sharded over BOTH axes of a 2D mesh
    (2D domain decomposition — halo rows and columns + corners)."""

    def body(x):
        p = _halo.pad_with_halo_2d(x, 1, axes)
        return poisson5_halo(HaloArray.from_padded(p, (1, 1), (1, 1)))

    return jax.jit(
        jax.shard_map(body, mesh=mesh, in_specs=P(*axes), out_specs=P(*axes))
    )
