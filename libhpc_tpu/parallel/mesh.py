"""Device-mesh topology module (SURVEY.md §7 L0/L4).

The reference is single-node; its closest analogs are OpenMP/TBB thread
teams. Here the 'thread team' is a `jax.sharding.Mesh` over TPU chips:
the fast axis ('x') rides ICI within a slice, an optional outer axis
('host') models DCN across hosts. On the test rig the mesh is built from
virtual CPU devices (force_cpu_devices) — same program, same collectives.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa: F401


def force_cpu_devices(n: int) -> None:
    """Ensure ≥n virtual CPU devices (multi-chip simulation on one host).

    Must run before any array is created; clears initialized backends if
    needed (the axon/TPU plugin force-registers itself, so env flags alone
    are not reliable).
    """
    try:
        from jax._src import xla_bridge as xb

        if xb.backends_are_initialized():
            from jax.extend.backend import clear_backends

            clear_backends()
    except Exception:
        pass
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", n)
    if len(jax.devices()) < n:
        raise RuntimeError(
            f"could not provision {n} cpu devices (got {len(jax.devices())})"
        )


def make_mesh_1d(n: int | None = None, axis: str = "x") -> Mesh:
    """1D ring mesh over the first n devices (ICI axis).

    Axis type AUTO (GSPMD sharding propagation): jax.make_mesh defaults
    to Explicit in current JAX, under which auto-sharded library ops
    (e.g. segment_sum inside a jitted preconditioner) fail with
    'Resource axis ... not found in mesh: ()' — this library drives
    sharding with explicit shard_map / NamedSharding placements and
    leaves the rest to GSPMD."""
    devs = jax.devices()
    if n is None:
        n = len(devs)
    return jax.make_mesh((n,), (axis,), devices=devs[:n],
                         axis_types=(jax.sharding.AxisType.Auto,))


def make_mesh_2d(n_host: int, n_chip: int, axes=("host", "x")) -> Mesh:
    """2D mesh: outer DCN-like 'host' axis × inner ICI 'x' axis (AUTO
    axis types, see make_mesh_1d)."""
    return jax.make_mesh((n_host, n_chip), axes,
                         axis_types=(jax.sharding.AxisType.Auto,) * 2)
