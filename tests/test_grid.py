"""Sparse block-grid tests — mirror the reference's sparse suite semantics
(touch/write/read/foreach, tests over composed layouts) plus the
particle-write workload (test_hpc_benchmark.cpp:859-926)."""

import numpy as np
import pytest
import jax.numpy as jnp

from libhpc_tpu.sparse.grid import BlockGrid


def test_touch_write_read(rng):
    g = BlockGrid.create((8, 8), block_size=16, capacity=16)
    xs = jnp.asarray([0, 17, 100, 127], jnp.int32)
    ys = jnp.asarray([0, 33, 50, 127], jnp.int32)
    vals = jnp.asarray([1.0, 2.0, 3.0, 4.0], jnp.float32)
    g = g.touch_batch(xs, ys)
    g = g.write_batch(xs, ys, vals)
    got = np.asarray(g.read_batch(xs, ys))
    np.testing.assert_allclose(got, [1, 2, 3, 4])


def test_untouched_reads_zero():
    g = BlockGrid.create((4, 4), block_size=8, capacity=4)
    got = np.asarray(g.read_batch(jnp.asarray([5]), jnp.asarray([7])))
    assert got[0] == 0


def test_write_accumulates():
    g = BlockGrid.create((2, 2), block_size=8, capacity=4)
    xs = jnp.asarray([3, 3, 3], jnp.int32)
    ys = jnp.asarray([4, 4, 4], jnp.int32)
    g = g.touch_batch(xs, ys)
    g = g.write_batch(xs, ys, jnp.asarray([1.0, 2.0, 3.0]))
    assert float(g.read_batch(jnp.asarray([3]), jnp.asarray([4]))[0]) == 6.0


def test_touch_idempotent():
    g = BlockGrid.create((4, 4), block_size=8, capacity=8)
    xs = jnp.asarray([0, 9, 0, 9], jnp.int32)
    ys = jnp.asarray([0, 9, 0, 9], jnp.int32)
    g = g.touch_batch(xs, ys)
    assert int(g.n_allocated()) == 2
    g2 = g.touch_batch(xs, ys)
    assert int(g2.n_allocated()) == 2
    np.testing.assert_array_equal(np.asarray(g.tile_map),
                                  np.asarray(g2.tile_map))


def test_particle_writes_match_dense(rng):
    """The particle-trajectory workload: scattered accumulation equals a
    dense scatter-add oracle."""
    g = BlockGrid.create((16, 16), block_size=16, capacity=256)
    n = 1 << 12
    xs = rng.integers(0, 256, n).astype(np.int32)
    ys = rng.integers(0, 256, n).astype(np.int32)
    vals = rng.random(n).astype(np.float32)
    g = g.touch_batch(jnp.asarray(xs), jnp.asarray(ys))
    g = g.write_batch(jnp.asarray(xs), jnp.asarray(ys), jnp.asarray(vals))
    dense = np.zeros((256, 256), np.float32)
    np.add.at(dense, (ys, xs), vals)
    np.testing.assert_allclose(np.asarray(g.todense()), dense, rtol=1e-4,
                               atol=1e-4)


def test_map_tiles():
    g = BlockGrid.create((2, 2), block_size=8, capacity=4)
    xs = jnp.asarray([0], jnp.int32)
    ys = jnp.asarray([0], jnp.int32)
    g = g.touch_batch(xs, ys)
    g = g.write_batch(xs, ys, jnp.asarray([2.0]))
    g = g.map_tiles(lambda t: t * 10.0)
    assert float(g.read_batch(xs, ys)[0]) == 20.0


def test_capacity_fail_soft():
    g = BlockGrid.create((4, 4), block_size=8, capacity=2)
    # touch 4 distinct tiles with capacity 2 — first two win, rest dropped
    xs = jnp.asarray([0, 8, 16, 24], jnp.int32)
    ys = jnp.asarray([0, 0, 0, 0], jnp.int32)
    g = g.touch_batch(xs, ys)
    assert int(g.n_allocated()) == 2
    tm = np.asarray(g.tile_map)
    assert (tm >= 0).sum() == 2


def test_touch_morton_order(rng):
    """Morton slot assignment: same semantics, Z-ordered pool layout."""
    g = BlockGrid.create((16, 16), block_size=16, capacity=256)
    xs = rng.integers(0, 256, 500).astype(np.int32)
    ys = rng.integers(0, 256, 500).astype(np.int32)
    vals = rng.random(500).astype(np.float32)
    g = g.touch_batch(jnp.asarray(xs), jnp.asarray(ys), order="morton")
    g = g.write_batch(jnp.asarray(xs), jnp.asarray(ys), jnp.asarray(vals))
    dense = np.zeros((256, 256), np.float32)
    np.add.at(dense, (ys, xs), vals)
    np.testing.assert_allclose(np.asarray(g.todense()), dense, rtol=1e-4,
                               atol=1e-4)
    # Z-order property: slot order follows the morton order of (bx, by)
    tm = np.asarray(g.tile_map)
    coords = [(y, x) for y in range(16) for x in range(16) if tm[y, x] >= 0]
    slots = [tm[y, x] for (y, x) in coords]
    from libhpc_tpu.utils.morton import morton2d_encode
    codes = [int(morton2d_encode(jnp.uint32(x), jnp.uint32(y)))
             for (y, x) in coords]
    order_by_slot = np.argsort(slots)
    assert (np.diff(np.asarray(codes)[order_by_slot]) > 0).all()
