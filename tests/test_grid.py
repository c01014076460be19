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


# ---------------------------------------------------------------------------
# 3-level NestedGrid (pointer -> mid -> dense leaf composition parity)
# ---------------------------------------------------------------------------

from libhpc_tpu.sparse.grid import NestedGrid


def test_nested_touch_write_read(rng):
    g = NestedGrid.create((4, 4), mid_grid=(4, 4), block_size=8,
                          cap_mid=16, cap_leaf=64)
    # extent = 4*4*8 = 128 per axis
    xs = jnp.asarray([0, 17, 100, 127], jnp.int32)
    ys = jnp.asarray([0, 33, 50, 127], jnp.int32)
    vals = jnp.asarray([1.0, 2.0, 3.0, 4.0], jnp.float32)
    g = g.touch_batch(xs, ys)
    g = g.write_batch(xs, ys, vals)
    np.testing.assert_allclose(np.asarray(g.read_batch(xs, ys)),
                               [1, 2, 3, 4])


def test_nested_untouched_reads_zero():
    g = NestedGrid.create((2, 2), mid_grid=(2, 2), block_size=8,
                          cap_mid=4, cap_leaf=8)
    got = np.asarray(g.read_batch(jnp.asarray([19]), jnp.asarray([21])))
    assert got[0] == 0


def test_nested_touch_idempotent():
    g = NestedGrid.create((4, 4), mid_grid=(2, 2), block_size=8,
                          cap_mid=8, cap_leaf=16)
    xs = jnp.asarray([0, 40, 0, 40], jnp.int32)
    ys = jnp.asarray([0, 40, 0, 40], jnp.int32)
    g = g.touch_batch(xs, ys)
    n_mid, n_leaf = int(g.n_mid), int(g.n_leaf)
    assert (n_mid, n_leaf) == (2, 2)
    g2 = g.touch_batch(xs, ys)
    assert (int(g2.n_mid), int(g2.n_leaf)) == (2, 2)
    np.testing.assert_array_equal(np.asarray(g.map0), np.asarray(g2.map0))
    np.testing.assert_array_equal(np.asarray(g.mid_maps),
                                  np.asarray(g2.mid_maps))


def test_nested_particle_writes_match_dense(rng):
    g = NestedGrid.create((4, 4), mid_grid=(4, 4), block_size=8,
                          cap_mid=16, cap_leaf=256)
    n = 1 << 12
    xs = rng.integers(0, 128, n).astype(np.int32)
    ys = rng.integers(0, 128, n).astype(np.int32)
    vals = rng.random(n).astype(np.float32)
    g = g.touch_batch(jnp.asarray(xs), jnp.asarray(ys))
    g = g.write_batch(jnp.asarray(xs), jnp.asarray(ys), jnp.asarray(vals))
    dense = np.zeros((128, 128), np.float32)
    np.add.at(dense, (ys, xs), vals)
    np.testing.assert_allclose(np.asarray(g.todense()), dense, rtol=1e-4,
                               atol=1e-4)


def test_nested_capacity_fail_soft():
    # leaf capacity 2, touch 4 distinct leaves within one mid block
    g = NestedGrid.create((2, 2), mid_grid=(4, 4), block_size=8,
                          cap_mid=4, cap_leaf=2)
    xs = jnp.asarray([0, 8, 16, 24], jnp.int32)
    ys = jnp.asarray([0, 0, 0, 0], jnp.int32)
    g = g.touch_batch(xs, ys)
    assert int(g.n_leaf) == 2
    # mid capacity exhaustion: distinct top-level blocks beyond cap_mid
    g2 = NestedGrid.create((4, 4), mid_grid=(2, 2), block_size=8,
                           cap_mid=2, cap_leaf=32)
    xs = jnp.asarray([0, 16, 32, 48], jnp.int32)  # 4 distinct top blocks
    g2 = g2.touch_batch(xs, ys)
    assert int(g2.n_mid) == 2


def test_nested_map_leaves():
    g = NestedGrid.create((2, 2), mid_grid=(2, 2), block_size=8,
                          cap_mid=4, cap_leaf=8)
    xs = jnp.asarray([3], jnp.int32)
    ys = jnp.asarray([5], jnp.int32)
    g = g.touch_batch(xs, ys)
    g = g.write_batch(xs, ys, jnp.asarray([2.0]))
    g = g.map_leaves(lambda t: t * 10.0)
    assert float(g.read_batch(xs, ys)[0]) == 20.0


def test_write_batch_dense_matches_scatter(rng):
    """Dense-staging write path == scatter write path == numpy oracle,
    including duplicate destinations and untouched-tile drops."""
    g0 = BlockGrid.create((8, 8), block_size=16, capacity=32)
    n = 1 << 11
    xs = rng.integers(0, 128, n).astype(np.int32)
    ys = rng.integers(0, 128, n).astype(np.int32)
    vals = rng.random(n).astype(np.float32)
    # touch only the left half of the grid: right-half writes must drop
    touched = xs < 64
    g0 = g0.touch_batch(jnp.asarray(xs[touched]), jnp.asarray(ys[touched]))
    ga = g0.write_batch(jnp.asarray(xs), jnp.asarray(ys), jnp.asarray(vals))
    gb = g0.write_batch_dense(jnp.asarray(xs), jnp.asarray(ys),
                              jnp.asarray(vals))
    np.testing.assert_allclose(np.asarray(gb.todense()),
                               np.asarray(ga.todense()), rtol=1e-5, atol=1e-5)
    dense = np.zeros((128, 128), np.float32)
    np.add.at(dense, (ys[touched], xs[touched]), vals[touched])
    np.testing.assert_allclose(np.asarray(gb.todense()), dense, rtol=1e-4,
                               atol=1e-4)


def test_write_batch_dense_morton_and_accumulate(rng):
    """Dense path through the morton-ordered pool; two bursts accumulate."""
    g = BlockGrid.create((8, 8), block_size=16, capacity=64)
    n = 1024
    xs = rng.integers(0, 128, n).astype(np.int32)
    ys = rng.integers(0, 128, n).astype(np.int32)
    vals = rng.random(n).astype(np.float32)
    g = g.touch_batch(jnp.asarray(xs), jnp.asarray(ys), order="morton")
    g = g.write_batch_dense(jnp.asarray(xs), jnp.asarray(ys),
                            jnp.asarray(vals))
    g = g.write_batch_dense(jnp.asarray(xs), jnp.asarray(ys),
                            jnp.asarray(vals))
    dense = np.zeros((128, 128), np.float32)
    np.add.at(dense, (ys, xs), 2.0 * vals)
    np.testing.assert_allclose(np.asarray(g.todense()), dense, rtol=1e-4,
                               atol=1e-4)
