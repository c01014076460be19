"""Hierarchical sparse block grid — TPU-native re-expression of the
reference's lib/sparse stack (RootGrid / PointerBlock / HashBlock /
DenseBlock, lib/sparse/include/RootGrid.hpp:12, SparseDS.hpp:4-7).

The reference allocates dense leaf tiles on first touch behind CAS/hash
inserts (PointerBlock.hpp:100-125, HashBlock.hpp:92-102). On TPU there are
no atomics and no pointers; the same capabilities become:

  tile_map (Gy, Gx) int32   — the 'pointer block': slot id or -1 (= null)
  tiles (capacity, B, B)    — the pool of dense leaf blocks ('DenseBlock's)
  n_active                  — bump 'allocator' cursor (XLA-donated update)

and the mutation API is *batched*: `touch_batch` replaces per-element
insert-on-touch with sort-dedupe-allocate (the radix-binning descendant,
SURVEY.md §3.3), `write_batch` replaces CAS scatter with one XLA
scatter-add. All methods are jitted and static-shape; capacity is the
compile-time bound (like the reference's GridSize template parameter).

Coordinates: x is the fast (column) axis, matching the reference's
``write(x, y, v)`` convention (RootGrid.hpp:17).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BlockGrid:
    tile_map: jax.Array   # (Gy, Gx) int32, -1 = unallocated
    tiles: jax.Array      # (capacity, B, B)
    n_active: jax.Array   # () int32
    block_size: int = dataclasses.field(metadata=dict(static=True))
    capacity: int = dataclasses.field(metadata=dict(static=True))

    # -- construction ------------------------------------------------------

    @staticmethod
    def create(grid_blocks: tuple, block_size: int = 16,
               capacity: int = 1024, dtype=jnp.float32) -> "BlockGrid":
        gy, gx = grid_blocks
        return BlockGrid(
            tile_map=jnp.full((gy, gx), -1, jnp.int32),
            tiles=jnp.zeros((capacity, block_size, block_size), dtype),
            n_active=jnp.zeros((), jnp.int32),
            block_size=block_size,
            capacity=capacity,
        )

    @property
    def shape(self) -> tuple:
        """Element-level extent (y, x)."""
        gy, gx = self.tile_map.shape
        return (gy * self.block_size, gx * self.block_size)

    def _split(self, xs, ys):
        b = self.block_size
        return xs // b, ys // b, xs % b, ys % b

    # -- touch (allocation) ------------------------------------------------

    @partial(jax.jit, static_argnames=("order",))
    def touch_batch(self, xs, ys, order: str = "raster") -> "BlockGrid":
        """Allocate leaf tiles for every (x, y) — batched insert-on-touch.

        Dedupe via sort + head-flags (no hash map needed), then assign pool
        slots in order. Already-allocated tiles keep their slot (idempotent,
        like the reference's DCLP touch_pointer, PointerBlock.hpp:100-125).
        """
        bx, by, _, _ = self._split(xs.astype(jnp.int32), ys.astype(jnp.int32))
        gy, gx = self.tile_map.shape
        if order == "morton":
            # Z-order slot assignment: spatially adjacent tiles get nearby
            # pool slots (the reference's libmorton layout trick applied to
            # the tile pool). The Morton code is a bijection of (bx, by),
            # so it serves directly as the unique tile id.
            from libhpc_tpu.utils.morton import morton2d_encode

            tid = morton2d_encode(bx.astype(jnp.uint32),
                                  by.astype(jnp.uint32))
        else:
            tid = (by * gx + bx).astype(jnp.uint32)    # flat tile ids
        tid_sorted = jax.lax.sort(tid)
        is_head = jnp.concatenate(
            [jnp.ones((1,), bool), tid_sorted[1:] != tid_sorted[:-1]]
        )
        # unique tile ids packed to the front (tail padded with duplicates)
        head_order = jnp.argsort(~is_head, stable=True)
        uniq = tid_sorted[head_order]                  # heads first
        n_uniq = jnp.sum(is_head.astype(jnp.int32))
        k = jnp.arange(tid.shape[0])
        if order == "morton":
            from libhpc_tpu.utils.morton import morton2d_decode

            ux32, uy32 = morton2d_decode(uniq)
            ux, uy = ux32.astype(jnp.int32), uy32.astype(jnp.int32)
        else:
            uniq_i = uniq.astype(jnp.int32)
            uy, ux = uniq_i // gx, uniq_i % gx
        existing = self.tile_map[uy, ux]
        is_new = (existing < 0) & (k < n_uniq)
        # slot for each new tile: n_active + rank among new
        new_rank = jnp.cumsum(is_new.astype(jnp.int32)) - is_new
        slot = jnp.where(is_new, self.n_active + new_rank, existing)
        # out-of-capacity tiles stay unallocated (fail-soft; checkable)
        slot = jnp.where(slot < self.capacity, slot, existing)
        do_write = is_new & (slot >= 0)
        tm = self.tile_map.at[
            jnp.where(do_write, uy, 0), jnp.where(do_write, ux, 0)
        ].max(jnp.where(do_write, slot.astype(jnp.int32), -1))
        n_new = jnp.minimum(
            self.n_active + jnp.sum(is_new.astype(jnp.int32)),
            jnp.int32(self.capacity),
        )
        return dataclasses.replace(self, tile_map=tm, n_active=n_new)

    # -- read / write ------------------------------------------------------

    @partial(jax.jit, static_argnames=("mode",))
    def write_batch(self, xs, ys, vals, mode: str = "add") -> "BlockGrid":
        """Batched write into touched tiles — the particle-write workload
        (test_hpc_benchmark.cpp:866-870: 2^20 writes per iteration).

        Writes to untouched tiles are dropped (slot -1 → out-of-range
        scatter index, which XLA drops) — mirroring that the reference
        would have touched first.
        """
        bx, by, ox, oy = self._split(xs.astype(jnp.int32), ys.astype(jnp.int32))
        slot = self.tile_map[by, bx]
        b = self.block_size
        # linearized destination: XLA lowers flat 1D scatter far better than
        # multi-index 3D scatter on TPU (measured ~30x, scripts/exp_scatter.py)
        lin = slot * (b * b) + oy * b + ox
        n_lin = self.capacity * b * b
        lin_safe = jnp.where(slot >= 0, lin, n_lin)  # OOB → dropped
        flat = self.tiles.reshape(n_lin)
        if mode == "add":
            flat = flat.at[lin_safe].add(vals, mode="drop")
        elif mode == "set":
            flat = flat.at[lin_safe].set(vals, mode="drop")
        else:
            raise ValueError(mode)
        return dataclasses.replace(
            self, tiles=flat.reshape(self.tiles.shape))

    @jax.jit
    def read_batch(self, xs, ys):
        """Batched read; unallocated tiles read as 0 (the reference returns
        default T{} for null blocks, RootGrid.hpp:25-45)."""
        bx, by, ox, oy = self._split(xs.astype(jnp.int32), ys.astype(jnp.int32))
        slot = self.tile_map[by, bx]
        b = self.block_size
        lin = jnp.clip(slot, 0, self.capacity - 1) * (b * b) + oy * b + ox
        vals = self.tiles.reshape(-1)[lin]  # flat 1D gather (see write_batch)
        return jnp.where(slot >= 0, vals, 0)

    # -- foreach / todense -------------------------------------------------

    @partial(jax.jit, static_argnames=("fn",))
    def map_tiles(self, fn) -> "BlockGrid":
        """Apply fn: (B, B) -> (B, B) over all *active* tiles (the
        reference's foreach, DenseBlock.hpp:63-70). Inactive pool slots are
        left untouched."""
        active = jnp.arange(self.capacity) < self.n_active
        new_tiles = jax.vmap(fn)(self.tiles)
        tiles = jnp.where(active[:, None, None], new_tiles, self.tiles)
        return dataclasses.replace(self, tiles=tiles)

    @jax.jit
    def todense(self) -> jax.Array:
        gy, gx = self.tile_map.shape
        b = self.block_size
        slot = self.tile_map  # (gy, gx)
        vals = self.tiles[jnp.clip(slot, 0, self.capacity - 1)]  # (gy,gx,b,b)
        vals = jnp.where((slot >= 0)[:, :, None, None], vals, 0)
        return vals.transpose(0, 2, 1, 3).reshape(gy * b, gx * b)

    @jax.jit
    def n_allocated(self):
        return self.n_active
