"""SBELL — striped block-ELL, the Pallas unstructured-SpMV layout.

The round-1 BELL path (sparse/bell.py) is bound by XLA's HBM row-gather
(0.35 G rows/s -> ~17 Gnnz/s on cant-class FEM matrices, PERF_NOTES.md).
SBELL restructures the same 8x8-block data so the x-lookup becomes the one
gather primitive the VPU executes at full rate: a 128-lane-window dynamic
shuffle (`take_along_axis(axis=1)`, measured 373 G gathers/s; every wider
window fails to lower — scripts/exp_lane_gather2/3.py).

Layout
  * 8x8 blocks ("slots") are grouped into *stripes* of 128 block-rows
    (1024 scalar rows).
  * Within a stripe, slots are sorted by block-column and packed densely
    into full *tiles* of 128 slots (only the stripe's last tile is padded
    -> fill stays ~1.05-1.15 regardless of sparsity pattern; the 2-pane
    window of the first design fragmented scattered FEM matrices to
    fill 5). A tile's x-blocks are fetched with one lane-gather + select
    per 128-block-column *pane* its sorted slots span — a dynamic
    fori_loop, so banded tiles pay ~2 passes and rare wide tiles pay more.
  * A tile is one (72,128) f32 plane: rows 0..63 hold the block values
    transposed as V[8j+i, slot] = block_slot[i,j] (so the kernel's 8
    multiply-adds broadcast one gathered x-entry row per j); rows 64-65
    are packed int32 meta bitcast to f32 — index traffic rides inside the
    value stream at ~3% overhead; rows 66..71 pad to the 8-sublane tile.
      row 64 (per slot lane):  col_local (24b) | row_sort_perm (7b) << 24
      row 65 (per local row):  seg_start (8b) | seg_end (8b) << 8
  * Per-tile scalars (x-pane base, pane span, stripe id) are
    scalar-prefetch arrays.

The per-block-row reduction: products are lane-shuffled into row-sorted
order (one take_along_axis with the construction-time permutation), then
segment-reduced with an in-tile lane cumsum + per-row boundary gathers —
the count->scan->scatter skeleton of the reference's radix pipeline
(SURVEY.md §3.2, lib/gpu/radix_gpu/include/cuda_radix_scatter.cuh) with
the scatter replaced by exclusive-prefix differences, accumulated into a
VMEM-resident (n_stripes*8, 128) output at a dynamic 8-aligned offset.

Capability parity: this is the TPU re-expression of the reference's
hierarchical sparse-grid + dense-leaf storage (lib/sparse/include/
DenseBlock.hpp, PointerBlock.hpp) applied to matrix storage, per
BASELINE.json configs[1] (SuiteSparse cant/pwtk, 8x8 blocks).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

B = 8              # scalar block size (8x8 = one f32 sublane tile)
LANE = 128         # slots per tile / local rows per stripe
STRIPE_ROWS = B * LANE      # 1024 scalar rows per stripe
PANE_COLS = B * LANE        # 1024 scalar cols per x pane
VROWS = 72         # 64 value rows + 2 meta rows + 6 alignment pad rows
TPB = 8            # tiles per kernel grid step


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SBELL:
    """Striped block-ELL matrix (see module docstring for the layout)."""

    vflat: jax.Array   # (n_tiles*VROWS, 128) f32 value+meta planes
    pane: jax.Array    # (n_tiles,) i32 base x-pane per tile (prefetch)
    npan: jax.Array    # (n_tiles,) i32 pane span per tile (prefetch)
    sid: jax.Array     # (n_tiles,) i32 stripe id per tile (prefetch)
    shape: tuple = dataclasses.field(metadata=dict(static=True))
    n_stripes: int = dataclasses.field(metadata=dict(static=True))
    n_panes: int = dataclasses.field(metadata=dict(static=True))

    @property
    def n_tiles(self) -> int:
        return self.vflat.shape[0] // VROWS

    @property
    def nnz_stored(self) -> int:
        """Stored scalar slots (64 per block slot, incl. padding)."""
        return self.n_tiles * LANE * B * B

    @property
    def hbm_bytes(self) -> int:
        """Bytes streamed per SpMV: value+meta planes + x + y."""
        return (self.vflat.size * 4
                + self.n_panes * PANE_COLS * 4
                + self.n_stripes * STRIPE_ROWS * 4)

    def fill_ratio(self, nnz: int) -> float:
        return self.nnz_stored / max(nnz, 1)

    @staticmethod
    def from_scipy(A) -> "SBELL":
        """Host-side construction from any scipy.sparse matrix."""
        import scipy.sparse as sps

        A = sps.csr_matrix(A)
        m, n = A.shape
        n_stripes = -(-m // STRIPE_ROWS)
        n_panes = -(-n // PANE_COLS)
        mp, np_ = n_stripes * STRIPE_ROWS, n_panes * PANE_COLS
        if (mp, np_) != (m, n):
            A = sps.csr_matrix((A.data, A.indices, A.indptr), shape=(m, np_))
            A.resize((mp, np_))
        bsr = A.tobsr((B, B))
        blocks = np.ascontiguousarray(bsr.data, dtype=np.float32)
        bcols = bsr.indices.astype(np.int64)
        indptr = bsr.indptr.astype(np.int64)

        tiles = []        # (v (64,128), meta0, meta1, pane, npan, sid)
        nbr_per_stripe = LANE
        for s in range(n_stripes):
            r0, r1 = s * nbr_per_stripe, (s + 1) * nbr_per_stripe
            lo, hi = indptr[r0], indptr[r1]
            if lo == hi:
                continue
            counts = np.diff(indptr[r0:r1 + 1])
            brl = np.repeat(np.arange(nbr_per_stripe, dtype=np.int64),
                            counts)
            bc = bcols[lo:hi]
            order = np.argsort(bc, kind="stable")
            bc, brl = bc[order], brl[order]
            blk = blocks[lo:hi][order]        # (nslots, 8, 8)
            nsl = len(bc)
            for i in range(0, nsl, LANE):
                j = min(i + LANE, nsl)
                L = j - i
                p = int(bc[i]) >> 7
                npan = (int(bc[j - 1]) >> 7) - p + 1
                # rows: real slots keep their local row; pads sort last
                rows = np.full(LANE, LANE - 1, np.int64)
                rows[:L] = brl[i:j]
                cols_local = np.zeros(LANE, np.int64)
                cols_local[:L] = bc[i:j] - (p << 7)
                perm = np.argsort(rows, kind="stable").astype(np.int32)
                rows_sorted = rows[perm]
                # per local row r: slot range [s_r, e_r) in sorted order
                seg_s = np.searchsorted(rows_sorted, np.arange(LANE),
                                        side="left").astype(np.int32)
                seg_e = np.searchsorted(rows_sorted, np.arange(LANE),
                                        side="right").astype(np.int32)
                # pad slots carry zero values: fold them into row 127's
                # segment harmlessly (they contribute 0)
                v = np.zeros((B * B, LANE), np.float32)
                # V[8j+i, slot] = block[slot, i, j]
                v[:, :L] = blk[i:j].transpose(2, 1, 0).reshape(B * B, L)
                meta0 = (cols_local.astype(np.int32)
                         | (perm << 24)).astype(np.int32)
                meta1 = (seg_s | (seg_e << 8)).astype(np.int32)
                tiles.append((v, meta0, meta1, p, npan, s))

        n_tiles = max(len(tiles), 1)
        n_tiles_pad = -(-n_tiles // TPB) * TPB
        vflat = np.zeros((n_tiles_pad, VROWS, LANE), np.float32)
        pane = np.zeros(n_tiles_pad, np.int32)
        npan = np.ones(n_tiles_pad, np.int32)
        sid = np.zeros(n_tiles_pad, np.int32)
        for t, (v, meta0, meta1, p, np_t, s) in enumerate(tiles):
            vflat[t, :B * B] = v
            vflat[t, B * B] = meta0.view(np.float32)
            vflat[t, B * B + 1] = meta1.view(np.float32)
            pane[t], npan[t], sid[t] = p, np_t, s
        # zero pad tiles: all-zero meta => every segment empty => no-op
        return SBELL(
            vflat=jnp.asarray(vflat.reshape(n_tiles_pad * VROWS, LANE)),
            pane=jnp.asarray(pane),
            npan=jnp.asarray(npan),
            sid=jnp.asarray(sid),
            shape=(m, n),
            n_stripes=n_stripes,
            n_panes=n_panes,
        )
