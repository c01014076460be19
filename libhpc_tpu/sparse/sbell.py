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
  * Within a stripe, slots are sorted by block-column and cut greedily
    into *tiles* of <=128 slots whose block-columns span <= W_PANES
    consecutive 128-block-column x *panes* — so each tile's x-blocks are
    fetched with W_PANES lane-gathers + selects from a VMEM-resident x.
    Column-sorting makes tiles column-local with NO bandedness assumption:
    scattered far blocks simply cluster into their own tiles.
  * A tile is one (72,128) f32 plane: rows 0..63 hold the block values
    transposed as V[8j+i, slot] = block_slot[i,j] (so the kernel's 8
    multiply-adds broadcast one gathered x-entry row per j); row 64 is the
    packed int32 meta bitcast to f32 (block-col-local | block-row-local<<9)
    — index traffic rides inside the value stream at 1/64 ~ 1.6% overhead;
    rows 65..71 pad the plane to the 8-sublane DMA tile.
  * Per-tile scalars (x-pane id, stripe id) are scalar-prefetch arrays.

The per-block-row reduction is a one-hot MXU matmul (128 slots x 128
local rows) into a VMEM-resident (n_stripes*8, 128) accumulator — scatter
expressed as the one primitive the MXU is built for, replacing the
reference's rank-stable scatter kernels (SURVEY.md §2.11d,
lib/gpu/radix_gpu/include/cuda_radix_scatter.cuh:104-180) with a
matrix-unit-native equivalent.

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
VROWS = 72         # 64 value rows + 1 meta row + 7 alignment pad rows
TPB = 8            # tiles per kernel grid step
W_PANES = 2        # x panes a tile may span (gather+select passes)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SBELL:
    """Striped block-ELL matrix (see module docstring for the layout)."""

    vflat: jax.Array   # (n_tiles*VROWS, 128) f32 value+meta planes
    pane: jax.Array    # (n_tiles,) i32 base x-pane per tile (prefetch)
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
    def from_scipy(A, w_panes: int = W_PANES) -> "SBELL":
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

        tiles_v, tiles_meta, tiles_pane, tiles_sid = [], [], [], []
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
            i = 0
            nsl = len(bc)
            while i < nsl:
                p = int(bc[i]) >> 7
                j = int(np.searchsorted(bc, (p + w_panes) * LANE))
                j = min(j, i + LANE, nsl)
                L = j - i
                # V[8j+i, slot] = block[slot, i, j]
                v = np.zeros((B * B, LANE), np.float32)
                v[:, :L] = blk[i:j].transpose(2, 1, 0).reshape(B * B, L)
                meta = np.zeros(LANE, np.int32)
                meta[:L] = ((bc[i:j] - (p << 7)).astype(np.int32)
                            | (brl[i:j].astype(np.int32) << 9))
                tiles_v.append(v)
                tiles_meta.append(meta)
                tiles_pane.append(p)
                tiles_sid.append(s)
                i = j

        n_tiles = max(len(tiles_v), 1)
        n_tiles_pad = -(-n_tiles // TPB) * TPB
        vflat = np.zeros((n_tiles_pad, VROWS, LANE), np.float32)
        pane = np.zeros(n_tiles_pad, np.int32)
        sid = np.zeros(n_tiles_pad, np.int32)
        for t, (v, meta) in enumerate(zip(tiles_v, tiles_meta)):
            vflat[t, :B * B] = v
            vflat[t, B * B] = meta.view(np.float32)
        pane[:len(tiles_pane)] = tiles_pane
        sid[:len(tiles_sid)] = tiles_sid
        return SBELL(
            vflat=jnp.asarray(vflat.reshape(n_tiles_pad * VROWS, LANE)),
            pane=jnp.asarray(pane),
            sid=jnp.asarray(sid),
            shape=(m, n),
            n_stripes=n_stripes,
            n_panes=n_panes,
        )
