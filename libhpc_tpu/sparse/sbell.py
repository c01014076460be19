"""SBELL — striped block-ELL, the Pallas unstructured-SpMV layout.

The round-1 BELL path (sparse/bell.py) is bound by XLA's HBM row-gather
(0.35 G rows/s -> ~17 Gnnz/s on cant-class FEM matrices, PERF_NOTES.md).
SBELL restructures the same 8x8-block data so the x-lookup becomes the one
gather primitive the VPU executes at full rate: a 128-lane-window dynamic
shuffle (`take_along_axis(axis=1)`; every wider window fails to lower —
scripts/exp_lane_gather2/3.py).

Hybrid structure (v3 — measured trade-offs from v1/v2 on v5e):
  * NEAR tiles (the column-local bulk of a FEM matrix): 128 block slots
    whose block-columns span <= 2 consecutive 128-block-column x *panes*.
    Static two-pass gather + one-hot MXU row reduction runs at ~92 ns/tile
    (v1 measurement). Dynamic per-tile pane loops cost 65 ns/iteration in
    Mosaic (v2 measurement) — so wide spans are NOT handled in-kernel.
  * FAR blocks (scattered columns that would fragment tiles below
    MIN_OCCUPANCY): collected into a small BELL matrix and applied through
    the XLA row-gather path (ops/spmv.py:bell_spmv) — 0.35 G row-gathers/s
    on ~20% of the blocks beats a fragmented kernel on 100% (v1: fill 5.0).

Near-tile layout
  * stripes of 128 block-rows (1024 scalar rows); slots sorted by
    block-column, greedily cut at 128 slots / 2-pane windows; cuts
    thinner than MIN_OCCUPANCY dissolve into the far set.
  * a tile is one (72,128) f32 plane: rows 0..63 hold block values
    transposed as V[8j+i, slot] = block_slot[i,j]; row 64 is packed int32
    meta bitcast to f32 (col_local 9b | local_row 7b << 9) — index
    traffic rides inside the value stream at ~1.6% overhead; rows 65..71
    pad to the 8-sublane DMA tile.
  * per-tile scalars (x-pane base, stripe id) are scalar-prefetch arrays.

The per-block-row reduction is a one-hot MXU matmul (128 slots x 128
local rows, Precision.HIGHEST) accumulated into a VMEM-resident
(n_stripes*8, 128) output — the reference's rank-stable scatter kernels
(SURVEY.md §2.11d, lib/gpu/radix_gpu/include/cuda_radix_scatter.cuh:
104-180) re-expressed as the one primitive the MXU is built for.

Capability parity: the TPU re-expression of the reference's hierarchical
sparse-grid + dense-leaf storage (lib/sparse/include/DenseBlock.hpp,
PointerBlock.hpp) applied to matrix storage, per BASELINE.json configs[1]
(SuiteSparse cant/pwtk, 8x8 blocks).
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
W_PANES = 2        # x panes a near tile may span (static gather passes)
MIN_OCCUPANCY = 64  # tiles cut thinner than this dissolve into the far set


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SBELL:
    """Striped block-ELL matrix (see module docstring for the layout)."""

    vflat: jax.Array   # (n_tiles*VROWS, 128) f32 value+meta planes
    pane: jax.Array    # (n_tiles,) i32 base x-pane per tile (prefetch)
    sid: jax.Array     # (n_tiles,) i32 stripe id per tile (prefetch)
    far: object        # BELL of scattered far blocks, or None
    shape: tuple = dataclasses.field(metadata=dict(static=True))
    n_stripes: int = dataclasses.field(metadata=dict(static=True))
    n_panes: int = dataclasses.field(metadata=dict(static=True))

    @property
    def n_tiles(self) -> int:
        return self.vflat.shape[0] // VROWS

    @property
    def nnz_stored(self) -> int:
        """Stored scalar slots (64 per block slot, incl. padding)."""
        far = self.far.nnz_stored if self.far is not None else 0
        return self.n_tiles * LANE * B * B + far

    @property
    def hbm_bytes(self) -> int:
        """Bytes streamed per SpMV: near value+meta planes + far BELL
        (blocks + indices + its own x/y pass) + x + y."""
        far = 0
        if self.far is not None:
            far = (self.far.blocks.size * 4 + self.far.indices.size * 4
                   + (self.shape[0] + self.shape[1]) * 4)
        return (self.vflat.size * 4
                + self.n_panes * PANE_COLS * 4
                + self.n_stripes * STRIPE_ROWS * 4
                + far)

    def fill_ratio(self, nnz: int) -> float:
        return self.nnz_stored / max(nnz, 1)

    @property
    def far_fraction(self) -> float:
        """Fraction of stored blocks routed to the far (row-gather) path."""
        if self.far is None:
            return 0.0
        far_blocks = self.far.blocks.shape[0] * self.far.blocks.shape[1]
        return far_blocks / max(far_blocks + self.n_tiles * LANE, 1)

    @staticmethod
    def from_scipy(A) -> "SBELL":
        """Host-side construction from any scipy.sparse matrix."""
        import scipy.sparse as sps

        from libhpc_tpu.sparse.bell import BELL

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

        tiles = []                 # (v, meta, pane, sid)
        far_br, far_bc, far_blk = [], [], []
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
                j = int(np.searchsorted(bc, (p + W_PANES) * LANE))
                j = min(j, i + LANE, nsl)
                L = j - i
                if L < MIN_OCCUPANCY and j < nsl:
                    # thin column cluster mid-stripe (a pane-window-forced
                    # fragment): route to the far row-gather path. The
                    # stripe's natural tail tile is kept regardless of size.
                    far_br.append(s * nbr_per_stripe + brl[i:j])
                    far_bc.append(bc[i:j])
                    far_blk.append(blk[i:j])
                    i = j
                    continue
                v = np.zeros((B * B, LANE), np.float32)
                # V[8j+i, slot] = block[slot, i, j]
                v[:, :L] = blk[i:j].transpose(2, 1, 0).reshape(B * B, L)
                meta = np.zeros(LANE, np.int32)
                meta[:L] = ((bc[i:j] - (p << 7)).astype(np.int32)
                            | (brl[i:j].astype(np.int32) << 9))
                tiles.append((v, meta, p, s))
                i = j

        n_tiles = max(len(tiles), 1)
        n_tiles_pad = -(-n_tiles // TPB) * TPB
        vflat = np.zeros((n_tiles_pad, VROWS, LANE), np.float32)
        pane = np.zeros(n_tiles_pad, np.int32)
        sid = np.zeros(n_tiles_pad, np.int32)
        for t, (v, meta, p, s) in enumerate(tiles):
            vflat[t, :B * B] = v
            vflat[t, B * B] = meta.view(np.float32)
            pane[t], sid[t] = p, s

        far = None
        if far_br:
            far_br = np.concatenate(far_br)
            far_bc = np.concatenate(far_bc)
            far_blk = np.concatenate(far_blk)
            far = _bell_from_blocks(far_br, far_bc, far_blk,
                                    (mp, np_), BELL)

        return SBELL(
            vflat=jnp.asarray(vflat.reshape(n_tiles_pad * VROWS, LANE)),
            pane=jnp.asarray(pane),
            sid=jnp.asarray(sid),
            far=far,
            shape=(m, n),
            n_stripes=n_stripes,
            n_panes=n_panes,
        )


def _bell_from_blocks(br, bc, blk, shape, BELL):
    """Assemble a BELL matrix directly from (block_row, block_col, 8x8)
    triplets (the far set) — no scipy round-trip."""
    nbr = shape[0] // B
    order = np.argsort(br, kind="stable")
    br, bc, blk = br[order], bc[order], blk[order]
    counts = np.bincount(br, minlength=nbr)
    K = max(1, int(counts.max()))
    out_blocks = np.zeros((nbr, K, B, B), np.float32)
    out_idx = np.zeros((nbr, K), np.int32)
    starts = np.concatenate([[0], np.cumsum(counts)])
    for r in np.nonzero(counts)[0]:
        s, e = starts[r], starts[r + 1]
        out_blocks[r, :e - s] = blk[s:e]
        out_idx[r, :e - s] = bc[s:e]
    return BELL(blocks=jnp.asarray(out_blocks),
                indices=jnp.asarray(out_idx), shape=shape)
