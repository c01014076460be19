"""Distributed (row-partitioned) SBELL SpMV — unstructured FEM matrices
across the mesh.

Extends the DistCSR overlap discipline (parallel/dist_spmv.py) to the
Pallas SBELL fast path (ops/spmv_pallas.py): each shard owns a contiguous
block of rows and splits its matrix slice into

  diag — the column block the shard also owns x for: SpMV runs on the
         LOCAL x while the all_gather is in flight;
  offd — every other column (full-width SBELL): consumes the gathered x.

This is the BASELINE.json weak-scaling workload (configs[2]: 100M-nnz
unstructured SpMV over ICI/DCN) on the same kernel that wins single-chip.
Setup is host-side scipy (one-time); the hot path is one jitted shard_map
program whose per-shard compute is the SBELL Pallas kernel.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from libhpc_tpu.ops.spmv_pallas import sbell_spmv
from libhpc_tpu.sparse.bell import BELL
from libhpc_tpu.sparse.sbell import SBELL, STRIPE_ROWS, VROWS


def _pad_sbell_tiles(sb: SBELL, n_tiles: int) -> SBELL:
    """Zero-pad a shard's tile stream so every shard has the same count."""
    extra = n_tiles - sb.n_tiles
    if extra == 0:
        return sb
    return dataclasses.replace(
        sb,
        vflat=jnp.pad(sb.vflat, ((0, extra * VROWS), (0, 0))),
        pane=jnp.pad(sb.pane, (0, extra)),
        sid=jnp.pad(sb.sid, (0, extra)),
    )


def _pad_bell_k(b: BELL | None, K: int, shape) -> BELL:
    """Uniform-K (possibly empty) far BELL so shards stack."""
    nbr = shape[0] // 8
    if b is None:
        return BELL(blocks=jnp.zeros((nbr, K, 8, 8), jnp.float32),
                    indices=jnp.zeros((nbr, K), jnp.int32), shape=shape)
    extra = K - b.K
    if extra == 0:
        return b
    return BELL(blocks=jnp.pad(b.blocks, ((0, 0), (0, extra), (0, 0), (0, 0))),
                indices=jnp.pad(b.indices, ((0, 0), (0, extra))),
                shape=b.shape)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DistSBELL:
    """Row-partitioned SBELL, stacked over shards (leading dim = S).

    diag_*: the shard's own column block (consumes local x)
    offd_*: all other columns, full width (consumes gathered x)
    """

    diag_vflat: jax.Array
    diag_pane: jax.Array
    diag_sid: jax.Array
    offd_vflat: jax.Array
    offd_pane: jax.Array
    offd_sid: jax.Array
    far_blocks: jax.Array    # (S, nbr_local, K, 8, 8) offd far set
    far_indices: jax.Array
    shape: tuple = dataclasses.field(metadata=dict(static=True))
    n_shards: int = dataclasses.field(metadata=dict(static=True))
    stripes_local: int = dataclasses.field(metadata=dict(static=True))
    has_far: bool = dataclasses.field(metadata=dict(static=True))

    @property
    def rows_local(self) -> int:
        return self.stripes_local * STRIPE_ROWS

    @staticmethod
    def from_scipy(sp, n_shards: int) -> "DistSBELL":
        import scipy.sparse as sps

        sp = sps.csr_matrix(sp)
        nr, nc = sp.shape
        if nr != nc:
            raise ValueError("row partitioning assumes a square matrix")
        stripes_local = -(-nr // (n_shards * STRIPE_ROWS))
        rows_local = stripes_local * STRIPE_ROWS
        n_pad = rows_local * n_shards
        if n_pad != nr:
            sp = sps.csr_matrix((sp.data, sp.indices, sp.indptr),
                                shape=(nr, n_pad))
            sp.resize((n_pad, n_pad))
        nr = nc = n_pad

        diags, offds = [], []
        for s in range(n_shards):
            r0, r1 = s * rows_local, (s + 1) * rows_local
            blk = sp[r0:r1, :].tocsc()
            d = blk[:, r0:r1].tocsr()
            o = sps.hstack(
                [blk[:, :r0], sps.csr_matrix((rows_local, rows_local)),
                 blk[:, r1:]]).tocsr()
            diags.append(SBELL.from_scipy(d))
            offds.append(SBELL.from_scipy(o))

        dt = max(sb.n_tiles for sb in diags)
        ot = max(sb.n_tiles for sb in offds)
        diags = [_pad_sbell_tiles(sb, dt) for sb in diags]
        offds = [_pad_sbell_tiles(sb, ot) for sb in offds]
        has_far = any(sb.far is not None for sb in offds + diags)
        # fold any diag far set into the offd far set (both consume xg in
        # the worst case; diag far is rare — only thin clusters)
        Kf = 1
        fars = []
        for s in range(n_shards):
            parts = []
            if diags[s].far is not None:
                # diag far indices are local block-cols: shift to global.
                # Padding slots (zero blocks at index 0) shift harmlessly.
                d = diags[s].far
                parts.append(BELL(
                    blocks=d.blocks,
                    indices=d.indices + (s * rows_local) // 8,
                    shape=(rows_local, nc)))
                diags[s] = dataclasses.replace(diags[s], far=None)
            if offds[s].far is not None:
                o = offds[s].far
                parts.append(BELL(blocks=o.blocks, indices=o.indices,
                                  shape=(rows_local, nc)))
            if len(parts) == 2:
                merged = BELL(
                    blocks=jnp.concatenate(
                        [parts[0].blocks, parts[1].blocks], axis=1),
                    indices=jnp.concatenate(
                        [parts[0].indices, parts[1].indices], axis=1),
                    shape=(rows_local, nc))
            elif parts:
                merged = parts[0]
            else:
                merged = None
            fars.append(merged)
            if merged is not None:
                Kf = max(Kf, merged.K)
        fars = [_pad_bell_k(b, Kf, (rows_local, nc)) for b in fars]

        stack = lambda xs: jnp.stack(xs)
        return DistSBELL(
            diag_vflat=stack([sb.vflat for sb in diags]),
            diag_pane=stack([sb.pane for sb in diags]),
            diag_sid=stack([sb.sid for sb in diags]),
            offd_vflat=stack([sb.vflat for sb in offds]),
            offd_pane=stack([sb.pane for sb in offds]),
            offd_sid=stack([sb.sid for sb in offds]),
            far_blocks=stack([b.blocks for b in fars]),
            far_indices=stack([b.indices for b in fars]),
            shape=(nr, nc), n_shards=n_shards,
            stripes_local=stripes_local, has_far=has_far,
        )

    def shard(self, mesh: Mesh, axis: str = "x") -> "DistSBELL":
        sh = NamedSharding(mesh, P(axis))
        put = lambda a: jax.device_put(a, sh)
        return dataclasses.replace(
            self,
            diag_vflat=put(self.diag_vflat), diag_pane=put(self.diag_pane),
            diag_sid=put(self.diag_sid), offd_vflat=put(self.offd_vflat),
            offd_pane=put(self.offd_pane), offd_sid=put(self.offd_sid),
            far_blocks=put(self.far_blocks),
            far_indices=put(self.far_indices),
        )


def dist_sbell_spmv_fn(A: DistSBELL, mesh: Mesh, axis: str = "x"):
    """Jitted distributed matvec: x sharded P(axis) -> y sharded P(axis).

    all_gather(x) is issued first; the diagonal-block SBELL kernel (local
    x) runs while the gather rides the ICI; offd consumes the gathered x."""
    rows_local = A.rows_local
    nr, nc = A.shape
    sl = A.stripes_local

    def body(dv, dp, ds, ov, op_, os_, fb, fi, x):
        x_l = x.reshape(-1)
        xg = lax.all_gather(x_l, axis, tiled=True)
        sb_d = SBELL(vflat=dv[0], pane=dp[0], sid=ds[0], far=None,
                     shape=(rows_local, rows_local), n_stripes=sl,
                     n_panes=rows_local // 1024)
        y = sbell_spmv(sb_d, x_l)
        sb_o = SBELL(vflat=ov[0], pane=op_[0], sid=os_[0], far=None,
                     shape=(rows_local, nc), n_stripes=sl,
                     n_panes=nc // 1024)
        y = y + sbell_spmv(sb_o, xg)
        if A.has_far:
            from libhpc_tpu.ops.spmv import bell_spmv

            far = BELL(blocks=fb[0], indices=fi[0], shape=(rows_local, nc))
            y = y + bell_spmv(far, xg)
        return y

    # check_vma=False: pallas_call out_shapes don't carry vma annotations
    smapped = jax.shard_map(body, mesh=mesh, in_specs=(P(axis),) * 9,
                            out_specs=P(axis), check_vma=False)

    @jax.jit
    def matvec(x):
        return smapped(A.diag_vflat, A.diag_pane, A.diag_sid,
                       A.offd_vflat, A.offd_pane, A.offd_sid,
                       A.far_blocks, A.far_indices, x)

    return matvec
