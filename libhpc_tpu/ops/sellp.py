"""SELL-P — per-row-sourced plane ELL, the round-5 SELL redesign
(VERDICT r4 next-round #5).

The round-4 SELL kernel (ops/ell_pallas.py) pays W·8 rotation-gather
passes per (8,128) tile (~W·40 VPU ops/1024 entries) because an entry's
x target has BOTH a data-dependent sublane and lane, and the only fast
in-kernel gather is the same-shape lane shuffle. It committed 15.6
Gnnz/s at 0.21 of own-bytes — VPU-bound.

The verdict asked for an MXU one-hot experiment; that formulation is
structurally unsound on this hardware: the per-lane 8×8 sublane
permutation varies by lane, so the contraction runs ALONG sublanes
batched over lanes — exactly the axis the MXU cannot batch (it
contracts over lanes). Expressed on the VPU the one-hot form costs 64
compare + 64 FMA planes per tile — ~3x MORE than the rotation kernel.

SELL-P removes the sublane problem in the LAYOUT instead (the co-design
move that produced SBELL's v4 row-slice tiles). Host-side, each entry is
keyed by its x target's (pane, sublane); entries sharing a key and an
output sublane j form a ROW UNIT — 128 lanes whose x reads all come
from the single x row x[pane, jp, :]. Tiles pack 8 units (one per
output sublane, so slot (j,l) IS output row 1024·sid + 8l + j), and the
per-tile scalars pane[8]/jp[8] tell the kernel which x row each unit
reads:

    xplane = stack_j x[pane_j, jp_j, :]            # 8 row reads
    gx     = take_along_axis(xplane, lanes, axis=1)  # ONE lane shuffle
    out   += V * gx                                  # one FMA

— ~14 VPU ops/1024 entries vs ~W·40, and no window constraint at all
(a unit addresses ANY absolute pane, lifting round-4 SELL's W-pane
scatter restriction). Fill stays ~ELL-level: units per stripe =
Σ_buckets occupied output-sublanes, and tiles = max over j of the units
sharing output sublane j (balanced for banded/FEM structure; the ratio
is reported so callers can fall back to SBELL when packing fragments).

Capability parity: scalar-ELL SpMV at full rate (reference lib/sparse
formats are all first-class, SURVEY.md §2.3-2.7); the bucket-by-key
construction is the TPU analog of the reference's counting-sort binning
(lib/sort/radix_cpu/include/radix_sort_cpu.hpp:90-125).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from libhpc_tpu.ops._pallas_utils import interpret_mode

B = 8
LANE = 128
PANE = B * LANE          # 1024 rows/cols per stripe/pane
TPB = 16                 # tiles per grid step


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SELLP:
    """Per-row-sourced plane ELL (module docstring)."""

    vflat: jax.Array   # (n_tiles*B, LANE) f32 value planes
    lidx: jax.Array    # (n_tiles*B, LANE) i32 x LANE index per slot
    pane: jax.Array    # (n_tiles, B) i32 absolute x pane per tile row
    jp: jax.Array      # (n_tiles, B) i32 x sublane per tile row
    sid: jax.Array     # (n_tiles,) i32 stripe id per tile
    shape: tuple = dataclasses.field(metadata=dict(static=True))
    n_stripes: int = dataclasses.field(metadata=dict(static=True))
    n_panes: int = dataclasses.field(metadata=dict(static=True))

    @property
    def n_tiles(self) -> int:
        return self.vflat.shape[0] // B

    @property
    def hbm_bytes(self) -> int:
        """Streamed per SpMV: value + lane-index planes + x + y."""
        return (self.vflat.size * 4 + self.lidx.size * 4
                + self.n_panes * PANE * 4 + self.n_stripes * PANE * 4)

    def fill_ratio(self, nnz: int) -> float:
        return self.n_tiles * PANE / max(nnz, 1)


def sellp_from_scipy(A) -> SELLP:
    """Host-side SELL-P build from any scipy.sparse matrix.

    Per stripe: entries keyed by (target pane, target sublane,
    per-position multiplicity); each (key, output-sublane) group is one
    row unit; units sharing an output sublane stack into successive
    tiles (sorted by key for x-read locality)."""
    import scipy.sparse as sps

    A = sps.csr_matrix(A).astype(np.float32)
    m, n = A.shape
    n_stripes = -(-m // PANE)
    n_panes = -(-n // PANE)
    indptr = A.indptr.astype(np.int64)

    per_stripe = []        # (V, L, pane(8,T), jp(8,T)) transposed later
    for s in range(n_stripes):
        r0, r1 = s * PANE, min((s + 1) * PANE, m)
        lo, hi = indptr[r0], indptr[r1]
        if lo == hi:
            continue
        cols = A.indices[lo:hi].astype(np.int64)
        vals = A.data[lo:hi]
        rows = np.repeat(np.arange(r0, r1, dtype=np.int64),
                         np.diff(indptr[r0:r1 + 1]))
        pos = rows - r0                      # 0..1023 within stripe
        j_out = pos & 7
        l_out = pos >> 3
        key = ((cols >> 10) << 3) | (cols & 7)      # (pane, jp)
        lp = (cols >> 3) & (LANE - 1)
        # multiplicity within (key, pos): two entries of one output row
        # reading the same x row need separate units
        order = np.lexsort((pos, key))
        key_s, pos_s = key[order], pos[order]
        new_run = np.ones(key_s.size, bool)
        new_run[1:] = (key_s[1:] != key_s[:-1]) | (pos_s[1:] != pos_s[:-1])
        run_start = np.maximum.accumulate(
            np.where(new_run, np.arange(key_s.size), 0))
        k_rank = np.arange(key_s.size) - run_start
        kmax = int(k_rank.max()) + 1
        # unit id = (key, k, j_out); tile slot of a unit = its rank among
        # units with the same j_out (sorted by (key, k) via unit id)
        jo = j_out[order]
        unit = (key_s * kmax + k_rank) * 8 + jo
        uniq, unit_of = np.unique(unit, return_inverse=True)
        u_jo = (uniq % 8).astype(np.int64)
        # rank of each unit within its j_out class
        u_order = np.lexsort((uniq, u_jo))
        u_rank = np.empty(uniq.size, np.int64)
        cls_start = np.zeros(9, np.int64)
        np.add.at(cls_start, u_jo + 1, 1)
        cls_start = np.cumsum(cls_start)
        u_rank[u_order] = np.arange(uniq.size) - np.repeat(
            cls_start[:-1], np.diff(cls_start))
        T = int(u_rank.max()) + 1
        V = np.zeros((T, B, LANE), np.float32)
        L = np.zeros((T, B, LANE), np.int32)
        pane_t = np.zeros((T, B), np.int32)
        jp_t = np.zeros((T, B), np.int32)
        tile_of = u_rank[unit_of]
        V[tile_of, jo, l_out[order]] = vals[order]
        L[tile_of, jo, l_out[order]] = lp[order]
        u_key = uniq // (8 * kmax)
        pane_t[u_rank, u_jo] = (u_key >> 3).astype(np.int32)
        jp_t[u_rank, u_jo] = (u_key & 7).astype(np.int32)
        per_stripe.append((V, L, pane_t, jp_t, s))

    n_tiles = max(sum(g[0].shape[0] for g in per_stripe), 1)
    n_pad = -(-n_tiles // TPB) * TPB
    vflat = np.zeros((n_pad, B, LANE), np.float32)
    lflat = np.zeros((n_pad, B, LANE), np.int32)
    pane_f = np.zeros((n_pad, B), np.int32)
    jp_f = np.zeros((n_pad, B), np.int32)
    sid_f = np.zeros(n_pad, np.int32)
    t = 0
    for V, L, p, j, s in per_stripe:
        k = V.shape[0]
        vflat[t:t + k] = V
        lflat[t:t + k] = L
        pane_f[t:t + k] = p
        jp_f[t:t + k] = j
        sid_f[t:t + k] = s
        t += k
    return SELLP(vflat=jnp.asarray(vflat.reshape(n_pad * B, LANE)),
                 lidx=jnp.asarray(lflat.reshape(n_pad * B, LANE)),
                 pane=jnp.asarray(pane_f), jp=jnp.asarray(jp_f),
                 sid=jnp.asarray(sid_f), shape=(m, n),
                 n_stripes=n_stripes, n_panes=n_panes)


def _kernel(pane_ref, jp_ref, sid_ref, v_ref, l_ref, x_ref, o_ref):
    g = pl.program_id(0)

    @pl.when(g == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    for t in range(TPB):
        i = g * TPB + t
        sid = sid_ref[i]
        # assemble the tile's x plane: one x row per output sublane
        rows = [x_ref[pane_ref[i, j], pl.ds(jp_ref[i, j], 1), :]
                for j in range(B)]
        xplane = jnp.concatenate(rows, axis=0)               # (8,128)
        L = l_ref[t * B:(t + 1) * B, :]
        V = v_ref[t * B:(t + 1) * B, :]
        gx = jnp.take_along_axis(xplane, L, axis=1)
        o_ref[pl.ds(sid * B, B), :] = \
            o_ref[pl.ds(sid * B, B), :] + V * gx


@partial(jax.jit, static_argnums=(1, 2, 3))
def _sellp_call(args, n_tiles, n_stripes, n_panes):
    from libhpc_tpu.ops.spmv_pallas import VMEM_LIMIT

    pane, jp, sid, vflat, lidx, x3 = args
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_tiles // TPB,),
        in_specs=[
            pl.BlockSpec((TPB * B, LANE), lambda g, *_: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TPB * B, LANE), lambda g, *_: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),      # x panes, resident
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((n_stripes * B, LANE), jnp.float32),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT),
        interpret=interpret_mode(),
    )(pane, jp, sid, vflat, lidx, x3)


def sellp_spmv(sp: SELLP, x: jax.Array) -> jax.Array:
    """y = A @ x for SELL-P A; x f32 (ncols,) -> f32 (nrows,)."""
    m, n = sp.shape
    from libhpc_tpu.ops.spmv_pallas import VMEM_CAP

    resident = (sp.n_panes + sp.n_stripes) * PANE * 4
    if resident > VMEM_CAP:
        raise ValueError(
            f"sellp_spmv: x panes + output need {resident} B of VMEM "
            f"(> {VMEM_CAP}); use the chunked SBELL path for matrices "
            "this large (ops/spmv_pallas.py)")
    xpad = jnp.pad(x, (0, sp.n_panes * PANE - n))
    x3 = xpad.reshape(sp.n_panes, LANE, B).transpose(0, 2, 1)
    out = _sellp_call((sp.pane, sp.jp, sp.sid, sp.vflat, sp.lidx, x3),
                      sp.n_tiles, sp.n_stripes, sp.n_panes)
    y = out.reshape(sp.n_stripes, B, LANE).transpose(0, 2, 1).reshape(-1)
    return y[:m]
