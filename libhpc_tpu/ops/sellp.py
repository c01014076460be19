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
from the single x row x[pane, jp, :]. Tiles pack up to 8 units of ONE
pane (one per output sublane, so slot (j,l) IS output row
1024·sid + 8l + j); the unit's jp rides in bits 7-9 of its lane-index
plane, and the kernel resolves the whole tile with three full-rate
primitives and zero per-entry work:

    P      = onehot(jp_row)                 # (8,8) from the index plane
    xplane = P @ x[pane]                    # one MXU dot: row j = x row jp_j
    gx     = take_along_axis(xplane, lanes) # ONE lane shuffle
    out   += V * gx                         # one FMA

(~12 VPU-op-equivalents/1024 entries vs the rotation kernel's ~W·40.
A first cut read each row separately — x_ref[p_j, ds(jp_j, 1), :] + an
8-way concatenate — and measured ~55 ns/tile of shuffle overhead, only
1.1x the rotation kernel; the one-pane/MXU-permute form is what makes
the layout pay.) No window constraint survives: a tile addresses ANY
absolute pane, lifting round-4 SELL's W-pane scatter restriction. Fill
stays ~ELL-level: tiles per stripe = Σ_panes max over j of that pane's
units sharing output sublane j (balanced for banded/FEM structure; the
ratio is reported so callers can fall back to SBELL when packing
fragments).

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
TPB = 64                 # tiles per grid step (per-object static): at 8 KB
                         # of streamed planes per tile the grid pipeline is
                         # latency-bound below ~0.5 MB per step — the same
                         # mechanism as the SBELL bf16 finding (round 5)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SELLP:
    """Per-row-sourced plane ELL (module docstring).

    lidx packs lane (bits 0-6) and the unit's x sublane jp (bits 7-9)
    per slot; all slots of a tile row share one jp, all rows of a tile
    share one pane."""

    vflat: jax.Array   # (n_tiles*B, LANE) f32 value planes
    lidx: jax.Array    # (n_tiles*B, LANE) i32 packed jp<<7 | lane
    pane: jax.Array    # (n_tiles,) i32 absolute x pane per tile
    sid: jax.Array     # (n_tiles,) i32 stripe id per tile
    shape: tuple = dataclasses.field(metadata=dict(static=True))
    n_stripes: int = dataclasses.field(metadata=dict(static=True))
    n_panes: int = dataclasses.field(metadata=dict(static=True))
    tpb: int = dataclasses.field(default=TPB, metadata=dict(static=True))

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


def sellp_from_scipy(A, tpb: int = None) -> SELLP:
    """Host-side SELL-P build from any scipy.sparse matrix.

    Per stripe: entries keyed by (target pane, target sublane jp,
    per-position multiplicity); each (key, output-sublane) group is one
    row unit; units group into tiles PER PANE (a tile holds up to 8
    units of one pane, one per output sublane), and each unit's jp is
    packed into bits 7-9 of its lane-index row."""
    import scipy.sparse as sps

    if tpb is None:
        tpb = TPB
    A = sps.csr_matrix(A).astype(np.float32)
    m, n = A.shape
    n_stripes = -(-m // PANE)
    n_panes = -(-n // PANE)
    indptr = A.indptr.astype(np.int64)

    per_stripe = []        # (V, L, pane(T,), s)
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
        key = ((cols >> 10) << 3) | (cols & 7)      # pane<<3 | jp
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
        # unit id = (key, k, j_out), ascending = pane-major
        jo = j_out[order]
        unit = (key_s * kmax + k_rank) * 8 + jo
        uniq, unit_of = np.unique(unit, return_inverse=True)
        u_jo = uniq % 8
        u_key = uniq // (8 * kmax)
        u_pane = u_key >> 3
        u_jp = u_key & 7
        # rank of each unit within its (pane, j_out) class (uniq is
        # already pane-major sorted)
        newc = np.ones(uniq.size, bool)
        newc[1:] = (u_pane[1:] != u_pane[:-1]) | (u_jo[1:] != u_jo[:-1])
        # classes are NOT adjacent in uniq order (j_out interleaves), so
        # rank via lexsort by (pane, j_out)
        ord2 = np.lexsort((uniq, u_jo, u_pane))
        newg = np.ones(uniq.size, bool)
        pp, jj = u_pane[ord2], u_jo[ord2]
        newg[1:] = (pp[1:] != pp[:-1]) | (jj[1:] != jj[:-1])
        gstart = np.maximum.accumulate(
            np.where(newg, np.arange(uniq.size), 0))
        rank = np.empty(uniq.size, np.int64)
        rank[ord2] = np.arange(uniq.size) - gstart
        # tiles per pane = max rank+1 over the pane's units
        pane_vals, pane_inv = np.unique(u_pane, return_inverse=True)
        T_pane = np.zeros(pane_vals.size, np.int64)
        np.maximum.at(T_pane, pane_inv, rank + 1)
        offs = np.concatenate([[0], np.cumsum(T_pane)])
        tile_of_unit = offs[pane_inv] + rank
        T = int(offs[-1])
        V = np.zeros((T, B, LANE), np.float32)
        L = np.zeros((T, B, LANE), np.int32)
        pane_t = np.zeros(T, np.int32)
        pane_t[tile_of_unit] = pane_vals[pane_inv].astype(np.int32)
        # per-slot write: entry -> (tile of its unit, j_out, l_out)
        tile_of = tile_of_unit[unit_of]
        V[tile_of, jo, l_out[order]] = vals[order]
        L[tile_of, jo, l_out[order]] = lp[order]
        # pack each unit's jp into bits 7-9 of its whole index row
        L[tile_of_unit, u_jo, :] |= (u_jp.astype(np.int32) << 7)[:, None]
        per_stripe.append((V, L, pane_t, s))

    n_tiles = max(sum(g[0].shape[0] for g in per_stripe), 1)
    n_pad = -(-n_tiles // tpb) * tpb
    vflat = np.zeros((n_pad, B, LANE), np.float32)
    lflat = np.zeros((n_pad, B, LANE), np.int32)
    pane_f = np.zeros(n_pad, np.int32)
    sid_f = np.zeros(n_pad, np.int32)
    # INTERLEAVED tile order (round-robin across stripes, not
    # stripe-major): consecutive tiles of one stripe accumulate into the
    # SAME output rows, serializing the per-tile read-modify-write; the
    # adds commute, so emit tile k of every stripe before tile k+1
    units = [(li, si) for si, g in enumerate(per_stripe)
             for li in range(g[0].shape[0])]
    units.sort()
    for t, (li, si) in enumerate(units):
        V, L, p, s = per_stripe[si]
        vflat[t] = V[li]
        lflat[t] = L[li]
        pane_f[t] = p[li]
        sid_f[t] = s
    return SELLP(vflat=jnp.asarray(vflat.reshape(n_pad * B, LANE)),
                 lidx=jnp.asarray(lflat.reshape(n_pad * B, LANE)),
                 pane=jnp.asarray(pane_f),
                 sid=jnp.asarray(sid_f), shape=(m, n),
                 n_stripes=n_stripes, n_panes=n_panes, tpb=tpb)


def _kernel(pane_ref, sid_ref, v_ref, l_ref, x_ref, o_ref, *, tpb: int):
    g = pl.program_id(0)

    @pl.when(g == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    for t in range(tpb):
        i = g * tpb + t
        sid = sid_ref[i]
        L = l_ref[t * B:(t + 1) * B, :]
        V = v_ref[t * B:(t + 1) * B, :]
        lp = L & (LANE - 1)
        jprow = (L >> 7) & 7
        # sublane permute as 8 broadcast-select FMAs:
        # xplane[j] = x[pane][jp_j]. (First cut read rows one by one —
        # x_ref[p_j, ds(jp_j,1), :] + concatenate — ~55 ns/tile of
        # shuffles; an (8,8) one-hot MXU dot per tile kept ~45 ns/tile
        # of VPU->MXU->VPU latency in the chain.)
        xw = x_ref[pane_ref[i]]
        jsel = jprow[:, 0:1]
        terms = [(jsel == s).astype(jnp.float32) * xw[s:s + 1, :]
                 for s in range(B)]
        # balanced tree (3-deep) instead of an 8-deep serial chain
        while len(terms) > 1:
            terms = [a + b for a, b in zip(terms[::2], terms[1::2])]
        gx = jnp.take_along_axis(terms[0], lp, axis=1)
        o_ref[pl.ds(sid * B, B), :] = \
            o_ref[pl.ds(sid * B, B), :] + V * gx


@partial(jax.jit, static_argnums=(1, 2, 3, 4))
def _sellp_call(args, n_tiles, n_stripes, n_panes, tpb):
    from libhpc_tpu.ops.spmv_pallas import VMEM_LIMIT

    pane, sid, vflat, lidx, x3 = args
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles // tpb,),
        in_specs=[
            pl.BlockSpec((tpb * B, LANE), lambda g, *_: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tpb * B, LANE), lambda g, *_: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),      # x panes, resident
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        partial(_kernel, tpb=tpb),
        out_shape=jax.ShapeDtypeStruct((n_stripes * B, LANE), jnp.float32),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT),
        interpret=interpret_mode(),
    )(pane, sid, vflat, lidx, x3)


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
    out = _sellp_call((sp.pane, sp.sid, sp.vflat, sp.lidx, x3),
                      sp.n_tiles, sp.n_stripes, sp.n_panes, sp.tpb)
    y = out.reshape(sp.n_stripes, B, LANE).transpose(0, 2, 1).reshape(-1)
    return y[:m]
