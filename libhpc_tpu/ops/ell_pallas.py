"""Pallas scalar-ELL SpMV (SELL) — the lane-gather fast path for plain
ELL matrices (VERDICT r3 #6: ELL was a 0.086 Gnnz/s scalar-gather
negative control; this kernel makes the format first-class).

Layout: stripes of 1024 scalar rows arranged as (8, 128) slots with
row r = 1024*s + 8*l + j at sublane j, lane l — the SAME pane convention
as x (and as SBELL's output), so the kernel output chains into the next
matvec's x panes. One tile = ELL slice k of stripe s: an (8, 128) f32
value plane V[j, l] = vals[1024 s + 8 l + j, k] plus an (8, 128) i32
column plane; both stream HBM->VMEM through the grid pipeline.

The x lookup needs pane[j', l'] where BOTH coordinates are data-dependent,
but the only fast in-kernel gather is the same-shape 128-lane shuffle
(`take_along_axis(axis=1)`, PERF_NOTES round-2 census; sublane-axis
gathers don't lower). The kernel therefore runs W*8 STATIC sublane
rotations of the resident x panes (pltpu.roll is cheap at static shift)
and lane-gathers from each, predicating on (pane w, sublane j') — ~W*40
VPU ops per 1024 entries, ~12-25 Gnnz/s expected vs 963 G elem-ops/s,
two orders of magnitude over the XLA scalar-gather path.

Scope: every (stripe, slice)'s columns must fit a W-pane window (banded/
structured matrices; Poisson does). Wider scatter belongs to SBELL
(ops/spmv_pallas.py) — the builder raises with that advice. Reference
capability: lib/sparse formats are all first-class (SURVEY.md §2).
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
TPB = 16                 # tiles (slices) per grid step
W_DEFAULT = 3            # x panes a slice's columns may span


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SELL:
    """Striped scalar-ELL (see module docstring)."""

    vflat: jax.Array   # (n_tiles*B, LANE) f32 value planes
    cflat: jax.Array   # (n_tiles*B, LANE) i32 absolute columns
    pane: jax.Array    # (n_tiles,) i32 x-pane window base per tile
    sid: jax.Array     # (n_tiles,) i32 stripe id per tile
    shape: tuple = dataclasses.field(metadata=dict(static=True))
    n_stripes: int = dataclasses.field(metadata=dict(static=True))
    n_panes: int = dataclasses.field(metadata=dict(static=True))
    W: int = dataclasses.field(metadata=dict(static=True))

    @property
    def n_tiles(self) -> int:
        return self.vflat.shape[0] // B

    @property
    def hbm_bytes(self) -> int:
        """Streamed per SpMV: value+column planes + x + y."""
        return (self.vflat.size * 4 + self.cflat.size * 4
                + self.n_panes * PANE * 4 + self.n_stripes * PANE * 4)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SELLSplit:
    """Span-split SELL: single-pane tiles (near, W=1 — no pane-select
    passes) + multi-pane tiles (wide, W=max span). Two kernel calls, one
    shared resident x; outputs add in the stripe layout."""

    near: SELL
    wide: SELL
    shape: tuple = dataclasses.field(metadata=dict(static=True))

    @property
    def n_stripes(self) -> int:
        return self.near.n_stripes

    @property
    def n_panes(self) -> int:
        return self.near.n_panes

    @property
    def W(self) -> int:
        return self.wide.W

    @property
    def n_tiles(self) -> int:
        return self.near.n_tiles + self.wide.n_tiles

    @property
    def hbm_bytes(self) -> int:
        """Streamed per SpMV: both tile streams + x + y once."""
        return (self.near.vflat.size * 8 + self.wide.vflat.size * 8
                + self.n_panes * PANE * 4 + self.n_stripes * PANE * 4)


def sell_from_ell(ell, W: int = W_DEFAULT):
    """Host-side SELL build from an ELL container (sparse/ell.py).

    Zero-valued slots are treated as padding (their column is rewritten
    to the window base — the product is zero either way). All-zero
    slices are dropped, so ELL's k-rounding padding costs nothing."""
    vals = np.asarray(ell.vals, np.float32)
    cols = np.asarray(ell.cols, np.int64)
    m, n = ell.shape
    K = vals.shape[1]
    n_stripes = -(-m // PANE)
    n_panes = -(-n // PANE)
    mp = n_stripes * PANE
    if mp != m:
        vals = np.pad(vals, ((0, mp - m), (0, 0)))
        cols = np.pad(cols, ((0, mp - m), (0, 0)))

    groups = {}        # span -> (tiles_v, tiles_c, pane, sid)
    for s in range(n_stripes):
        for k in range(K):
            v = vals[s * PANE:(s + 1) * PANE, k]
            c = cols[s * PANE:(s + 1) * PANE, k]
            nz = v != 0.0
            if not nz.any():
                continue
            lo = int(c[nz].min()) >> 10
            hi = int(c[nz].max()) >> 10
            if hi - lo >= W:
                raise ValueError(
                    f"sell_from_ell: stripe {s} slice {k} spans panes "
                    f"{lo}..{hi} (> W={W}); this matrix is too "
                    "wide-scattered for the SELL window kernel — use the "
                    "SBELL path (ops/spmv_pallas.py) instead")
            c = np.where(nz, c, lo << 10)
            # span bucket: single-pane tiles (1) vs the rest (the wide
            # group's kernel runs max-span passes)
            key = 1 if hi == lo else 2
            g = groups.setdefault(key, ([], [], [], [], [1]))
            g[0].append(v.reshape(LANE, B).T)
            g[1].append(c.reshape(LANE, B).T.astype(np.int32))
            g[2].append(lo)
            g[3].append(s)
            g[4][0] = max(g[4][0], hi - lo + 1)

    def _pack(g, w):
        tiles_v, tiles_c, pane, sid = g
        n_tiles = max(len(tiles_v), 1)
        n_pad = -(-n_tiles // TPB) * TPB
        vflat = np.zeros((n_pad, B, LANE), np.float32)
        cflat = np.zeros((n_pad, B, LANE), np.int32)
        pane_a = np.zeros(n_pad, np.int32)
        sid_a = np.zeros(n_pad, np.int32)
        for t in range(len(tiles_v)):
            vflat[t] = tiles_v[t]
            cflat[t] = tiles_c[t]
            pane_a[t] = pane[t]
            sid_a[t] = sid[t]
        return SELL(vflat=jnp.asarray(vflat.reshape(n_pad * B, LANE)),
                    cflat=jnp.asarray(cflat.reshape(n_pad * B, LANE)),
                    pane=jnp.asarray(pane_a), sid=jnp.asarray(sid_a),
                    shape=(m, n), n_stripes=n_stripes, n_panes=n_panes,
                    W=w)

    near = groups.get(1)
    wide = groups.get(2)
    if near and wide and len(near[0]) >= TPB:
        # SPAN SPLIT (round 4): single-pane tiles skip the extra pane
        # passes entirely — on Poisson 3/5 of tiles are span-1, cutting
        # the gather rounds ~1.4x vs running every tile at max span
        return SELLSplit(near=_pack(near[:4], 1),
                         wide=_pack(wide[:4], wide[4][0]),
                         shape=(m, n))
    if near and wide:          # too few near tiles to pay a second call:
        merged = tuple(a + b for a, b in zip(near[:4], wide[:4]))
        return _pack(merged, wide[4][0])
    g = near or wide or ([], [], [], [], [1])
    return _pack(g[:4], g[4][0])


def sell_from_scipy(A, W: int = W_DEFAULT):
    from libhpc_tpu.sparse.ell import ELL

    return sell_from_ell(ELL.from_scipy(A), W=W)


def _kernel(pane_ref, sid_ref, v_ref, c_ref, x_ref, o_ref, *, W: int):
    g = pl.program_id(0)

    @pl.when(g == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    jrow = jax.lax.broadcasted_iota(jnp.int32, (B, LANE), 0)
    for t in range(TPB):
        p = pane_ref[g * TPB + t]
        sid = sid_ref[g * TPB + t]
        C = c_ref[t * B:(t + 1) * B, :]
        V = v_ref[t * B:(t + 1) * B, :]
        crel = C - (p << 10)             # in [0, W*1024) by construction
        lp = (crel >> 3) & (LANE - 1)    # lane of the target x entry
        jp = crel & 7                    # sublane of the target x entry
        pw = crel >> 10                  # window pane of the target
        gx = jnp.zeros((B, LANE), jnp.float32)
        for w in range(W):
            xw = x_ref[p + w]
            for dj in range(B):
                # rot[j, :] = xw[(j + dj) % 8, :] — static sublane roll
                rot = pltpu.roll(xw, (B - dj) % B, 0) if dj else xw
                gathered = jnp.take_along_axis(rot, lp, axis=1)
                sel = (pw == w) & (jp == ((jrow + dj) & 7))
                gx = jnp.where(sel, gathered, gx)
        pacc = V * gx
        o_ref[pl.ds(sid * B, B), :] = o_ref[pl.ds(sid * B, B), :] + pacc


@partial(jax.jit, static_argnums=(1, 2, 3, 4))
def _sell_call(args, n_tiles, n_stripes, n_panes, W):
    pane, sid, vflat, cflat, x3 = args
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
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
    # W-1 zero guard stripes ride at the end (same chaining convention as
    # SBELL: output pane layout IS the next x pane layout)
    from libhpc_tpu.ops.spmv_pallas import VMEM_LIMIT

    return pl.pallas_call(
        partial(_kernel, W=W),
        out_shape=jax.ShapeDtypeStruct(
            ((n_stripes + W - 1) * B, LANE), jnp.float32),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT),
        interpret=interpret_mode(),
    )(pane, sid, vflat, cflat, x3)


# resident x panes + output must fit the raised scoped-VMEM budget (same
# limit as SBELL; no chunked variant here — SBELL has one, and SELL
# matrices past ~90 MB of panes+output should use it)
VMEM_CAP = int(__import__("os").environ.get(
    "LIBHPC_SBELL_VMEM_CAP", str(96 * 1024 * 1024)))


def _guard_resident(n_panes, n_stripes, W):
    resident = (n_panes + W - 1 + n_stripes + W - 1) * PANE * 4
    if resident > VMEM_CAP:
        raise ValueError(
            f"sell_spmv: x panes + output need {resident} B of VMEM "
            f"(> {VMEM_CAP}); use the chunked SBELL path for matrices "
            "this large (ops/spmv_pallas.py)")


def _depane(out, n_stripes, m):
    y = out[:n_stripes * B].reshape(n_stripes, B, LANE) \
        .transpose(0, 2, 1).reshape(-1)
    return y[:m]


def sell_spmv(sp, x: jax.Array) -> jax.Array:
    """y = A @ x for SELL / SELLSplit A; x f32 (ncols,) -> f32 (nrows,)."""
    m, n = sp.shape
    if isinstance(sp, SELLSplit):
        nr, wd = sp.near, sp.wide
        _guard_resident(sp.n_panes, sp.n_stripes, wd.W)
        xpad = jnp.pad(x, (0, sp.n_panes * PANE - n))
        x3 = xpad.reshape(sp.n_panes, LANE, B).transpose(0, 2, 1)
        x3 = jnp.pad(x3, ((0, wd.W - 1), (0, 0), (0, 0)))
        o1 = _sell_call((nr.pane, nr.sid, nr.vflat, nr.cflat, x3),
                        nr.n_tiles, nr.n_stripes, nr.n_panes, 1)
        o2 = _sell_call((wd.pane, wd.sid, wd.vflat, wd.cflat, x3),
                        wd.n_tiles, wd.n_stripes, wd.n_panes, wd.W)
        ns = sp.n_stripes * B
        return _depane(o1[:ns] + o2[:ns], sp.n_stripes, m)
    _guard_resident(sp.n_panes, sp.n_stripes, sp.W)
    xpad = jnp.pad(x, (0, sp.n_panes * PANE - n))
    x3 = xpad.reshape(sp.n_panes, LANE, B).transpose(0, 2, 1)
    x3 = jnp.pad(x3, ((0, sp.W - 1), (0, 0), (0, 0)))
    out = _sell_call((sp.pane, sp.sid, sp.vflat, sp.cflat, x3),
                     sp.n_tiles, sp.n_stripes, sp.n_panes, sp.W)
    return _depane(out, sp.n_stripes, m)
