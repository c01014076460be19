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


def sell_from_ell(ell, W: int = W_DEFAULT) -> SELL:
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

    tiles_v, tiles_c, pane, sid = [], [], [], []
    w_used = 1          # actual max pane span — the kernel's W (the
    for s in range(n_stripes):  # per-pane pass count) shrinks to it
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
            w_used = max(w_used, hi - lo + 1)
            c = np.where(nz, c, lo << 10)
            tiles_v.append(v.reshape(LANE, B).T)
            tiles_c.append(c.reshape(LANE, B).T.astype(np.int32))
            pane.append(lo)
            sid.append(s)
    W = w_used

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
                shape=(m, n), n_stripes=n_stripes, n_panes=n_panes, W=W)


def sell_from_scipy(A, W: int = W_DEFAULT) -> SELL:
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
    return pl.pallas_call(
        partial(_kernel, W=W),
        out_shape=jax.ShapeDtypeStruct(
            ((n_stripes + W - 1) * B, LANE), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret_mode(),
    )(pane, sid, vflat, cflat, x3)


# resident x panes + output must fit the scoped-VMEM budget (no chunked
# variant here — SBELL has one; SELL matrices that big should use it)
VMEM_CAP = 14 * 1024 * 1024


def sell_spmv(sp: SELL, x: jax.Array) -> jax.Array:
    """y = A @ x for SELL A; x f32 (ncols,) -> f32 (nrows,)."""
    m, n = sp.shape
    resident = (sp.n_panes + sp.W - 1 + sp.n_stripes + sp.W - 1) \
        * PANE * 4
    if resident > VMEM_CAP:
        raise ValueError(
            f"sell_spmv: x panes + output need {resident} B of VMEM "
            f"(> {VMEM_CAP}); use the chunked SBELL path for matrices "
            "this large (ops/spmv_pallas.py)")
    xpad = jnp.pad(x, (0, sp.n_panes * PANE - n))
    x3 = xpad.reshape(sp.n_panes, LANE, B).transpose(0, 2, 1)
    x3 = jnp.pad(x3, ((0, sp.W - 1), (0, 0), (0, 0)))
    out = _sell_call((sp.pane, sp.sid, sp.vflat, sp.cflat, x3),
                     sp.n_tiles, sp.n_stripes, sp.n_panes, sp.W)
    y = out[:sp.n_stripes * B].reshape(sp.n_stripes, B, LANE) \
        .transpose(0, 2, 1).reshape(-1)
    return y[:m]
