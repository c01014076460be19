"""Key-value Pallas merge-path sort (argsort / sort-by-key).

Same architecture as ops/sort_pallas.py (in-VMEM bitonic chunk sort +
merge-path levels + segmented decomposition) with a 32-bit payload carried
through every compare-exchange: the comparator decides on keys, and both
key and payload move together. This is the TPU replacement for the
reference radix pipeline's rank-stable (key, payload) scatter
(cuda_radix_scatter.cuh) — payloads ride the merge network instead of a
scatter.

NOT stable (bitonic networks aren't): equal keys keep an arbitrary payload
order. For a stable argsort use ops.sort.argsort_u32 (lax.sort).

Public:
  merge_sort_kv_u32(keys, vals) -> (sorted_keys, vals_permuted)
  merge_argsort_u32(keys)       -> (sorted_keys, order int32)
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from libhpc_tpu.ops._pallas_utils import cdiv, interpret_mode
from libhpc_tpu.ops.sort_pallas import (
    LANE, FLIP, LANE_XOR, PAIR_MIN_ROWS, POS_INF, DEFAULT_LOG2W,
    _flat_iota, _extract, _level_scalars, _pair_scalars, _decompose,
)

# kv chunk networks carry twice the live state; 2^16 chunks crash the
# compile helper (like the 2^17 scalar network) — cap at 2^15
DEFAULT_LOG2C = 15


def _exchange_kv_asc(k, v, upper, s: int):
    """ASCENDING compare-exchange at distance 2^s moving (key, payload)
    together; descending regions are NOT-conjugated by the callers (see
    sort_pallas._exchange_asc). Strict comparisons: equal keys never swap,
    so position i and its partner i^d always agree (a valid pairwise
    swap)."""
    d = 1 << s
    if d >= PAIR_MIN_ROWS * LANE:  # same knob as the scalar sort
        # vreg-aligned sublane distance: the XOR pairing is a static
        # row-block pairing (see sort_pallas._exchange_asc) — no rolls
        dr = d // LANE
        R = k.shape[0]
        kr = k.reshape(R // (2 * dr), 2, dr, LANE)
        vr = v.reshape(R // (2 * dr), 2, dr, LANE)
        sw = kr[:, 0] > kr[:, 1]  # strict: equal keys never swap
        klohi = jnp.stack([jnp.where(sw, kr[:, 1], kr[:, 0]),
                           jnp.where(sw, kr[:, 0], kr[:, 1])], axis=1)
        vlohi = jnp.stack([jnp.where(sw, vr[:, 1], vr[:, 0]),
                           jnp.where(sw, vr[:, 0], vr[:, 1])], axis=1)
        return klohi.reshape(R, LANE), vlohi.reshape(R, LANE)
    if d >= LANE:
        axis, shift = 0, d // LANE
    else:
        axis, shift = 1, d
    if axis == 1 and LANE_XOR:
        # partner i^d via one static lane permutation per operand (the
        # scalar sort's measured 36% win, sort_pallas._exchange_asc)
        lane = jax.lax.broadcasted_iota(jnp.int32, k.shape, 1)
        pk = jnp.take_along_axis(k, lane ^ d, axis=1)
        pv = jnp.take_along_axis(v, lane ^ d, axis=1)
        swap = (upper & (pk > k)) | (jnp.logical_not(upper) & (pk < k))
        return jnp.where(swap, pk, k), jnp.where(swap, pv, v)
    size = k.shape[axis]
    pk = jnp.where(upper, pltpu.roll(k, shift, axis),
                   pltpu.roll(k, size - shift, axis))
    pv = jnp.where(upper, pltpu.roll(v, shift, axis),
                   pltpu.roll(v, size - shift, axis))
    # boolean algebra, not where(): select on i1 vectors kills Mosaic
    swap = (upper & (pk > k)) | (jnp.logical_not(upper) & (pk < k))
    return jnp.where(swap, pk, k), jnp.where(swap, pv, v)


# ---------------------------------------------------------------------------
# chunk sort
# ---------------------------------------------------------------------------


def _chunk_kernel_kv(xk_ref, xv_ref, ok_ref, ov_ref, *, log2c: int,
                     alternate: bool, invert: bool, unflip: bool):
    """NOT-conjugated bitonic network (see sort_pallas._chunk_kernel):
    keys ride the per-group XOR domain, payloads move un-conjugated."""
    rows = xk_ref.shape[0]
    idx = _flat_iota(rows)
    if alternate:
        desc = ((pl.program_id(0) & 1) == 1) != invert
        dmask = jnp.where(desc, jnp.int32(-1), jnp.int32(0))
    else:
        dmask = jnp.int32(-1 if invert else 0)

    def gmask(k2):
        if k2 >= log2c:
            return jnp.int32(0)
        return -((idx >> k2) & 1)

    upper = [((idx >> s) & 1) != 0 for s in range(log2c)]
    k = xk_ref[:] ^ (gmask(1) ^ (FLIP ^ dmask))
    v = xv_ref[:]
    for k2 in range(1, log2c + 1):
        for s in range(k2 - 1, -1, -1):
            k, v = _exchange_kv_asc(k, v, upper[s], s)
        if k2 < log2c:
            k = k ^ (gmask(k2) ^ gmask(k2 + 1))
    ok_ref[:] = k ^ (dmask ^ FLIP if unflip else dmask)
    ov_ref[:] = v


def _chunk_sort_kv(xk, xv, pad_rows: int, total_rows: int, *, log2c: int,
                   alternate: bool, invert: bool, unflip: bool):
    P = xk.shape[0]
    C = 1 << log2c
    crows = C // LANE
    n_chunks = P // C
    outs = pl.pallas_call(
        partial(_chunk_kernel_kv, log2c=log2c, alternate=alternate,
                invert=invert, unflip=unflip),
        out_shape=(jax.ShapeDtypeStruct((total_rows, LANE), jnp.int32),
                   jax.ShapeDtypeStruct((total_rows, LANE), jnp.int32)),
        grid=(n_chunks,),
        in_specs=[pl.BlockSpec((crows, LANE), lambda c: (c, 0),
                               memory_space=pltpu.VMEM)] * 2,
        out_specs=(pl.BlockSpec((crows, LANE),
                                lambda c, pr=pad_rows // crows: (pr + c, 0),
                                memory_space=pltpu.VMEM),) * 2,
        interpret=interpret_mode(),
    )(xk.reshape(n_chunks * crows, LANE), xv.reshape(n_chunks * crows, LANE))
    return outs


# ---------------------------------------------------------------------------
# merge kernel (shared by level merges and pair merges)
# ---------------------------------------------------------------------------


def _merge_kernel_kv(rowA, dA, rowB, dB, kA, kB, dsc,
                     xk_A, xv_A, xk_B, xv_B, ok_ref, ov_ref,
                     sAk, sAv, sBk, sBv, semk, semv, *,
                     log2w: int, unflip: bool):
    """Merge windows of (A asc, B desc) key/payload pairs. xk_A/xk_B may be
    the same buffer (level merge) or different (pair merge)."""
    w = pl.program_id(0)
    nw = pl.num_programs(0)
    W = 1 << log2w
    wrows = W // LANE
    slot = w % 2

    def dmas(wi, sl):
        return (
            pltpu.make_async_copy(
                xk_A.at[pl.ds(rowA[wi], wrows + 16), :], sAk.at[sl],
                semk.at[sl, 0]),
            pltpu.make_async_copy(
                xv_A.at[pl.ds(rowA[wi], wrows + 16), :], sAv.at[sl],
                semv.at[sl, 0]),
            pltpu.make_async_copy(
                xk_B.at[pl.ds(rowB[wi], wrows + 16), :], sBk.at[sl],
                semk.at[sl, 1]),
            pltpu.make_async_copy(
                xv_B.at[pl.ds(rowB[wi], wrows + 16), :], sBv.at[sl],
                semv.at[sl, 1]),
        )

    @pl.when(w == 0)
    def _():
        for c in dmas(w, slot):
            c.start()

    @pl.when(w + 1 < nw)
    def _():
        for c in dmas(w + 1, 1 - slot):
            c.start()

    for c in dmas(w, slot):
        c.wait()

    desc = dsc[w] != 0
    dmask = jnp.where(desc, jnp.int32(-1), jnp.int32(0))
    idx = _flat_iota(wrows)

    ckA = _extract(sAk.at[slot], dA[w], wrows)
    cvA = _extract(sAv.at[slot], dA[w], wrows)
    ckB = _extract(sBk.at[slot], dB[w], wrows)
    cvB = _extract(sBv.at[slot], dB[w], wrows)
    # NOT-conjugated domain: fill is always +inf, the needed half is
    # always the min half, every cleanup stage is ascending-uniform
    # (see sort_pallas._merge_window)
    idx_eff = jnp.where(desc, W - 1 - idx, idx)
    maskA = idx_eff >= W - kA[w]
    maskB = idx_eff < kB[w]
    ckA = jnp.where(maskA, POS_INF, ckA ^ dmask)
    ckB = jnp.where(maskB, POS_INF, ckB ^ dmask)

    # kv halver: keep the min half, payloads follow the key decision
    # (ties keep A — any consistent choice is fine for pure selection)
    takeB = ckB < ckA
    k = jnp.where(takeB, ckB, ckA)
    v = jnp.where(takeB, cvB, cvA)
    upper = [((idx >> s) & 1) != 0 for s in range(log2w)]
    for s in range(log2w - 1, -1, -1):
        k, v = _exchange_kv_asc(k, v, upper[s], s)
    ok_ref[:] = k ^ (dmask ^ FLIP if unflip else dmask)
    ov_ref[:] = v


def _run_merge_kv(scalars, bufs, nw: int, PAD: int, total_rows: int,
                  log2w: int, unflip: bool):
    W = 1 << log2w
    wrows = W // LANE
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=7,
        grid=(nw,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 4,
        out_specs=(pl.BlockSpec(
            (wrows, LANE),
            lambda w, *refs, pw=PAD // W: (pw + w, 0),
            memory_space=pltpu.VMEM),) * 2,
        scratch_shapes=[
            pltpu.VMEM((2, wrows + 16, LANE), jnp.int32),
            pltpu.VMEM((2, wrows + 16, LANE), jnp.int32),
            pltpu.VMEM((2, wrows + 16, LANE), jnp.int32),
            pltpu.VMEM((2, wrows + 16, LANE), jnp.int32),
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    return pl.pallas_call(
        partial(_merge_kernel_kv, log2w=log2w, unflip=unflip),
        out_shape=(jax.ShapeDtypeStruct((total_rows, LANE), jnp.int32),
                   jax.ShapeDtypeStruct((total_rows, LANE), jnp.int32)),
        grid_spec=grid_spec,
        interpret=interpret_mode(),
    )(*scalars, *bufs)


# ---------------------------------------------------------------------------
# orchestration (mirrors sort_pallas, with payload buffers alongside)
# ---------------------------------------------------------------------------


def _sort_segment_kv(xk, xv, log2c: int, log2w: int, invert: bool,
                     unflip: bool):
    P = xk.shape[0]
    C = 1 << log2c
    W0 = 1 << log2w
    J = (P // C).bit_length() - 1
    PAD = max(W0, C)
    TAILPAD = PAD + 16 * LANE
    total_rows = (PAD + P + TAILPAD) // LANE

    bk, bv = _chunk_sort_kv(xk, xv, PAD // LANE, total_rows, log2c=log2c,
                            alternate=(J > 0), invert=(invert and J == 0),
                            unflip=(unflip and J == 0))
    for j in range(1, J + 1):
        log2r = log2c + j - 1
        lw = min(log2w, log2r)
        scalars = _level_scalars(bk, P, PAD, log2r, lw,
                                 invert=(invert and j == J))
        bk, bv = _run_merge_kv(scalars, (bk, bv, bk, bv), P // (1 << lw),
                               PAD, total_rows, lw,
                               unflip=(unflip and j == J))
    return bk, bv


@partial(jax.jit, static_argnames=("log2c", "log2w"))
def merge_sort_kv_u32(keys, vals, log2c: int = DEFAULT_LOG2C,
                      log2w: int = DEFAULT_LOG2W):
    """Sort (keys, vals) by key ascending. vals: any 32-bit dtype."""
    n = keys.shape[0]
    keys = keys.astype(jnp.uint32)
    vdtype = vals.dtype
    assert vals.shape == keys.shape and vals.dtype.itemsize == 4
    if n <= 1:
        return keys, vals
    xk = jax.lax.bitcast_convert_type(keys, jnp.int32)
    xv = jax.lax.bitcast_convert_type(vals, jnp.int32)

    C = 1 << log2c
    segs = _decompose(n, C)
    single = len(segs) == 1
    PAD = max(1 << log2w, C)

    bufs = []
    off = 0
    for i, s in enumerate(segs):
        take = min(s, n - off)
        sk = xk[off:off + take]
        sv = xv[off:off + take]
        if take < s:
            sk = jnp.concatenate([sk, jnp.full((s - take,), -1, jnp.int32)])
            sv = jnp.concatenate([sv, jnp.zeros((s - take,), jnp.int32)])
        invert = (not single) and (i == len(segs) - 1)
        bufs.append(_sort_segment_kv(sk, sv, log2c, log2w, invert=invert,
                                     unflip=single))
        off += take

    if single:
        bk, bv = bufs[0]
        ok = bk.reshape(-1)[PAD:PAD + n]
        ov = bv.reshape(-1)[PAD:PAD + n]
        return (jax.lax.bitcast_convert_type(ok, jnp.uint32),
                jax.lax.bitcast_convert_type(ov, vdtype))

    (ak, av), L_acc = bufs[-1], segs[-1]
    for i in range(len(segs) - 2, -1, -1):
        (bk, bv), LA = bufs[i], segs[i]
        last = i == 0
        total = LA + L_acc
        lw = min(log2w, (total & -total).bit_length() - 1)
        total_rows = (PAD + total + PAD + 16 * LANE) // LANE
        scalars = _pair_scalars(bk, ak, LA, L_acc, PAD, lw,
                                desc_out=not last)
        ak, av = _run_merge_kv(scalars, (bk, bv, ak, av), total // (1 << lw),
                               PAD, total_rows, lw, unflip=last)
        L_acc = total

    ok = ak.reshape(-1)[PAD:PAD + n]
    ov = av.reshape(-1)[PAD:PAD + n]
    return (jax.lax.bitcast_convert_type(ok, jnp.uint32),
            jax.lax.bitcast_convert_type(ov, vdtype))


@partial(jax.jit, static_argnames=("log2c", "log2w"))
def merge_argsort_u32(keys, log2c: int = DEFAULT_LOG2C,
                      log2w: int = DEFAULT_LOG2W):
    """(sorted, order): keys[order] == sorted. Not stable."""
    n = keys.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    return merge_sort_kv_u32(keys, idx, log2c=log2c, log2w=log2w)