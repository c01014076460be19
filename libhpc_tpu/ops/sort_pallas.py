"""Pallas merge-path sort — the TPU-native large-array sort fast path.

The reference's flagship is a 4-round GPU radix sort whose hot kernel is a
rank-stable scatter (lib/gpu/radix_gpu, SURVEY.md §3.1). TPU has no fast
scatter, so the speed-of-light design is different (measured on v5e,
scripts/exp_sort.py):

  * XLA `lax.sort` (bitonic over HBM)            ~0.65 G elem/s @ 8M
  * batched per-chunk `lax.sort`                 ~1.3  G elem/s
  * Pallas in-VMEM bitonic chunk sort (2^14)     ~2.3  G elem/s
  * one streaming compare-exchange pass           runs at HBM speed

so this module implements:

  phase 1  chunk sort   — full bitonic network per 2^14-element chunk,
            entirely in VMEM, vectorized compare-exchange via pltpu.roll
            (lane axis) / sublane roll; the descendant of the reference's
            per-block local sort (cuda_radix_scatter.cuh in-tile ranks).
  phase 2  merge levels — one HBM pass per doubling: each output window's
            sources are located by a *merge-path* binary search (XLA,
            vectorized over windows), then a Pallas kernel DMA-loads the two
            candidate windows, applies the bitonic halver (elementwise
            min/max of an ascending and a descending window), and cleans up
            with log2(W) in-VMEM stages. This is the TPU analog of the
            reference's hierarchical multi-pass structure
            (cuda_hierarchical_exclusive_scan_localT_1024.cuh): log-depth
            tree, one streaming pass per level.

Key trick: runs alternate ascending/descending by index (Batcher's
alternation), so concat(A_window_asc, B_window_desc) is bitonic *by
construction* — no reversals anywhere (Mosaic has no `rev` lowering).

u32 keys are order-mapped to int32 by flipping the sign bit on entry and
exit (XOR 0x80000000), so all comparisons run as native int32.

Sizes: any n. Internally pads to C*2^J with 0xFFFFFFFF; compute waste is
bounded by 2x for adversarial n (documented; the bench sizes are powers of
two like the reference's 100M/500M... which are not powers of two — fine:
134M/537M padded).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from libhpc_tpu.ops._pallas_utils import cdiv, interpret_mode

LANE = 128
# smallest row distance handled by static block pairing (vreg-aligned at
# 8; env knob for the sub-vreg experiment, scripts/exp_subvreg.py)
PAIR_MIN_ROWS = int(__import__("os").environ.get(
    "LIBHPC_SORT_PAIR_MIN_ROWS", "8"))
# lane-axis exchange via one static XOR lane-shuffle (take_along_axis)
# instead of two rolls + select. Measured @500M: 380 ms vs 516 (1.315 vs
# 0.969 G elem/s) — the static lane permutation is far cheaper than two
# dynamic rolls, not just one op fewer. Default ON (exp_sort_lanexor.py).
LANE_XOR = __import__("os").environ.get(
    "LIBHPC_SORT_LANE_XOR", "1") == "1"
FLIP = np.int32(-(2**31))      # sign-bit flip: u32 order <-> i32 order
POS_INF = np.int32(2**31 - 1)  # +inf in flipped domain (= u32 0xFFFFFFFF)
NEG_INF = np.int32(-(2**31))

DEFAULT_LOG2C = 16   # chunk elements; v5e sweep optimum (2^17 network no
DEFAULT_LOG2W = 17   # longer compiles; 2^16/2^17 beat 2^14/2^15 by ~35%)


# ---------------------------------------------------------------------------
# shared compare-exchange stage (chunk network + merge cleanup)
# ---------------------------------------------------------------------------


def _exchange_asc(w, upper, s: int):
    """One ASCENDING compare-exchange at distance d=2^s on an (R, 128)
    int32 block: lower partner keeps min, upper keeps max.

    This is the only exchange in the sort: descending regions are handled
    by XOR-conjugation (bitwise NOT is order-reversing on int32, so sorting
    ~v ascending == sorting v descending), which removes every per-element
    direction select the round-1 kernels paid per stage. Partner of element
    i is i XOR d, reached by two circular rolls (the wrap-around values are
    always discarded by the selects) — the TPU analog of the reference's
    __shfl_xor-style warp exchanges.

    For vreg-aligned sublane distances (d >= 8 rows) the XOR pairing is a
    static row-block pairing: reshape to (groups, 2, d_rows, 128) — a pure
    reinterpretation of the row-major vreg order, no relayout — and keep
    min in the low block, max in the high. 2 VPU ops/elem instead of 5
    (roll+roll+min+max+select); these stages are 45/136 of the chunk
    network and 10/18 of every merge-level cleanup."""
    d = 1 << s
    if d >= PAIR_MIN_ROWS * LANE:
        dr = d // LANE
        R = w.shape[0]
        wr = w.reshape(R // (2 * dr), 2, dr, LANE)
        lohi = jnp.stack([jnp.minimum(wr[:, 0], wr[:, 1]),
                          jnp.maximum(wr[:, 0], wr[:, 1])], axis=1)
        return lohi.reshape(R, LANE)
    if d >= LANE:
        axis, shift = 0, d // LANE
    else:
        axis, shift = 1, d
    if axis == 1 and LANE_XOR:
        # partner i^d reached directly by a static lane permutation —
        # Mosaic lowers the constant-index take_along_axis as one
        # dynamic-lane-shuffle op vs the two rolls below
        lane = jax.lax.broadcasted_iota(jnp.int32, w.shape, 1)
        p = jnp.take_along_axis(w, lane ^ d, axis=1)
        return jnp.where(upper, jnp.maximum(w, p), jnp.minimum(w, p))
    size = w.shape[axis]
    fwd = pltpu.roll(w, size - shift, axis)  # w[i + d] at position i
    bwd = pltpu.roll(w, shift, axis)         # w[i - d] at position i
    return jnp.where(upper, jnp.maximum(w, bwd), jnp.minimum(w, fwd))


def _flat_iota(rows: int):
    return (jax.lax.broadcasted_iota(jnp.int32, (rows, LANE), 0) * LANE
            + jax.lax.broadcasted_iota(jnp.int32, (rows, LANE), 1))


# ---------------------------------------------------------------------------
# phase 1: in-VMEM bitonic chunk sort (alternating directions)
# ---------------------------------------------------------------------------


def _chunk_kernel(x_ref, o_ref, *, log2c: int, alternate: bool,
                  invert: bool, unflip: bool):
    """Bitonic network, all stages ascending in a per-group XOR domain.

    Group k2 conjugates the blocks whose index bit k2 is set (they must
    sort descending) with bitwise NOT; a whole-chunk descending result
    (alternate/invert) is one more NOT folded into the entry/exit masks.
    Group-to-group transitions collapse to a single XOR with the mask
    delta, so the per-stage cost is exactly roll+roll+min+max+select plus
    one bit-test — no take_min vector logic anywhere."""
    rows = x_ref.shape[0]
    idx = _flat_iota(rows)
    if alternate:
        # odd chunks sort descending (inverted when the whole segment is
        # destined to be a descending merge operand)
        desc = ((pl.program_id(0) & 1) == 1) != invert
        dmask = jnp.where(desc, jnp.int32(-1), jnp.int32(0))
    else:
        dmask = jnp.int32(-1 if invert else 0)

    def gmask(k2):
        # -1 where the 2^k2-block sorts descending inside the network
        if k2 >= log2c:  # top group: idx >> log2c == 0, pure ascending
            return jnp.int32(0)
        return -((idx >> k2) & 1)

    upper = [((idx >> s) & 1) != 0 for s in range(log2c)]
    w = x_ref[:] ^ (gmask(1) ^ (FLIP ^ dmask))
    for k2 in range(1, log2c + 1):
        for s in range(k2 - 1, -1, -1):
            w = _exchange_asc(w, upper[s], s)
        if k2 < log2c:
            w = w ^ (gmask(k2) ^ gmask(k2 + 1))
    out_mask = dmask ^ FLIP if unflip else dmask
    o_ref[:] = w ^ out_mask


def _chunk_sort(x_i32, pad_rows: int, total_rows: int, *, log2c: int,
                alternate: bool, invert: bool, unflip: bool):
    """Sort each chunk; write into a padded work buffer at row `pad_rows`.

    Input: (P,) int32 (u32 bit pattern). Output: (total_rows, 128) int32 in
    flipped order domain (unless unflip), chunks alternating asc/desc."""
    P = x_i32.shape[0]
    C = 1 << log2c
    crows = C // LANE
    n_chunks = P // C
    out = pl.pallas_call(
        partial(_chunk_kernel, log2c=log2c, alternate=alternate,
                invert=invert, unflip=unflip),
        out_shape=jax.ShapeDtypeStruct((total_rows, LANE), jnp.int32),
        grid=(n_chunks,),
        in_specs=[pl.BlockSpec((crows, LANE), lambda c: (c, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((crows, LANE),
                               lambda c, pr=pad_rows // crows: (pr + c, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret_mode(),
    )(x_i32.reshape(n_chunks * crows, LANE))
    return out


# ---------------------------------------------------------------------------
# phase 2: merge-path search (XLA) + merge kernel (Pallas)
# ---------------------------------------------------------------------------


def _level_scalars(buf, P: int, PAD: int, log2r: int, log2w: int,
                   invert: bool):
    """Merge-path split for every output window of one level (vectorized
    binary search; the descendant of the reference's global-base search
    structure, but over values instead of bins).

    Runs of R=2^log2r alternate asc/desc; output runs of 2R likewise.
    Returns per-window scalars for the kernel: A/B window start rows +
    in-row remainders, invalid-candidate counts, desc flag."""
    R = np.int32(1 << log2r)
    W = np.int32(1 << log2w)
    nw = P // int(W)
    flat = buf.reshape(-1)

    w = jnp.arange(nw, dtype=jnp.int32)
    out_pos = w * W
    pair = out_pos >> (log2r + 1)
    base = pair << (log2r + 1)
    o = out_pos - base
    desc = ((pair & 1) == 1) != invert

    lo = jnp.maximum(0, o - R)
    hi = jnp.minimum(o, R)

    def body(_, lh):
        lo, hi = lh
        mid = (lo + hi) >> 1
        kb = o - 1 - mid
        kbc = jnp.clip(kb, 0, R - 1)
        # asc: A[mid] <= B_rank(kb)    (B stored descending)
        # desc: A_top(mid) >= B_top(kb)
        ia = jnp.where(desc, base + R - 1 - mid, base + mid)
        ib = jnp.where(desc, base + R + kbc, base + 2 * R - 1 - kbc)
        va = flat[PAD + ia]
        vb = flat[PAD + ib]
        pred = (kb >= 0) & jnp.where(desc, va >= vb, va <= vb)
        return (jnp.where(pred, mid + 1, lo), jnp.where(pred, hi, mid))

    lo, hi = jax.lax.fori_loop(0, log2r + 1, body, (lo, hi))
    split = lo
    rho = o - split

    sA = jnp.where(desc, base + R - split - W, base + split)
    sB = jnp.where(desc, base + R + rho, base + 2 * R - rho - W)
    kA = jnp.maximum(0, split + W - R)   # invalid A candidates
    kB = jnp.maximum(0, rho + W - R)     # invalid B candidates
    sA = sA + PAD
    sB = sB + PAD
    # DMA row starts must be (8,128)-tile aligned (unaligned sublane DMA
    # faults the TPU); the in-tile remainder delta < 1024 is handled by the
    # kernel's dynamic-slice + lane-roll extraction.
    rowA = (sA // (8 * LANE)) * 8
    rowB = (sB // (8 * LANE)) * 8
    return (rowA, sA - rowA * LANE, rowB, sB - rowB * LANE,
            kA, kB, desc.astype(jnp.int32))


def _extract(scr_ref, delta, wrows: int):
    """Read the W-element window starting at flat offset delta (< 1024) of a
    (wrows+16, 128) VMEM scratch: dynamic row slice (sublane offset) + one
    dynamic lane roll + row blend."""
    q = delta // LANE
    rem = delta % LANE
    val = scr_ref[pl.ds(q, wrows + 8), :]
    u = pltpu.roll(val, (LANE - rem) % LANE, 1)
    bot = pltpu.roll(u, wrows + 8 - 1, 0)  # u shifted up one row
    lane = jax.lax.broadcasted_iota(jnp.int32, (wrows + 8, LANE), 1)
    return jnp.where(lane < LANE - rem, u, bot)[:wrows, :]


def _merge_window(candA, candB, desc_i32, kA, kB, *, log2w: int,
                  unflip: bool):
    """Bitonic merge of one W-window in the NOT-conjugated domain.

    candA/candB are the raw stored candidate windows (A runs stored
    ascending, B descending). XOR-ing both with dmask (-1 for descending
    output windows) makes the needed half always the MIN half and every
    cleanup stage ascending-uniform — the per-stage direction selects and
    the hi/lo halver pair of the round-1 kernel disappear."""
    W = 1 << log2w
    wrows = W // LANE
    idx = _flat_iota(wrows)
    desc = desc_i32 != 0
    dmask = jnp.where(desc, jnp.int32(-1), jnp.int32(0))

    # invalid-candidate masking: positions mirror for descending windows;
    # in the conjugated domain the fill is always +inf
    idx_eff = jnp.where(desc, W - 1 - idx, idx)
    maskA = idx_eff >= W - kA
    maskB = idx_eff < kB
    candA = jnp.where(maskA, POS_INF, candA ^ dmask)
    candB = jnp.where(maskB, POS_INF, candB ^ dmask)

    # bitonic halver: concat(candA, candB) is bitonic (peak or valley);
    # the W survivors are exactly the elementwise minima
    w = jnp.minimum(candA, candB)

    upper = [((idx >> s) & 1) != 0 for s in range(log2w)]
    for s in range(log2w - 1, -1, -1):
        w = _exchange_asc(w, upper[s], s)
    return w ^ (dmask ^ FLIP if unflip else dmask)


def _merge_kernel(rowA, dA, rowB, dB, kA, kB, dsc,
                  x_any, o_ref, scrA, scrB, semA, semB, *,
                  log2w: int, unflip: bool):
    w = pl.program_id(0)
    nw = pl.num_programs(0)
    W = 1 << log2w
    wrows = W // LANE
    slot = w % 2

    def dma(wi, sl):
        return (
            pltpu.make_async_copy(
                x_any.at[pl.ds(rowA[wi], wrows + 16), :],
                scrA.at[sl], semA.at[sl]),
            pltpu.make_async_copy(
                x_any.at[pl.ds(rowB[wi], wrows + 16), :],
                scrB.at[sl], semB.at[sl]),
        )

    # double-buffered window reads: prefetch w+1 while computing w
    @pl.when(w == 0)
    def _():
        a, b = dma(w, slot)
        a.start()
        b.start()

    @pl.when(w + 1 < nw)
    def _():
        a, b = dma(w + 1, 1 - slot)
        a.start()
        b.start()

    cpA, cpB = dma(w, slot)
    cpA.wait()
    cpB.wait()

    candA = _extract(scrA.at[slot], dA[w], wrows)
    candB = _extract(scrB.at[slot], dB[w], wrows)
    o_ref[:] = _merge_window(candA, candB, dsc[w], kA[w], kB[w],
                             log2w=log2w, unflip=unflip)


def _merge_level(buf, P: int, PAD: int, total_rows: int, log2r: int,
                 log2w: int, invert: bool, unflip: bool):
    scalars = _level_scalars(buf, P, PAD, log2r, log2w, invert)
    W = 1 << log2w
    wrows = W // LANE
    nw = P // W

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=7,
        grid=(nw,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (wrows, LANE),
            # scalar-prefetch refs ride along as trailing index_map args
            lambda w, *refs, pw=PAD // W: (pw + w, 0),
            memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, wrows + 16, LANE), jnp.int32),
            pltpu.VMEM((2, wrows + 16, LANE), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        partial(_merge_kernel, log2w=log2w, unflip=unflip),
        out_shape=jax.ShapeDtypeStruct((total_rows, LANE), jnp.int32),
        grid_spec=grid_spec,
        interpret=interpret_mode(),
    )(*scalars, buf)


# ---------------------------------------------------------------------------
# unequal-pair merge (segment fold; also the public merge primitive)
# ---------------------------------------------------------------------------


def _pair_scalars(bufA, bufB, LA: int, LB: int, PAD: int, log2w: int,
                  desc_out: bool):
    """Merge-path splits for one merge of A (ascending, length LA) with B
    (descending storage, length LB) — the unequal-run generalization of
    _level_scalars. Output direction desc_out (uniform for the call)."""
    W = np.int32(1 << log2w)
    nw = (LA + LB) // int(W)
    fA = bufA.reshape(-1)
    fB = bufB.reshape(-1)

    o = jnp.arange(nw, dtype=jnp.int32) * W
    lo = jnp.maximum(0, o - LB)
    hi = jnp.minimum(o, LA)

    def body(_, lh):
        lo, hi = lh
        mid = (lo + hi) >> 1
        kb = o - 1 - mid
        kbc = jnp.clip(kb, 0, LB - 1)
        if desc_out:
            # beta = #A among top-o: A_top(mid) >= B_top(kb)
            va = fA[PAD + LA - 1 - mid]
            vb = fB[PAD + kbc]
            pred = (kb >= 0) & (va >= vb)
        else:
            # alpha = #A among o smallest: A[mid] <= B_rank(kb)
            va = fA[PAD + mid]
            vb = fB[PAD + LB - 1 - kbc]
            pred = (kb >= 0) & (va <= vb)
        return (jnp.where(pred, mid + 1, lo), jnp.where(pred, hi, mid))

    iters = min(LA, LB).bit_length() + 1
    lo, hi = jax.lax.fori_loop(0, iters, body, (lo, hi))
    split = lo
    rho = o - split
    if desc_out:
        sA = LA - split - W
        sB = rho
    else:
        sA = split
        sB = LB - rho - W
    kA = jnp.maximum(0, split + W - LA)
    kB = jnp.maximum(0, rho + W - LB)
    sA = sA + PAD
    sB = sB + PAD
    rowA = (sA // (8 * LANE)) * 8
    rowB = (sB // (8 * LANE)) * 8
    dsc = jnp.full((nw,), int(desc_out), jnp.int32)
    return (rowA, sA - rowA * LANE, rowB, sB - rowB * LANE, kA, kB, dsc)


def _pair_merge_kernel(rowA, dA, rowB, dB, kA, kB, dsc,
                       xA_any, xB_any, o_ref, scrA, scrB, semA, semB, *,
                       log2w: int, unflip: bool):
    w = pl.program_id(0)
    nw = pl.num_programs(0)
    W = 1 << log2w
    wrows = W // LANE
    slot = w % 2

    def dma(wi, sl):
        return (
            pltpu.make_async_copy(
                xA_any.at[pl.ds(rowA[wi], wrows + 16), :],
                scrA.at[sl], semA.at[sl]),
            pltpu.make_async_copy(
                xB_any.at[pl.ds(rowB[wi], wrows + 16), :],
                scrB.at[sl], semB.at[sl]),
        )

    @pl.when(w == 0)
    def _():
        a, b = dma(w, slot)
        a.start()
        b.start()

    @pl.when(w + 1 < nw)
    def _():
        a, b = dma(w + 1, 1 - slot)
        a.start()
        b.start()

    cpA, cpB = dma(w, slot)
    cpA.wait()
    cpB.wait()

    candA = _extract(scrA.at[slot], dA[w], wrows)
    candB = _extract(scrB.at[slot], dB[w], wrows)
    o_ref[:] = _merge_window(candA, candB, dsc[w], kA[w], kB[w],
                             log2w=log2w, unflip=unflip)


def _merge_pair(bufA, bufB, LA: int, LB: int, PAD: int, log2w: int,
                desc_out: bool, unflip: bool):
    """Merge two sorted segments (A asc, B desc-stored) into a fresh padded
    buffer holding LA+LB sorted elements at [PAD, PAD+LA+LB)."""
    scalars = _pair_scalars(bufA, bufB, LA, LB, PAD, log2w, desc_out)
    W = 1 << log2w
    wrows = W // LANE
    nw = (LA + LB) // W
    total_rows = (PAD + LA + LB + PAD + 16 * LANE) // LANE

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=7,
        grid=(nw,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (wrows, LANE),
            lambda w, *refs, pw=PAD // W: (pw + w, 0),
            memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, wrows + 16, LANE), jnp.int32),
            pltpu.VMEM((2, wrows + 16, LANE), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        partial(_pair_merge_kernel, log2w=log2w, unflip=unflip),
        out_shape=jax.ShapeDtypeStruct((total_rows, LANE), jnp.int32),
        grid_spec=grid_spec,
        interpret=interpret_mode(),
    )(*scalars, bufA, bufB)


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------


def _sort_segment(xi, log2c: int, log2w: int, invert: bool, unflip: bool):
    """Sort a power-of-two-chunk segment. xi: (P,) raw-bit int32 with
    P = C * 2^J. Returns the padded work buffer, data (flipped domain unless
    unflip) at [PAD, PAD+P), ascending (or descending when invert)."""
    P = xi.shape[0]
    C = 1 << log2c
    W0 = 1 << log2w
    J = (P // C).bit_length() - 1

    PAD = max(W0, C)
    TAILPAD = PAD + 16 * LANE  # covers the widest (wrows+16)-row DMA read
    total_rows = (PAD + P + TAILPAD) // LANE

    # invert applies ONLY to the final level (or the lone chunk): interior
    # runs must keep the strict (asc, desc) pair alternation either way
    buf = _chunk_sort(xi, PAD // LANE, total_rows, log2c=log2c,
                      alternate=(J > 0), invert=(invert and J == 0),
                      unflip=(unflip and J == 0))
    for j in range(1, J + 1):
        log2r = log2c + j - 1
        lw = min(log2w, log2r)  # window never larger than a run
        buf = _merge_level(buf, P, PAD, total_rows, log2r, lw,
                           invert=(invert and j == J),
                           unflip=(unflip and j == J))
    return buf, PAD


def _decompose(n: int, C: int, max_segs: int = 3):
    """Split n into <= max_segs power-of-two segment sizes (each >= C),
    greedily by leading bits; the final segment pads the remainder up.
    Bounds total padding waste by ~12.5% (vs 2x for a single 2^k pad)."""
    if n <= C:
        return [C]
    segs = []
    rem = n
    while rem > 0:
        if len(segs) == max_segs - 1:
            segs.append(max(C, 1 << (rem - 1).bit_length()))
            break
        s = max(C, 1 << (rem.bit_length() - 1))
        segs.append(s)
        rem -= min(s, rem)
    # merging needs distinct fold steps; collapse equal tail segments that
    # a single power-of-two pad would cover anyway
    total = sum(segs)
    single = max(C, 1 << (n - 1).bit_length())
    if total >= single:
        return [single]
    return segs


@partial(jax.jit, static_argnames=("log2c", "log2w"))
def merge_sort_u32(x, log2c: int = DEFAULT_LOG2C,
                   log2w: int = DEFAULT_LOG2W):
    """Sort uint32 ascending — Pallas chunk-sort + merge-path levels.

    2-3x faster than `lax.sort` at >=1M elements on v5e. Arbitrary n: the
    input is decomposed into <=3 power-of-two segments (padding waste
    <=~12.5%), each sorted by the chunk+level pipeline, then folded with
    unequal-pair merge-path merges. log2c/log2w are tuning knobs (tests
    shrink them to exercise multi-level merges at small sizes).
    """
    n = x.shape[0]
    x = x.astype(jnp.uint32)
    if n <= 1:
        return x
    xi = jax.lax.bitcast_convert_type(x, jnp.int32)

    C = 1 << log2c
    segs = _decompose(n, C)
    single = len(segs) == 1

    # slice + pad each segment (raw-domain u32 max = int32 -1 -> +inf)
    bufs = []
    off = 0
    for i, s in enumerate(segs):
        take = min(s, n - off)
        seg = xi[off:off + take]
        if take < s:
            seg = jnp.concatenate([seg, jnp.full((s - take,), -1, jnp.int32)])
        # the last segment of a multi-segment sort is the first descending
        # merge operand; intermediate fold outputs stay descending too
        invert = (not single) and (i == len(segs) - 1)
        buf, _ = _sort_segment(seg, log2c, log2w, invert=invert,
                               unflip=single)
        bufs.append(buf)
        off += take

    PAD = max(1 << log2w, C)  # uniform across all segment buffers
    if single:
        buf = bufs[0]
        out = buf.reshape(-1)[PAD:PAD + n]
        return jax.lax.bitcast_convert_type(out, jnp.uint32)

    # fold right-to-left: accumulated merge stays the descending B operand
    acc, L_acc = bufs[-1], segs[-1]
    for i in range(len(segs) - 2, -1, -1):
        ba, LA = bufs[i], segs[i]
        last = i == 0
        total = LA + L_acc
        # window must divide the merged length (and never exceed PAD)
        lw = min(log2w, (total & -total).bit_length() - 1)
        acc = _merge_pair(ba, acc, LA, L_acc, PAD, lw,
                          desc_out=not last, unflip=last)
        L_acc = total

    out = acc.reshape(-1)[PAD:PAD + n]
    return jax.lax.bitcast_convert_type(out, jnp.uint32)
