#!/usr/bin/env python
"""SBELL v4 near-kernel cycle-budget attribution (VERDICT r2 #1).

Where do the missing ~44% of the own-bytes roofline go? Ablation ladder
over the near kernel, each variant timed with the in-program harness:

  full         sbell_spmv end-to-end (near + far + reshapes)
  near         near kernel + y reshape, far path skipped
  raw          bare pallas_call (no x prep, no y reshape)
  nogather     x lookup replaced by a direct pane read (no take_along_axis,
               no selects) — isolates the two-pass lane-gather cost
  nofma        products replaced by a single vreg accumulate — isolates the
               8-term broadcast-FMA chain
  staticstore  output accumulate at a static offset — isolates the
               dynamic-sublane-offset read-modify-write
  dmafloor     kernel only sums the streamed tile into the output — the
               pure DMA + loop-overhead floor
  TPB sweep    tiles per grid step 4/8/16/32 — per-grid-step fixed cost

Run: python scripts/exp_sbell_attrib.py [cant|pwtk] [tpb]
"""

import os
import sys
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from libhpc_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from libhpc_tpu.bench import matrices, harness  # noqa: E402
from libhpc_tpu.sparse.sbell import (B, LANE, PANE_COLS, SBELL,  # noqa: E402
                                     VROWS, W_PANES)
from libhpc_tpu.ops.spmv_pallas import sbell_spmv  # noqa: E402
from libhpc_tpu.ops._pallas_utils import interpret_mode  # noqa: E402


def make_kernel(tpb, gather=True, fma=True, dynstore=True):
    def kernel(pane_ref, sid_ref, v_ref, m_ref, x_ref, o_ref):
        g = pl.program_id(0)

        @pl.when(g == 0)
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)

        for t in range(tpb):
            base = t * VROWS
            col = m_ref[t:t + 1, :]
            p = pane_ref[g * tpb + t]
            sid = sid_ref[g * tpb + t]

            if gather:
                idx = jnp.broadcast_to(col & (LANE - 1), (B, LANE))
                gx = jnp.take_along_axis(x_ref[p], idx, axis=1)
                for w in range(1, W_PANES):
                    sel = jnp.broadcast_to((col >> 7) == w, (B, LANE))
                    gw = jnp.take_along_axis(x_ref[p + w], idx, axis=1)
                    gx = jnp.where(sel, gw, gx)
            else:
                gx = x_ref[p] + col.astype(jnp.float32)  # keep col live

            if fma:
                pacc = v_ref[base:base + B, :] * gx[0:1, :]
                for j in range(1, B):
                    pacc = pacc + v_ref[base + B * j:base + B * (j + 1), :] \
                        * gx[j:j + 1, :]
            else:
                pacc = v_ref[base:base + B, :] + gx

            if dynstore:
                o_ref[pl.ds(sid * B, B), :] = \
                    o_ref[pl.ds(sid * B, B), :] + pacc
            else:
                o_ref[0:B, :] = o_ref[0:B, :] + pacc + \
                    jnp.float32(0) * sid.astype(jnp.float32)
    return kernel


def make_dmafloor_kernel(tpb):
    """Consume every streamed vreg with one add chain; no gather/FMA."""
    def kernel(pane_ref, sid_ref, v_ref, m_ref, x_ref, o_ref):
        g = pl.program_id(0)

        @pl.when(g == 0)
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)

        acc = m_ref[0:B, :].astype(jnp.float32)
        for t in range(tpb):
            base = t * VROWS
            for j in range(B):
                acc = acc + v_ref[base + B * j:base + B * (j + 1), :]
        o_ref[0:B, :] = o_ref[0:B, :] + acc
    return kernel


def build_call(kernel, tpb, n_tiles, n_stripes):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles // tpb,),
        in_specs=[
            pl.BlockSpec((tpb * VROWS, LANE), lambda g, *_: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tpb, LANE), lambda g, *_: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_stripes * B, LANE), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret_mode(),
    )

    @jax.jit
    def run(pane, sid, vflat, meta, x3):
        return call(pane, sid, vflat, meta, x3)
    return run


def pad_to_tpb(sb, tpb):
    nt = sb.n_tiles
    ntp = -(-nt // tpb) * tpb
    if ntp == nt:
        return sb.pane, sb.sid, sb.vflat, sb.meta, nt
    pad = ntp - nt
    vflat = jnp.concatenate(
        [sb.vflat, jnp.zeros((pad * VROWS, LANE), jnp.float32)])
    meta = jnp.concatenate([sb.meta, jnp.zeros((pad, LANE), jnp.int32)])
    pane = jnp.concatenate([sb.pane, jnp.zeros((pad,), jnp.int32)])
    sid = jnp.concatenate([sb.sid, jnp.zeros((pad,), jnp.int32)])
    return pane, sid, vflat, meta, ntp


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "cant"
    print("devices:", jax.devices())
    hbm = harness.measure_hbm_bandwidth()
    print(f"HBM speed-of-light: {hbm/1e9:.0f} GB/s")

    A = matrices.load_or_synthesize(name)
    m, n = A.shape
    sb = SBELL.from_scipy(A)
    x = jnp.asarray(np.linspace(-1, 1, n).astype(np.float32))
    xpad = jnp.pad(x, (0, sb.n_panes * PANE_COLS - n))
    x3 = xpad.reshape(sb.n_panes, LANE, B).transpose(0, 2, 1)
    x3 = jnp.pad(x3, ((0, W_PANES - 1), (0, 0), (0, 0)))

    nt = sb.n_tiles
    near_bytes = sb.vflat.size * 4 + sb.meta.size * 4 \
        + sb.n_panes * PANE_COLS * 4 + sb.n_stripes * 1024 * 4
    far = sb.far
    nfar = far.n_far if far is not None else 0
    print(f"--- {name}: {m} rows, {A.nnz/1e6:.2f}M nnz, tiles={nt}, "
          f"fill={sb.fill_ratio(A.nnz):.2f}, nfar={nfar}, "
          f"near_bytes={near_bytes/1e6:.1f} MB "
          f"(DMA floor {near_bytes/hbm*1e6:.1f} us)")

    def t_us(fn, x0, iters=256):
        """Three independent delta readings, median reported (stall-robust).
        iters=256 puts ~10-25 ms of compute behind each fetch so the ~4 ms
        dispatch + stall noise can't collapse the delta."""
        rs = sorted(
            harness.time_iterated(fn, x0, iters=iters,
                                  iters_small=max(1, iters // 8), reps=4)
            for _ in range(3))
        lo, med, hi = (r * 1e6 for r in rs)
        print(f"      [readings {lo:8.1f} {med:8.1f} {hi:8.1f} us]",
              flush=True)
        return med

    mode_early = sys.argv[2] if len(sys.argv) > 2 else "ladder"
    # full end-to-end
    t_full = 0.0
    if mode_early != "tpb":
        t_full = t_us(lambda v: sbell_spmv(sb, v), x)

    # near only (skip far): emulate sbell_spmv minus far
    def near_only(v):
        xp = jnp.pad(v, (0, sb.n_panes * PANE_COLS - n))
        x3l = xp.reshape(sb.n_panes, LANE, B).transpose(0, 2, 1)
        x3l = jnp.pad(x3l, ((0, W_PANES - 1), (0, 0), (0, 0)))
        run = build_call(make_kernel(8), 8, nt, sb.n_stripes)
        out = run(sb.pane, sb.sid, sb.vflat, sb.meta, x3l)
        y = out.reshape(sb.n_stripes, B, LANE).transpose(0, 2, 1).reshape(-1)
        return y[:m]
    t_near = t_us(near_only, x) if mode_early != "tpb" else 0.0

    # far only
    if far is not None and mode_early != "tpb":
        from libhpc_tpu.ops.spmv import far_grouped_out, far_spmv
        from libhpc_tpu.sparse.sbell import FarGrouped
        npad = int(xpad.shape[0])

        if isinstance(far, FarGrouped):
            def far_step(v):
                o = far_grouped_out(far, v)
                return v + o[0, 0] * 1e-30
        else:
            def far_step(v):
                y = far_spmv(far, v)
                return jnp.pad(y[:min(m, npad)],
                               (0, max(0, npad - m)))[:npad]
        t_far = t_us(far_step, xpad)
    else:
        t_far = 0.0

    mode = sys.argv[2] if len(sys.argv) > 2 else "ladder"
    # raw kernel variants (x -> y chaining via fresh x3 each iter is
    # unnecessary: chain on x3 itself with a cheap self-map)
    variants = {
        "raw": make_kernel(8),
        "nogather": make_kernel(8, gather=False),
        "nofma": make_kernel(8, fma=False),
        "staticstore": make_kernel(8, dynstore=False),
        "nogather+nofma": make_kernel(8, gather=False, fma=False),
        "dmafloor": make_dmafloor_kernel(8),
    }
    if mode == "tpb":
        variants = {"dmafloor": make_dmafloor_kernel(8)}
    print(f"{'variant':>16}  {'us':>8}  {'ns/tile':>8}  frac_of_floor")
    base_floor = near_bytes / hbm * 1e6
    for vname, k in variants.items():
        run = build_call(k, 8, nt, sb.n_stripes)

        def step(x3v, run=run):
            out = run(sb.pane, sb.sid, sb.vflat, sb.meta, x3v)
            # fold output back into x3-shape to chain (cheap: one slice)
            return x3v + out[0, 0] * 1e-30
        t = t_us(step, x3)
        print(f"{vname:>16}  {t:8.1f}  {t*1e3/nt:8.1f}  {t/base_floor:6.2f}x")

    # TPB sweep on the full kernel
    print("TPB sweep (full kernel):")
    for tpb in (8, 16, 32):  # meta block rows must be divisible by 8
        pane, sid, vflat, meta, ntp = pad_to_tpb(sb, tpb)
        run = build_call(make_kernel(tpb), tpb, ntp, sb.n_stripes)

        def step(x3v, run=run, pane=pane, sid=sid, vflat=vflat, meta=meta):
            out = run(pane, sid, vflat, meta, x3v)
            return x3v + out[0, 0] * 1e-30
        t = t_us(step, x3)
        print(f"  TPB={tpb:2d}: {t:8.1f} us  {t*1e3/ntp:6.1f} ns/tile  "
              f"({ntp // tpb} grid steps, {t*1e3/(ntp//tpb):6.0f} ns/step)")

    print(f"\nsummary: full={t_full:.1f} us  near={t_near:.1f}  "
          f"far={t_far:.1f}  floor={base_floor:.1f}  "
          f"full_fraction={base_floor/t_full:.3f}")


if __name__ == "__main__":
    main()
