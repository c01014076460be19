"""Round-5 attribution: where does the bf16 SBELL kernel's time go?

BENCH_r04 committed sbell_cant_bf16 at 0.54 of its own-byte roofline
(f32: 0.88-0.96) with only 1.09x the f32 Gnnz/s — the halved value
stream did not halve the time (VERDICT r5 item #1). Hypotheses:
  (a) compute-bound: the per-tile VPU op census (3 lane-gathers + 2
      selects + 8 bf16->f32 converts + 8 multiply-adds + accumulate)
      costs ~as much as the f32 DMA, so halving DMA exposes it;
  (b) DMA-latency-bound: at TPB=16 the halved per-step transfer leaves
      the grid pipeline latency-bound (fix: tpb=32/64);
  (c) fixed per-grid-step overhead.

Instrument: variants of the resident kernel compiled side by side —
  full      : the production kernel
  w2        : gather loop with W=2 panes (cant tiles span <=2)
  nogather  : x window read without take_along_axis/select (WRONG
              result, timing only — isolates the gather cost)
  mincompute: one convert+add per tile (WRONG result — the DMA floor:
              the grid pipeline still streams every value plane)
All timed per-tile at tpb in {16, 32, 64}, f32 vs bf16, interleaved
in one process so a relay slow-window hits all variants equally.
"""

from __future__ import annotations

import sys
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")

from libhpc_tpu.bench import harness, matrices  # noqa: E402
from libhpc_tpu.ops.spmv_pallas import x_to_panes  # noqa: E402
from libhpc_tpu.sparse.sbell import (B, LANE, SBELL, VROWS,  # noqa: E402
                                     W_PANES)
from libhpc_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()


def _kernel(pane_ref, sid_ref, v_ref, m_ref, x_ref, o_ref, *, tpb: int,
            mode: str, w: int):
    g = pl.program_id(0)

    @pl.when(g == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    for t in range(tpb):
        base = t * VROWS
        col = m_ref[t:t + 1, :]
        p = pane_ref[g * tpb + t]
        sid = sid_ref[g * tpb + t]

        if mode == "mincompute":
            pacc = v_ref[base:base + B, :].astype(jnp.float32)
        else:
            if mode == "nogather":
                gx = x_ref[p].astype(jnp.float32)
            else:
                idx = jnp.broadcast_to(col & (LANE - 1), (B, LANE))
                gx = jnp.take_along_axis(x_ref[p], idx, axis=1)
                for ww in range(1, w):
                    sel = jnp.broadcast_to((col >> 7) == ww, (B, LANE))
                    gw = jnp.take_along_axis(x_ref[p + ww], idx, axis=1)
                    gx = jnp.where(sel, gw, gx)
            pacc = v_ref[base:base + B, :].astype(jnp.float32) * gx[0:1, :]
            for j in range(1, B):
                pacc = pacc + v_ref[base + B * j:base + B * (j + 1), :] \
                    .astype(jnp.float32) * gx[j:j + 1, :]
        o_ref[pl.ds(sid * B, B), :] = o_ref[pl.ds(sid * B, B), :] + pacc


@partial(jax.jit, static_argnums=(1, 2, 3, 4, 5))
def _call(args, n_tiles, n_stripes, tpb, mode, w):
    pane, sid, vflat, meta, x3 = args
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
    return pl.pallas_call(
        partial(_kernel, tpb=tpb, mode=mode, w=w),
        out_shape=jax.ShapeDtypeStruct(
            ((n_stripes + W_PANES - 1) * B, LANE), jnp.float32),
        grid_spec=grid_spec,
    )(pane, sid, vflat, meta, x3)


def main():
    A = matrices.load_or_synthesize("cant")
    sb = SBELL.from_scipy(A)
    x = jnp.asarray(np.linspace(-1, 1, A.shape[1], dtype=np.float32))
    x3 = x_to_panes(sb, jnp.pad(x, (0, sb.n_panes * 1024 - A.shape[1])))
    # max actual pane span on cant
    meta_np = np.asarray(sb.meta)
    v_np = np.asarray(sb.vflat).reshape(sb.n_tiles, VROWS, LANE)
    occupied = (np.abs(v_np).sum(axis=1) > 0)
    w_used = int((np.where(occupied, meta_np >> 7, 0)).max()) + 1
    print(f"n_tiles={sb.n_tiles} n_stripes={sb.n_stripes} "
          f"n_panes={sb.n_panes} w_used={w_used}", flush=True)

    cases = []
    for tpb in (16, 32, 64):
        sbt = sb if tpb == sb.tpb else sb.retile(tpb)
        sbt16 = sbt.astype_values(jnp.bfloat16)
        for dt, o in (("f32", sbt), ("bf16", sbt16)):
            for mode, w in (("full", W_PANES), ("w2", 2),
                            ("nogather", W_PANES), ("mincompute", 0)):
                cases.append((f"{dt}/tpb{tpb}/{mode}", o, tpb, mode, w))

    # value bytes per tile (the roofline numerator per tile)
    res = {name: [] for name, *_ in cases}
    for rnd in range(4):
        for name, o, tpb, mode, w in cases:
            args = (o.pane, o.sid, o.vflat, o.meta, x3)
            try:
                per = harness.time_iterated(
                    lambda v, ov: _call(
                        (ov[0], ov[1], ov[2], ov[3], v),
                        o.n_tiles, o.n_stripes, tpb, mode, w).reshape(
                        sb.n_stripes + W_PANES - 1, B, LANE),
                    x3, iters=256, iters_small=32,
                    operand=(o.pane, o.sid, o.vflat, o.meta))
            except Exception as e:  # noqa: BLE001
                print(f"{name}: {type(e).__name__}: {e}"[:160], flush=True)
                continue
            res[name].append(per)
        if rnd == 0:
            print("-- compiled all, timing rounds --", flush=True)

    n_tiles = sb.n_tiles
    print(f"\n{'case':26s} {'us(best)':>9s} {'ns/tile':>8s} "
          f"{'ns/tile(med)':>12s}")
    for name, o, tpb, mode, w in cases:
        r = sorted(res[name])
        if not r:
            continue
        best, med = r[0], r[len(r) // 2]
        print(f"{name:26s} {best * 1e6:9.1f} {best / n_tiles * 1e9:8.1f} "
              f"{med / n_tiles * 1e9:12.1f}")
    vb_f32 = VROWS * LANE * 4
    print(f"\nDMA model: f32 {vb_f32} B/tile = "
          f"{vb_f32 / 719:,.1f} ns at 719 GB/s; bf16 half that")


if __name__ == "__main__":
    main()
