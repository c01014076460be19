#!/usr/bin/env python
"""SBELL wrapper fusion: move the x3 block-transpose (and optionally the y
de-transpose) INTO the kernel (round-3 attribution: the XLA wrapper ops
around the 23 us kernel cost ~13 us of launch overhead).

Variants:
  base    production sbell_spmv_padded (XLA x3 prep + y reshape)
  fusedx  kernel takes the NATURAL-layout x (n_panes*8, 128) resident in
          VMEM; a g==0 prologue builds the block-transposed panes into a
          VMEM scratch with the 8-pass gather/select trick (only ops with
          proven Mosaic lowering: same-shape take_along_axis axis=-1,
          where, broadcast) — no cross-lane reshape.
  fusedxy fusedx + a last-step epilogue that emits y in FINAL flat layout
          (second output), removing the XLA de-transpose too.

Run: python scripts/exp_sbell_fused.py [cant|pwtk]
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

from libhpc_tpu.bench import harness, matrices  # noqa: E402
from libhpc_tpu.ops.spmv_pallas import sbell_spmv_padded  # noqa: E402
from libhpc_tpu.ops.spmv import far_grouped_out  # noqa: E402
from libhpc_tpu.ops._pallas_utils import interpret_mode  # noqa: E402
from libhpc_tpu.sparse.sbell import (B, LANE, PANE_COLS, SBELL,  # noqa: E402
                                     VROWS, TPB, W_PANES)


def _xprep(xf, n_panes):
    """(n_panes*8, 128) natural rows -> (n_panes, 8, 128) block-transposed
    panes via 8 gather+select passes (out[p,j,l] = x[1024p + 8l + j])."""
    r1 = xf.reshape(n_panes, B, LANE)
    j = jax.lax.broadcasted_iota(jnp.int32, (n_panes, B, LANE), 1)
    l = jax.lax.broadcasted_iota(jnp.int32, (n_panes, B, LANE), 2)
    flat = l * B + j                       # 8l + j in 0..1023
    lane_idx = flat & (LANE - 1)
    row_idx = flat >> 7                    # source row 0..7
    out = jnp.zeros((n_panes, B, LANE), xf.dtype)
    for r in range(B):
        tab = jnp.broadcast_to(r1[:, r:r + 1, :], (n_panes, B, LANE))
        g = jnp.take_along_axis(tab, lane_idx, axis=2)
        out = jnp.where(row_idx == r, g, out)
    return out


def make_fused(n_tiles, n_stripes, n_panes, fuse_y):
    win = n_panes + W_PANES - 1

    def kernel(pane_ref, sid_ref, v_ref, m_ref, xf_ref, o_ref, xs):
        g = pl.program_id(0)

        @pl.when(g == 0)
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)
            xs[0:n_panes] = _xprep(xf_ref[:], n_panes)
            xs[n_panes:] = jnp.zeros((win - n_panes, B, LANE), jnp.float32)

        for t in range(TPB):
            base = t * VROWS
            col = m_ref[t:t + 1, :]
            p = pane_ref[g * TPB + t]
            sid = sid_ref[g * TPB + t]
            idx = jnp.broadcast_to(col & (LANE - 1), (B, LANE))
            gx = jnp.take_along_axis(xs[p], idx, axis=1)
            for w in range(1, W_PANES):
                sel = jnp.broadcast_to((col >> 7) == w, (B, LANE))
                gw = jnp.take_along_axis(xs[p + w], idx, axis=1)
                gx = jnp.where(sel, gw, gx)
            pacc = v_ref[base:base + B, :] * gx[0:1, :]
            for j in range(1, B):
                pacc = pacc + v_ref[base + B * j:base + B * (j + 1), :] \
                    * gx[j:j + 1, :]
            o_ref[pl.ds(sid * B, B), :] = o_ref[pl.ds(sid * B, B), :] + pacc

    def kernel_xy(pane_ref, sid_ref, v_ref, m_ref, xf_ref, far_ref,
                  o_ref, y_ref, xs):
        kernel(pane_ref, sid_ref, v_ref, m_ref, xf_ref, o_ref, xs)
        ng = pl.num_programs(0)

        @pl.when(pl.program_id(0) == ng - 1)
        def _():
            o_ref[:] = o_ref[:] + far_ref[:]
            # inverse transform: y[sid, r, i] = out[8 sid + i, r]
            # out rows (S*8, 128) -> y rows (S*128/16? ) use same 8-pass
            # trick on the (S, 8, 128) view -> (S, 128, 8) stored as
            # (S*8, 128)? final flat y viewed as (S*8, 128) rows of 128:
            # yrow q = y[128 q .. 128 q + 127]; y[1024 s + 8 r + i];
            # q = 8 s + (r >> 4); in-row lane = 8 (r & 15) + i.
            o = o_ref[:].reshape(n_stripes, B, LANE)
            s_ = jax.lax.broadcasted_iota(
                jnp.int32, (n_stripes, B, LANE), 0)
            del s_
            q2 = jax.lax.broadcasted_iota(
                jnp.int32, (n_stripes, B, LANE), 1)   # sub-row 0..7
            lane = jax.lax.broadcasted_iota(
                jnp.int32, (n_stripes, B, LANE), 2)
            # target element y[s, q2, lane] = out[s, i, r] with
            # r = 16 q2 + (lane >> 3), i = lane & 7
            r_idx = q2 * (LANE // B) + (lane >> 3)
            i_idx = lane & (B - 1)
            acc = jnp.zeros((n_stripes, B, LANE), jnp.float32)
            for i in range(B):
                tab = jnp.broadcast_to(o[:, i:i + 1, :],
                                       (n_stripes, B, LANE))
                g2 = jnp.take_along_axis(tab, r_idx, axis=2)
                acc = jnp.where(i_idx == i, g2, acc)
            y_ref[:] = acc.reshape(n_stripes * B, LANE)

    in_specs = [
        pl.BlockSpec((TPB * VROWS, LANE), lambda g, *_: (g, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((TPB, LANE), lambda g, *_: (g, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),      # xflat resident
    ]
    if fuse_y:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))  # far
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles // TPB,),
        in_specs=in_specs,
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),) if not fuse_y
        else (pl.BlockSpec(memory_space=pltpu.VMEM),
              pl.BlockSpec(memory_space=pltpu.VMEM)),
        scratch_shapes=[pltpu.VMEM((win, B, LANE), jnp.float32)],
    )
    shp = jax.ShapeDtypeStruct((n_stripes * B, LANE), jnp.float32)
    return pl.pallas_call(
        kernel_xy if fuse_y else kernel,
        out_shape=(shp, shp) if fuse_y else (shp,),
        grid_spec=grid_spec,
        interpret=interpret_mode(),
    )


def t_us(fn, x0, iters=256):
    rs = sorted(
        harness.time_iterated(fn, x0, iters=iters,
                              iters_small=max(1, iters // 8), reps=4)
        for _ in range(3))
    print(f"      [readings {rs[0]*1e6:8.1f} {rs[1]*1e6:8.1f} "
          f"{rs[2]*1e6:8.1f} us]", flush=True)
    return rs[1] * 1e6


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "cant"
    print("devices:", jax.devices(), flush=True)
    A = matrices.load_or_synthesize(name)
    m, n = A.shape
    sb = SBELL.from_scipy(A)
    npad = sb.n_panes * PANE_COLS
    x = np.linspace(-1, 1, n).astype(np.float32)
    xpad = jnp.asarray(np.pad(x, (0, npad - n)))
    y_ref = A @ x

    hbm = harness.measure_hbm_bandwidth()
    print(f"HBM: {hbm/1e9:.0f} GB/s  tiles={sb.n_tiles}", flush=True)

    # base
    yb = np.asarray(sbell_spmv_padded(sb, xpad))[:m]
    print("base correct:", np.allclose(yb, y_ref, rtol=2e-3, atol=2e-3),
          flush=True)
    tb = t_us(lambda v: sbell_spmv_padded(sb, v), xpad)
    print(f"base    : {tb:8.1f} us", flush=True)

    # fusedx
    call = jax.jit(make_fused(sb.n_tiles, sb.n_stripes, sb.n_panes, False))

    def fusedx(v):
        xf = v.reshape(sb.n_panes * B, LANE)
        (out,) = call(sb.pane, sb.sid, sb.vflat, sb.meta, xf)
        out = out + far_grouped_out(sb.far, v)
        y = out.reshape(sb.n_stripes, B, LANE).transpose(0, 2, 1)
        return y.reshape(-1)

    try:
        yf = np.asarray(fusedx(xpad))[:m]
        ok = np.allclose(yf, y_ref, rtol=2e-3, atol=2e-3)
        print("fusedx correct:", ok, flush=True)
        if ok:
            tf = t_us(fusedx, xpad)
            print(f"fusedx  : {tf:8.1f} us", flush=True)
    except Exception as e:  # noqa: BLE001
        print("fusedx FAIL:", type(e).__name__, str(e)[:200], flush=True)

    # fusedxy
    cxy = jax.jit(make_fused(sb.n_tiles, sb.n_stripes, sb.n_panes, True))

    def fusedxy(v):
        xf = v.reshape(sb.n_panes * B, LANE)
        far = far_grouped_out(sb.far, v)
        out, y = cxy(sb.pane, sb.sid, sb.vflat, sb.meta, xf, far)
        return y.reshape(-1)

    try:
        yf = np.asarray(fusedxy(xpad))[:m]
        ok = np.allclose(yf, y_ref, rtol=2e-3, atol=2e-3)
        print("fusedxy correct:", ok, flush=True)
        if ok:
            tf = t_us(fusedxy, xpad)
            print(f"fusedxy : {tf:8.1f} us", flush=True)
    except Exception as e:  # noqa: BLE001
        print("fusedxy FAIL:", type(e).__name__, str(e)[:200], flush=True)


if __name__ == "__main__":
    main()
