"""Round-5: can vmem_limit_bytes raise the resident-SBELL ceiling?

The chunked 100M-nnz path commits own_bytes_fraction 0.52 (BENCH_r04)
vs 0.88-0.96 for the in-VMEM resident kernel. The 14 MB VMEM_CAP that
forces chunking is XLA's *default scoped-vmem* limit (a compiler knob),
not physical VMEM — v5e has 128 MB. If CompilerParams(vmem_limit_bytes)
lets the resident kernel compile with 20-60 MB of resident x panes +
output, the configs[4] scale run can use the resident kernel directly
and chunking only starts far later (VERDICT r5 item #2).

Steps: build mid-size banded block matrices with resident footprints
~17 MB / ~33 MB / ~65 MB, compile the resident kernel with a raised
vmem_limit_bytes, check correctness, time it, report own-byte fraction
model-rate.
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
from libhpc_tpu.ops import spmv_pallas  # noqa: E402
from libhpc_tpu.ops.spmv_pallas import (_kernel, _resident_bytes,  # noqa: E402
                                        x_to_panes)
from libhpc_tpu.sparse.sbell import (LANE, SBELL, VROWS, B,  # noqa: E402
                                     W_PANES)
from libhpc_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()


@partial(jax.jit, static_argnums=(1, 2, 3, 4))
def _call_vlim(args, n_tiles, n_stripes, tpb, vmem_limit):
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
        partial(_kernel, tpb=tpb),
        out_shape=jax.ShapeDtypeStruct(
            ((n_stripes + W_PANES - 1) * B, LANE), jnp.float32),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_limit),
    )(pane, sid, vflat, meta, x3)


def run(n_block_rows, vmem_limit):
    A = matrices.block_random_fast(n_block_rows, blocks_per_row=8,
                                   half_band=6, far_fraction=0.01, seed=3)
    m, n = A.shape
    sb = SBELL.from_scipy(A)
    res_mb = _resident_bytes(sb.n_stripes, sb.n_panes) / 1e6
    print(f"rows={m} nnz={A.nnz / 1e6:.1f}M resident={res_mb:.1f}MB "
          f"n_tiles={sb.n_tiles}", flush=True)
    x = jnp.asarray(np.linspace(-1, 1, n).astype(np.float32))
    x3 = x_to_panes(sb, jnp.pad(x, (0, sb.n_panes * 1024 - n)))
    try:
        out = _call_vlim((sb.pane, sb.sid, sb.vflat, sb.meta, x3),
                         sb.n_tiles, sb.n_stripes, sb.tpb, vmem_limit)
        out.block_until_ready()
    except Exception as e:  # noqa: BLE001
        print(f"  COMPILE/RUN FAIL at vmem_limit={vmem_limit >> 20}MB: "
              f"{type(e).__name__}: {e}"[:300], flush=True)
        return
    # correctness: near-kernel output + far set via the library path
    y_near = np.asarray(out[:sb.n_stripes * B])
    # full library answer for reference
    y_ref = A @ np.asarray(x)
    from libhpc_tpu.ops.spmv import far_grouped_out_panes
    from libhpc_tpu.sparse.sbell import FarGrouped

    full = out
    if isinstance(sb.far, FarGrouped):
        full = full + far_grouped_out_panes(sb.far, x3)
    yf = np.asarray(full[:sb.n_stripes * B]).reshape(
        sb.n_stripes, B, LANE).transpose(0, 2, 1).reshape(-1)[:m]
    ok = np.allclose(yf, y_ref, rtol=2e-3, atol=2e-3)
    del y_near
    rd, wr = harness.format_spmv_rw_bytes("sbell", sb, m, n)
    pers = []
    for _ in range(3):
        try:
            per = harness.time_iterated(
                lambda v, ov: _call_vlim(
                    (ov[0], ov[1], ov[2], ov[3], v),
                    sb.n_tiles, sb.n_stripes, sb.tpb, vmem_limit
                ).reshape(sb.n_stripes + W_PANES - 1, B, LANE),
                x3, iters=24, iters_small=3,
                operand=(sb.pane, sb.sid, sb.vflat, sb.meta))
            if per > (rd + wr) / 1.2e12:
                pers.append(per)
        except Exception as e:  # noqa: BLE001
            print(f"  timing: {type(e).__name__}: {e}"[:150], flush=True)
    if pers:
        per = min(pers)
        print(f"  ok={ok} {per * 1e3:.2f} ms  "
              f"{A.nnz / per / 1e9:.1f} Gnnz/s  "
              f"model {(rd + wr) / per / 1e9:.0f} GB/s", flush=True)
    else:
        print(f"  ok={ok} no plausible timing", flush=True)


def main():
    lim = 100 * 1024 * 1024
    # resident MB scales with block rows: the bench 100M-nnz case is
    # 260k block rows (~16.6 MB resident, just past the 14 MB cap)
    for nbr in (260_000, 520_000, 1_000_000):
        run(nbr, lim)


if __name__ == "__main__":
    main()
