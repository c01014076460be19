"""Round-5 attribution: where did the chunked 100M-nnz path's missing
half go? (VERDICT r5 item #2 asked for attribution, not just a fix.)

BENCH_r04 scale.sbell_100m: 65.5 Gnnz/s, own_bytes_fraction 0.52 with
n_chunks=2 under the old 14 MB cap — vs 0.876 for in-VMEM cant. Round-5
found the resident kernel runs the same matrix at ~140 Gnnz/s once the
Mosaic scoped-vmem limit is raised (exp_r5_vmem.py), so the cap itself
was the artifact; this run pins WHICH mechanism the 2-chunk execution
paid for, by sweeping n_chunks at a fixed matrix in ONE process:

  resident            (cap above resident bytes)
  chunked n=2,4,8,16  (caps forcing successively smaller chunks)

plus the plan's own accounting per cap: tiles walked vs real tiles
(boundary overlap) and the per-chunk x-window DMA bytes. If throughput
RISES with more/smaller chunks, the 2-chunk config was VMEM-pressure-
bound (output double-buffer + window squeezing the value stream's
revolving buffers); if it FALLS, per-chunk fixed costs dominate.
"""

from __future__ import annotations

import sys

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from libhpc_tpu.bench import harness, matrices  # noqa: E402
from libhpc_tpu.ops import spmv_pallas  # noqa: E402
from libhpc_tpu.ops.spmv_pallas import (sbell_spmv_panes,  # noqa: E402
                                        x_to_panes)
from libhpc_tpu.sparse.sbell import SBELL  # noqa: E402
from libhpc_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()


def main():
    A = matrices.block_random_fast(260_000, blocks_per_row=8, half_band=6,
                                   far_fraction=0.01, seed=3)
    mb, nb = A.shape
    sb = SBELL.from_scipy(A)
    res = spmv_pallas._resident_bytes(sb.n_stripes, sb.n_panes)
    x = jnp.asarray(np.linspace(-1, 1, nb).astype(np.float32))
    x3 = x_to_panes(sb, jnp.pad(x, (0, sb.n_panes * 1024 - nb)))
    rd, wr = harness.format_spmv_rw_bytes("sbell", sb, mb, nb)
    y_ref = None   # skip host oracle (validated in exp_r5_vmem / bench)

    cases = [("resident", None)]
    for cap_mb in (14, 8, 4, 2):
        spmv_pallas.VMEM_CAP = cap_mb * 1024 * 1024
        try:
            plan = spmv_pallas._chunk_plan(sb, force_spc=None)
        except ValueError as e:
            print(f"cap {cap_mb}MB: {e}"[:120], flush=True)
            continue
        # clear the cached plan so the next cap re-plans
        object.__setattr__(sb, "_chunk_plan_cache", None)
        spc, win, gsteps, bounds = plan
        n_chunks = len(bounds)
        walked = n_chunks * gsteps * sb.tpb
        print(f"cap {cap_mb}MB: n_chunks={n_chunks} spc={spc} win={win} "
              f"gsteps={gsteps} tiles walked {walked} vs real "
              f"{sb.n_tiles} (+{100 * (walked / sb.n_tiles - 1):.1f}%), "
              f"window DMA {n_chunks * win * 4096 / 1e6:.1f} MB total",
              flush=True)
        cases.append((f"chunk{n_chunks}", plan))
    spmv_pallas.VMEM_CAP = res + (1 << 20)   # resident case must fit

    results = {name: [] for name, _ in cases}
    for rnd in range(4):
        for name, plan in cases:
            try:
                per = harness.time_iterated(
                    lambda v, s: sbell_spmv_panes(s, v, chunk_plan=plan),
                    x3, iters=12, iters_small=2, operand=sb)
            except Exception as e:  # noqa: BLE001
                print(f"{name}: {type(e).__name__}: {e}"[:160], flush=True)
                continue
            if per > (rd + wr) / 1.3e12:
                results[name].append(per)
        if rnd == 0:
            print("-- compiled all, timing --", flush=True)

    print(f"\n{'case':10s} {'ms(best)':>9s} {'ms(med)':>8s} "
          f"{'Gnnz/s':>7s} {'GB/s(model)':>11s}")
    for name, _ in cases:
        r = sorted(results[name])
        if not r:
            print(f"{name:10s}  (no plausible reading)")
            continue
        best, med = r[0], r[len(r) // 2]
        print(f"{name:10s} {best * 1e3:9.2f} {med * 1e3:8.2f} "
              f"{A.nnz / best / 1e9:7.1f} {(rd + wr) / best / 1e9:11.0f}")


if __name__ == "__main__":
    main()
