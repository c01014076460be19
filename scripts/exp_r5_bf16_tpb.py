"""Round-5 follow-up: bf16 SBELL tpb decision run (32 vs 64).

exp_r5_bf16.py attributed the committed 0.54 bf16 fraction to a
DMA-pipeline-latency bottleneck at TPB=16 (halved per-step transfer;
mincompute==full, so not compute-bound). This run measures ONLY the
production kernels — f32@{16,32}, bf16@{16,32,64} on cant AND pwtk —
over 10 interleaved rounds for stable medians.
"""

from __future__ import annotations

import sys

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from libhpc_tpu.bench import harness, matrices  # noqa: E402
from libhpc_tpu.ops.spmv_pallas import (_sbell_call,  # noqa: E402
                                        x_to_panes)
from libhpc_tpu.sparse.sbell import B, LANE, SBELL, W_PANES  # noqa: E402
from libhpc_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()


def main():
    cases = []
    for mat in ("cant", "pwtk"):
        A = matrices.load_or_synthesize(mat)
        sb = SBELL.from_scipy(A)
        x = jnp.asarray(np.linspace(-1, 1, A.shape[1], dtype=np.float32))
        x3 = x_to_panes(sb, jnp.pad(x, (0, sb.n_panes * 1024
                                        - A.shape[1])))
        for tpb in (16, 32):
            o = sb if tpb == sb.tpb else sb.retile(tpb)
            cases.append((f"{mat}/f32/tpb{tpb}", o, x3, 4))
        for tpb in (16, 32, 64):
            o = sb.astype_values(jnp.bfloat16, tpb=tpb) \
                if tpb != sb.tpb else sb.astype_values(jnp.bfloat16)
            cases.append((f"{mat}/bf16/tpb{tpb}", o, x3, 2))

    res = {name: [] for name, *_ in cases}
    for rnd in range(10):
        for name, o, x3, vsize in cases:
            try:
                per = harness.time_iterated(
                    lambda v, ov: _sbell_call(
                        (ov[0], ov[1], ov[2], ov[3], v),
                        o.n_tiles, o.n_stripes, o.n_panes, o.tpb).reshape(
                        o.n_stripes + W_PANES - 1, B, LANE),
                    x3, iters=192, iters_small=24,
                    operand=(o.pane, o.sid, o.vflat, o.meta))
            except Exception as e:  # noqa: BLE001
                print(f"{name}: {type(e).__name__}: {e}"[:160], flush=True)
                continue
            res[name].append(per)
        if rnd == 0:
            print("-- compiled, timing --", flush=True)

    print(f"\n{'case':20s} {'ns/tile best':>12s} {'med':>8s} "
          f"{'model@719':>10s} {'frac(best)':>10s}")
    for name, o, x3, vsize in cases:
        r = sorted(res[name])
        if not r:
            continue
        nt = o.n_tiles
        best, med = r[0] / nt * 1e9, r[len(r) // 2] / nt * 1e9
        model = (64 * 128 * vsize + 128 * 4) / 719
        print(f"{name:20s} {best:12.1f} {med:8.1f} {model:10.1f} "
              f"{model / best:10.2f}")


if __name__ == "__main__":
    main()
