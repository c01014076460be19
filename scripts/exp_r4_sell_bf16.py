#!/usr/bin/env python
"""Round-4 TPU experiments: (a) SELL Pallas ELL kernel rate on Poisson;
(b) bf16 SBELL near-kernel behavior vs TPB (the bf16 stream halves the
DMA, so the r3 TPB=16 optimum may shift).

Run: python scripts/exp_r4_sell_bf16.py [sell|sbell16]
(one TPU process, idle host; LIBHPC_SBELL_TPB set by the caller)
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from libhpc_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from libhpc_tpu.bench import harness, matrices  # noqa: E402


def run_sell():
    from libhpc_tpu.ops.ell_pallas import sell_from_scipy, sell_spmv
    from libhpc_tpu.sparse import ELL
    from libhpc_tpu.ops import spmv

    hbm = harness.measure_hbm_bandwidth()
    for n in (512, 1024):
        A = matrices.poisson2d(n)
        sp = sell_from_scipy(A)
        x = jnp.asarray(np.linspace(-1, 1, A.shape[1]).astype(np.float32))
        y = np.asarray(sell_spmv(sp, x))
        ok = np.allclose(y, A @ np.asarray(x), rtol=2e-3, atol=2e-3)
        per = harness.time_iterated(lambda v: sell_spmv(sp, v), x,
                                    iters=32, iters_small=4)
        print(json.dumps(dict(
            bench=f"sell_poisson{n}", ok=bool(ok),
            ms=round(per * 1e3, 3),
            gnnz_per_s=round(A.nnz / per / 1e9, 2),
            own_bytes_fraction=round(sp.hbm_bytes / per / hbm, 4),
            n_tiles=sp.n_tiles)), flush=True)
        # XLA ELL path for comparison
        ell = ELL.from_scipy(A)
        per2 = harness.time_iterated(lambda v: spmv.ell_spmv(ell, v), x,
                                     iters=4, iters_small=1)
        print(json.dumps(dict(bench=f"ell_xla_poisson{n}",
                              gnnz_per_s=round(A.nnz / per2 / 1e9, 3))),
              flush=True)


def run_sbell16():
    from libhpc_tpu.sparse.sbell import SBELL, TPB
    from libhpc_tpu.ops.spmv_pallas import sbell_spmv_panes, x_to_panes

    hbm = harness.measure_hbm_bandwidth()
    A = matrices.load_or_synthesize("cant")
    m, n = A.shape
    sb = SBELL.from_scipy(A)
    x3 = x_to_panes(sb, jnp.asarray(np.pad(
        np.linspace(-1, 1, n).astype(np.float32),
        (0, sb.n_panes * 1024 - n))))
    for tag, sbv in (("f32", sb), ("bf16", sb.astype_values(jnp.bfloat16))):
        nbytes = harness.format_spmv_bytes("sbell", sbv, m, n)
        per = harness.time_iterated(lambda v: sbell_spmv_panes(sbv, v), x3,
                                    iters=128, iters_small=16)
        print(json.dumps(dict(
            bench=f"sbell_cant_{tag}_tpb{TPB}", us=round(per * 1e6, 1),
            gnnz_per_s=round(A.nnz / per / 1e9, 2),
            own_bytes_fraction=round(nbytes / per / hbm, 4),
            hbm_gb_s=round(hbm / 1e9, 1))), flush=True)


if __name__ == "__main__":
    {"sell": run_sell, "sbell16": run_sbell16}[sys.argv[1]]()
