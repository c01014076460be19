"""Round-5: pattern-matched DIA probe vs the DIA Pallas kernel.

VERDICT r4 #3: dia_pallas_poisson3072 committed 925 GB/s model-rate
against a 719 GB/s generic read probe. Either the model overcounts or
the probe undercounts. The model audit says the window term is correct
(x counted once + per-tile span_pad overlap, exactly what the DMAs
move). This measures the same-access-pattern SoL probe 3x and the
kernel 3x, interleaved."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from libhpc_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax.numpy as jnp  # noqa: E402

from libhpc_tpu.bench import harness, matrices  # noqa: E402
from libhpc_tpu.ops.dia_pallas import (DiaPallas, dia_pattern_probe,  # noqa: E402
                                       dia_spmv_pallas)
from libhpc_tpu.sparse import DIA  # noqa: E402

A = matrices.poisson2d(3072)
dp = DiaPallas.from_dia(DIA.from_scipy(A))
n = A.shape[0]
x = jnp.asarray(np.linspace(-1, 1, n, dtype=np.float32))

y = dia_spmv_pallas(dp, x)
ok = np.allclose(np.asarray(y), A @ np.asarray(x), rtol=2e-3, atol=2e-3)
print("kernel correct:", ok, " model MB:", dp.hbm_bytes / 1e6)

probe_fn = lambda v, dpv: dia_pattern_probe(dpv, v).reshape(-1)[:n]  # noqa: E731
kern_fn = lambda v, dpv: dia_spmv_pallas(dpv, v)[:n]  # noqa: E731

for rnd in range(3):
    for name, fn in [("probe", probe_fn), ("kernel", kern_fn)]:
        t = harness.time_iterated(fn, x, iters=32, iters_small=4,
                                  operand=dp)
        print(f"round {rnd} {name}: {t*1e6:.1f} us "
              f"{dp.hbm_bytes/t/1e9:.1f} GB/s "
              f"{A.nnz/t/1e9:.1f} Gnnz/s", flush=True)
    time.sleep(1)
