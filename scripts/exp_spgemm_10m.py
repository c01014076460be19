#!/usr/bin/env python
"""Windowed SpGEMM on a 10M+-nnz operand (VERDICT r2 #6 'Done' check):
pwtk-class (11.5M nnz) squared through spgemm_windowed — exact expansion
(~600M partial products) in 2^22-slot windows, O(window) device memory,
oracle-checked against scipy's A @ A.

Run: python scripts/exp_spgemm_10m.py [window_log2]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from libhpc_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax  # noqa: E402

from libhpc_tpu.bench.matrices import pwtk_like  # noqa: E402
from libhpc_tpu.ops.spgemm import spgemm_windowed  # noqa: E402
from libhpc_tpu.sparse.csr import CSR  # noqa: E402


def main():
    wlog = int(sys.argv[1]) if len(sys.argv) > 1 else 22
    print("devices:", jax.devices(), flush=True)
    t0 = time.perf_counter()
    A = pwtk_like()
    print(f"A: {A.shape[0]} rows, {A.nnz/1e6:.1f}M nnz "
          f"({time.perf_counter()-t0:.0f}s gen)", flush=True)
    Ac = CSR.from_scipy(A)

    lenB = np.diff(A.indptr).astype(np.int64)
    S = int(lenB[A.indices].sum())
    print(f"expansion S = {S/1e6:.0f}M partial products, "
          f"window 2^{wlog} -> {-(-S // (1 << wlog))} windows", flush=True)

    t0 = time.perf_counter()
    C = spgemm_windowed(Ac, Ac, window=1 << wlog)
    t_gemm = time.perf_counter() - t0
    print(f"spgemm_windowed: {t_gemm:.1f}s, nnzC = {C.nnz/1e6:.1f}M, "
          f"{S/t_gemm/1e9:.3f} G products/s", flush=True)

    t0 = time.perf_counter()
    Cref = (A @ A).tocsr()
    Cref.sort_indices()
    print(f"scipy A@A: {time.perf_counter()-t0:.1f}s, "
          f"nnz {Cref.nnz/1e6:.1f}M", flush=True)

    got = C.to_scipy().tocsr()
    got.sort_indices()
    same_nnz = got.nnz == Cref.nnz
    err = abs(got - Cref).max() if same_nnz else float("nan")
    print(f"oracle: same structure nnz={same_nnz}, max |err| = {err:.2e}",
          flush=True)
    ok = same_nnz and err < 1e-2
    print("OK" if ok else "MISMATCH", flush=True)


if __name__ == "__main__":
    main()
