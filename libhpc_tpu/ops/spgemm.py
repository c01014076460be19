"""SpGEMM — sparse × sparse matrix multiply (BASELINE.json configs[4]).

SURVEY.md §7 hard-part #3: output-size-unknown computation in a static-shape
world. Same resolution as the reference's count→scan→scatter skeleton
(SURVEY.md §3.2) — a two-pass algorithm:

  symbolic pass (host or jit): expansion size S = Σ_{(i,k)∈A} nnz(B row k),
     computed exactly from the two indptr arrays; static padded bound S_pad.
  numeric pass (jit): expand all partial products into (row, col, val)
     triplets via an ELL view of B (dense rectangle, no gather lists),
     then sort by (row, col) and segment-sum duplicates — the
     sort-and-merge formulation, which maps onto XLA's on-chip sort
     instead of per-element scatter.

Output is a padded COO (explicit zero tail) — every downstream op is
additive so padding is harmless; `tocsr()` gives a padded CSR.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from libhpc_tpu.sparse.coo import COO


def spgemm_expansion_size(A_csr, B_csr) -> int:
    """Symbolic pass: exact expanded-product count (host scalar)."""
    lenB = B_csr.row_lengths()
    return int(jnp.sum(lenB[A_csr.indices]))


@partial(jax.jit, static_argnames=("kB",))
def _spgemm_numeric(A, B_ell, kB: int):
    nnzA = A.nnz
    rowA = A.row_of_nnz()
    # expanded partial products: (nnzA, kB)
    vals = A.data[:, None] * B_ell.vals[A.indices]      # (nnzA, kB)
    cols = B_ell.cols[A.indices]                        # (nnzA, kB)
    rows = jnp.broadcast_to(rowA[:, None], (nnzA, kB))
    coo = COO(
        row=rows.reshape(-1).astype(jnp.int32),
        col=cols.reshape(-1).astype(jnp.int32),
        data=vals.reshape(-1),
        shape=(A.shape[0], B_ell.shape[1]),
    )
    return coo.sum_duplicates()


def spgemm(A_csr, B_csr):
    """C = A @ B as padded COO. Setup (ELL pack of B) is host-side."""
    if A_csr.shape[1] != B_csr.shape[0]:
        raise ValueError(f"shape mismatch {A_csr.shape} @ {B_csr.shape}")
    B_ell = B_csr.to_ell()
    return _spgemm_numeric(A_csr, B_ell, B_ell.k)


def spgemm_csr(A_csr, B_csr):
    """C = A @ B as padded CSR."""
    return spgemm(A_csr, B_csr).tocsr()
