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


def spgemm_blocked(A_csr, B_csr, row_block: int = 4096):
    """Memory-bounded SpGEMM: process A in row blocks so the expansion
    buffer stays O(row_block_nnz × kB) instead of O(nnzA × kB) — required
    at the 100M-nnz scale (BASELINE configs[4]). Host loop over jitted
    per-block numeric passes; returns padded COO.
    """
    import numpy as np

    from libhpc_tpu.sparse.csr import CSR

    if A_csr.shape[1] != B_csr.shape[0]:
        raise ValueError(f"shape mismatch {A_csr.shape} @ {B_csr.shape}")
    B_ell = B_csr.to_ell()
    m = A_csr.shape[0]
    indptr_np = np.asarray(A_csr.indptr)
    rows_list, cols_list, data_list = [], [], []
    for r0 in range(0, m, row_block):
        r1 = min(m, r0 + row_block)
        p0, p1 = int(indptr_np[r0]), int(indptr_np[r1])
        if p1 == p0:
            continue
        blk = CSR(
            data=A_csr.data[p0:p1],
            indices=A_csr.indices[p0:p1],
            indptr=A_csr.indptr[r0 : r1 + 1] - p0,
            shape=(r1 - r0, A_csr.shape[1]),
        )
        c = _spgemm_numeric(blk, B_ell, B_ell.k)
        rows_list.append(c.row + r0)
        cols_list.append(c.col)
        data_list.append(c.data)
    if not rows_list:
        return COO(
            row=jnp.zeros((1,), jnp.int32), col=jnp.zeros((1,), jnp.int32),
            data=jnp.zeros((1,), A_csr.dtype),
            shape=(m, B_ell.shape[1]),
        )
    return COO(
        row=jnp.concatenate(rows_list).astype(jnp.int32),
        col=jnp.concatenate(cols_list).astype(jnp.int32),
        data=jnp.concatenate(data_list),
        shape=(m, B_ell.shape[1]),
    )
