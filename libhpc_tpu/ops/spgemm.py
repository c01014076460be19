"""SpGEMM — sparse × sparse matrix multiply (BASELINE.json configs[4]).

SURVEY.md §7 hard-part #3: output-size-unknown computation in a static-shape
world. Same resolution as the reference's count→scan→scatter skeleton
(/root/reference/lib/sort/radix_cpu/include/radix_sort_cpu.hpp:254-322,
SURVEY.md §3.2) — two-pass algorithms:

  symbolic pass: expansion size S = Σ_{(i,k)∈A} nnz(B row k), computed
     exactly from the two indptr arrays (count → scan).
  numeric pass (jit): expand partial products into (row, col, val)
     triplets, then sort by (row, col) and segment-sum duplicates — the
     sort-and-merge formulation, which maps onto on-chip sort instead of
     per-element scatter (TPU has no fast scatter, PERF_NOTES.md).

Three numeric strategies, by scale:

  spgemm           ELL-of-B expansion, O(nnzA × kB) memory. Fast & simple
                   when B's max row length kB is moderate.
  spgemm_blocked   the same per row-block: O(block_nnz × kB).
  spgemm_windowed  EXACT expansion in fixed windows: O(window) device
                   memory regardless of kB or nnzA — the 100M-nnz-scale
                   path (VERDICT r2 #6). Symbolic count→scan on the host,
                   then one identically-shaped jitted program per window
                   (compiled once): jnp.repeat forward-fill of the source
                   ids, piecewise-sequential B reads, 2-key sort, segment
                   merge, host-side compaction.

Output is COO (padded tails of explicit zeros where noted) — every
downstream op is additive so padding is harmless; `tocsr()` gives CSR.
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


# ---------------------------------------------------------------------------
# windowed exact-expansion SpGEMM (the at-scale path)
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("W", "SRC"))
def _spgemm_window(lens, rows_w, adata_w, rel_base, n_valid,
                   B_indices, B_data, W: int, SRC: int):
    """Numeric pass for one expansion window of W slots.

    Host-prepared per-source arrays (all length SRC, padded):
      lens      int32  slots each source owns inside THIS window (0 for pad)
      rows_w    int32  output row of each source
      adata_w   f32    A value of each source
      rel_base  int32  B.indptr[A col of source] - window-local start slot,
                       so a slot s reads B entry  rel_base[src(s)] + s
                       (piecewise-sequential absolute B offsets)
    n_valid: scalar — live slots (tail of the last window is dead).
    Returns (row, col, val, n_entries): sorted, deduped, zero-padded.
    """
    src = jnp.repeat(jnp.arange(SRC, dtype=jnp.int32), lens,
                     total_repeat_length=W)          # forward-fill src ids
    s = jnp.arange(W, dtype=jnp.int32)
    idxB = rel_base[src] + s
    valid = s < n_valid
    idxB = jnp.where(valid, idxB, 0)
    row = jnp.where(valid, rows_w[src], jnp.int32(2**31 - 1))
    col = jnp.where(valid, B_indices[idxB], jnp.int32(2**31 - 1))
    val = jnp.where(valid, adata_w[src] * B_data[idxB], 0)

    row, col, val = jax.lax.sort((row, col, val), num_keys=2)
    is_head = jnp.concatenate(
        [valid[:1], (row[1:] != row[:-1]) | (col[1:] != col[:-1])])
    is_head = is_head & (jnp.arange(W) < n_valid)
    seg = jnp.cumsum(is_head.astype(jnp.int32)) - 1
    seg = jnp.where(seg < 0, 0, seg)
    data = jax.ops.segment_sum(val, seg, num_segments=W)
    rr = jax.ops.segment_max(jnp.where(is_head, row, -1), seg,
                             num_segments=W)
    cc = jax.ops.segment_max(jnp.where(is_head, col, -1), seg,
                             num_segments=W)
    n_entries = jnp.sum(is_head.astype(jnp.int32))
    keep = jnp.arange(W) < n_entries
    return (jnp.where(keep, rr, 0).astype(jnp.int32),
            jnp.where(keep, cc, 0).astype(jnp.int32),
            jnp.where(keep, data, 0), n_entries)


def spgemm_windowed(A_csr, B_csr, window: int = 1 << 21) -> COO:
    """C = A @ B with O(window) device memory — exact expansion, no kB term.

    The symbolic pass (host numpy: count → exclusive scan, the skeleton of
    radix_sort_cpu.hpp:254-322) assigns every partial product A[i,k]*B[k,j]
    one slot in a global expansion of size S = Σ nnz(B row k); slots are
    processed in fixed windows of `window`, each through ONE jitted program
    (identical shapes — single compilation), and each window's compacted
    triplets are accumulated host-side. Works at S > 2^31 (offsets are
    int64 on the host; on-device positions are window-relative int32).

    Returns canonical sorted COO (exact nnz, duplicates merged). A
    (row, col) pair straddling a window seam yields one partial entry per
    window; the final host lexsort+segment-sum merge combines them.
    """
    import numpy as np

    if A_csr.shape[1] != B_csr.shape[0]:
        raise ValueError(f"shape mismatch {A_csr.shape} @ {B_csr.shape}")
    m, n_out = A_csr.shape[0], B_csr.shape[1]
    W = int(window)

    # ---- symbolic pass (host) -------------------------------------------
    a_ind = np.asarray(A_csr.indices)
    a_ptr = np.asarray(A_csr.indptr).astype(np.int64)
    b_ptr = np.asarray(B_csr.indptr).astype(np.int64)
    a_dat = np.asarray(A_csr.data)
    lens_all = (b_ptr[a_ind + 1] - b_ptr[a_ind]).astype(np.int64)
    rows_all = np.repeat(np.arange(m, dtype=np.int32), np.diff(a_ptr))
    live = lens_all > 0                      # empty B rows own no slots
    lens_l = lens_all[live]
    if lens_l.size == 0:
        z = jnp.zeros((1,), jnp.int32)
        return COO(row=z, col=z, data=jnp.zeros((1,), A_csr.dtype),
                   shape=(m, n_out))
    starts = np.concatenate([[0], np.cumsum(lens_l)])   # (nsrc+1,) int64
    S = int(starts[-1])
    rows_l = rows_all[live]
    adata_l = a_dat[live]
    bstart_l = b_ptr[a_ind[live]]            # B row start of each source

    n_win = -(-S // W)
    # per-window source ranges [jlo, jhi): jlo covers the window's slot 0
    w0s = np.arange(n_win, dtype=np.int64) * W
    jlo = np.searchsorted(starts, w0s, side="right") - 1
    jhi = np.searchsorted(starts, np.minimum(w0s + W, S), side="left")
    SRC = int(np.max(jhi - jlo))

    rows_out, cols_out, data_out = [], [], []
    for w in range(n_win):
        lo, hi = int(jlo[w]), int(jhi[w])
        nsrc = hi - lo
        w0 = int(w0s[w])
        # window-clipped slot counts per source
        st = np.maximum(starts[lo:hi], w0)
        en = np.minimum(starts[lo + 1:hi + 1], w0 + W)
        lens_w = np.zeros(SRC, np.int32)
        lens_w[:nsrc] = (en - st).astype(np.int32)
        rows_w = np.zeros(SRC, np.int32)
        rows_w[:nsrc] = rows_l[lo:hi]
        adata_w = np.zeros(SRC, a_dat.dtype)
        adata_w[:nsrc] = adata_l[lo:hi]
        rel_base = np.zeros(SRC, np.int64)
        # window-local slot s of source j reads B entry
        # bstart[j] + (w0 + s - starts[j]) = (bstart[j] - starts[j] + w0) + s
        rel_base[:nsrc] = bstart_l[lo:hi] - starts[lo:hi] + w0
        n_valid = min(W, S - w0)
        rr, cc, dd, ne = _spgemm_window(
            jnp.asarray(lens_w), jnp.asarray(rows_w), jnp.asarray(adata_w),
            jnp.asarray(rel_base.astype(np.int32)), jnp.int32(n_valid),
            B_csr.indices, B_csr.data, W=W, SRC=SRC)
        ne = int(ne)
        # quantized pull size: a fresh slice shape per window would
        # recompile the fetch each time (seconds each on a remote-attached
        # TPU); 64Ki quanta bound the distinct shapes to <= W/65536
        q = min(W, -(-max(ne, 1) // 65536) * 65536)
        rq, cq, dq = jax.device_get((rr[:q], cc[:q], dd[:q]))
        rows_out.append(rq[:ne])
        cols_out.append(cq[:ne])
        data_out.append(dq[:ne])

    # merge boundary duplicates: windows are slot-ordered, so the concat is
    # already (row, col)-sorted except at window seams — one host merge
    r = np.concatenate(rows_out)
    c = np.concatenate(cols_out)
    d = np.concatenate(data_out)
    key_order = np.lexsort((c, r))
    r, c, d = r[key_order], c[key_order], d[key_order]
    head = np.ones(r.size, bool)
    head[1:] = (r[1:] != r[:-1]) | (c[1:] != c[:-1])
    seg = np.cumsum(head) - 1
    dsum = np.zeros(int(seg[-1]) + 1, d.dtype)
    np.add.at(dsum, seg, d)
    return COO(row=jnp.asarray(r[head], jnp.int32),
               col=jnp.asarray(c[head], jnp.int32),
               data=jnp.asarray(dsum), shape=(m, n_out))
