"""Block SpGEMM — C = A @ B on 8×8 blocks, the MXU redesign (VERDICT r4
next-round #4).

The scalar windowed SpGEMM (ops/spgemm.py:spgemm_windowed) is
gather/scatter-bound at ~0.02 G products/s device-side: every scalar
partial product costs a B_indices/B_data gather plus its share of a
2M-entry sort. Block-structured matrices (cant/pwtk — BASELINE configs[1]
names them; FEM meshes generally) don't need scalar machinery: on the
block level

    C[i,j] += A[i,k] @ B[k,j]          (8×8 · 8×8 block matmuls)

and the repo's own flagship insight applies — 8×8 dense tiles are what
the TPU is built for. The structure pass shrinks 64× (symbolic on block
indices), and the numeric pass becomes batched dense matmuls + one
segment-sum, no sorting network, no per-scalar gathers.

Same two-pass skeleton as the reference's count→scan→scatter radix
pipeline (/root/reference/lib/sort/radix_cpu/include/radix_sort_cpu.hpp:
254-322) and the reference's own move of turning its slowest stage into
the custom flagship (lib/gpu/radix_gpu/src/cuda_radix_sort_v4.cu:193-223):

  symbolic (host numpy, setup-class like all container builds here):
     pair every A block (i,k) with every B block (k,j) — vectorized
     offset arithmetic, no Python loop over k — then sort pairs by
     output block (i,j) and assign contiguous segment ids.
  numeric (device, ONE jitted program):
     gather the paired blocks, batched 8×8 matmuls (dot_general with a
     batch dimension — lowered to the MXU), segment-sum the partial
     products into C's blocks (segments pre-sorted by the host).

Memory: the numeric pass is chunked over pairs (PAIR_CHUNK) so device
memory stays O(chunk + nnzb_C) at any expansion size; chunk boundaries
don't need to respect segments because segment_sum partials add.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from libhpc_tpu.sparse.bsr import BSR

PAIR_CHUNK = 1 << 22          # pairs per numeric dispatch (~2.1 GB live)


def _symbolic(ai, ap, bi, bp, nbc_out):
    """Host pair enumeration: returns (ia, ib, seg, out_rows, out_cols).

    ia/ib index A.blocks/B.blocks per partial product, ordered so seg
    (the output-block id of each pair) is non-decreasing; out_rows/cols
    give each output block's (block-row, block-col), sorted row-major.
    """
    nbr_a = ap.size - 1
    # A entries sorted by block-column k (CSC-of-blocks view)
    a_rows = np.repeat(np.arange(nbr_a, dtype=np.int64), np.diff(ap))
    order_k = np.argsort(ai, kind="stable")
    a_sorted = order_k.astype(np.int64)          # A block idx by k
    a_row_s = a_rows[order_k]
    k_sorted = ai[order_k].astype(np.int64)
    # per-k counts in A (by column) and B (by row)
    nk = bp.size - 1
    nA_k = np.bincount(k_sorted, minlength=nk)
    nB_k = (bp[1:] - bp[:-1]).astype(np.int64)
    a_start = np.concatenate([[0], np.cumsum(nA_k)])
    P_k = nA_k * nB_k
    offs = np.concatenate([[0], np.cumsum(P_k)])
    P = int(offs[-1])
    if P == 0:
        return (np.zeros(0, np.int64),) * 2 + (np.zeros(0, np.int64),
                                               np.zeros(0, np.int64),
                                               np.zeros(0, np.int64))
    # expand: group g = k value with P_k>0; pair p in group g has
    # local q = p - offs[g]; a_local = q // nB_k, b_local = q % nB_k
    live = np.flatnonzero(P_k)
    grp = np.repeat(live, P_k[live])
    q = np.arange(P, dtype=np.int64) - offs[grp]
    a_loc = q // nB_k[grp]
    b_loc = q - a_loc * nB_k[grp]
    ia = a_sorted[a_start[grp] + a_loc]
    ib = bp[grp] + b_loc
    out_r = a_row_s[a_start[grp] + a_loc]
    out_c = bi[ib].astype(np.int64)
    key = out_r * np.int64(nbc_out) + out_c
    order = np.argsort(key, kind="stable")
    ia, ib, key = ia[order], ib[order], key[order]
    uniq, seg = np.unique(key, return_inverse=True)
    return ia, ib, seg, uniq // nbc_out, uniq % nbc_out


def _perm_mats(bsz: int):
    """Constant one-hot lane-permutation matrices for the flattened
    block product: for each contraction index j,

        (a @ Ma_j)[p, b*i+k] = a[p, b*i+j]      (column-broadcast of A)
        (b @ Mb_j)[p, b*i+k] = b[p, b*j+k]      (row-tile of B)

    so prod = Σ_j (a @ Ma_j) * (b @ Mb_j) is the b×b block matmul with
    every array staying (P, b²)-shaped."""
    bb = bsz * bsz
    Ma = np.zeros((bsz, bb, bb), np.float32)
    Mb = np.zeros((bsz, bb, bb), np.float32)
    for j in range(bsz):
        for i in range(bsz):
            for k in range(bsz):
                Ma[j, bsz * i + j, bsz * i + k] = 1.0
                Mb[j, bsz * j + k, bsz * i + k] = 1.0
    return Ma, Mb


@partial(jax.jit, static_argnames=("n_out", "mxu", "bsz"))
def _numeric_chunk(Ab2, Bb2, ia, ib, seg, acc, n_out: int, mxu: bool,
                   bsz: int = 8):
    """One pair chunk: gather → blocked matmul → segment-sum.

    Every device array stays FLATTENED (·, b²): any rank-3 (·, b, b)
    array on this backend pads each block's trailing dim to 128 lanes
    (16x memory — ResourceExhausted at ~1M pairs) and its lowering
    overflows an internal uint32 offset table past ~100k blocks
    (`Check failed: entries[i] <= uint32_max`, round 5). The b×b block
    product runs as 2·b one-hot (b², b²) lane-permutation matmuls — an
    exact permutation, MXU-contracted over the 64-lane axis."""
    a = Ab2[ia]                                 # (P, b*b)
    b = Bb2[ib]
    Ma, Mb = _perm_mats(bsz)
    prec = jax.lax.Precision.HIGHEST   # one-hot matmuls must stay exact
    terms = []
    for j in range(bsz):
        if mxu:
            aj = jnp.dot(a, jnp.asarray(Ma[j]), precision=prec)
            bj = jnp.dot(b, jnp.asarray(Mb[j]), precision=prec)
        else:
            # static-index lane gathers (no MXU): same permutation
            idx_a = np.nonzero(Ma[j])[0][np.argsort(np.nonzero(Ma[j])[1])]
            idx_b = np.nonzero(Mb[j])[0][np.argsort(np.nonzero(Mb[j])[1])]
            aj = jnp.take(a, jnp.asarray(idx_a), axis=1)
            bj = jnp.take(b, jnp.asarray(idx_b), axis=1)
        terms.append(aj * bj)
    prod = terms[0]
    for t in terms[1:]:
        prod = prod + t
    return acc + jax.ops.segment_sum(
        prod, seg, num_segments=n_out, indices_are_sorted=True)


def spgemm_bsr(A: BSR, B: BSR, mxu: bool = True,
               pair_chunk: int = PAIR_CHUNK) -> BSR:
    """C = A @ B for BSR matrices with equal block size.

    Host symbolic pass (numpy — setup-class, like every container build),
    device numeric pass (gather + batched block matmul + segment-sum),
    chunked over pairs. Returns BSR with row-major sorted blocks.
    """
    if A.shape[1] != B.shape[0]:
        raise ValueError(f"shape mismatch {A.shape} @ {B.shape}")
    if A.b != B.b:
        raise ValueError(f"block size mismatch {A.b} vs {B.b}")
    bsz = A.b
    nbc_out = B.shape[1] // bsz
    ai = np.asarray(A.indices, np.int64)
    ap = np.asarray(A.indptr, np.int64)
    bi = np.asarray(B.indices, np.int64)
    bp = np.asarray(B.indptr, np.int64)
    ia, ib, seg, out_r, out_c = _symbolic(ai, ap, bi, bp, nbc_out)
    n_out = max(int(out_r.size), 1)
    P = ia.size
    if P == 0:
        z = jnp.zeros((1, bsz, bsz), A.blocks.dtype)
        return BSR(blocks=z, indices=jnp.zeros((1,), jnp.int32),
                   indptr=jnp.zeros((A.shape[0] // bsz + 1,), jnp.int32),
                   shape=(A.shape[0], B.shape[1]))
    acc = jnp.zeros((n_out, bsz * bsz), jnp.float32)
    # flatten via HOST: a device reshape (or any op) consuming a rank-3
    # (nblocks, b, b) array past ~100k blocks crashes the TPU lowering
    # (uint32 offset-table overflow — the per-block (8,8) tail pads to an
    # (8,128) tile internally); the 2-D upload lowers cleanly
    Ab2 = jnp.asarray(np.asarray(A.blocks).reshape(-1, bsz * bsz))
    Bb2 = Ab2 if B.blocks is A.blocks else \
        jnp.asarray(np.asarray(B.blocks).reshape(-1, bsz * bsz))
    # fixed-shape chunks would need inert padding pairs; slicing the
    # tail host-side costs at most one extra compilation instead
    for p0 in range(0, P, pair_chunk):
        p1 = min(P, p0 + pair_chunk)
        acc = _numeric_chunk(Ab2, Bb2,
                             jnp.asarray(ia[p0:p1]),
                             jnp.asarray(ib[p0:p1]),
                             jnp.asarray(seg[p0:p1]),
                             acc, n_out=n_out, mxu=mxu, bsz=bsz)
    indptr = np.zeros(A.shape[0] // bsz + 1, np.int64)
    np.add.at(indptr, out_r + 1, 1)
    indptr = np.cumsum(indptr)
    # assemble the rank-3 blocks on the HOST and KEEP them host-side
    # (numpy leaf): device rank-3 (n_out, b, b) arrays at ~1M blocks
    # materialize a 16x-padded layout and their transfer program aborts
    # the TPU compiler (uint32 offset-table overflow) — and the result
    # crosses to the host for any real consumer (scipy gate, file
    # output) anyway. Callers needing device blocks should re-pack
    # (e.g. SBELL.from_scipy(C.to_scipy()) for a follow-up SpMV).
    blocks = np.asarray(acc).reshape(-1, bsz, bsz).astype(A.blocks.dtype)
    return BSR(blocks=blocks,
               indices=jnp.asarray(out_c, jnp.int32),
               indptr=jnp.asarray(indptr, jnp.int32),
               shape=(A.shape[0], B.shape[1]))


def spgemm_bsr_scipy(A_sp, B_sp, block: int = 8, **kw):
    """Convenience: scipy in → (BSR C, scipy C) via spgemm_bsr."""
    A = BSR.from_scipy(A_sp, block=block)
    B = BSR.from_scipy(B_sp, block=block)
    return spgemm_bsr(A, B, **kw)
