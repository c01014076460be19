"""SBELL Pallas SpMV tests (CPU interpret mode; TPU via bench/smoke).

Oracle style follows the reference's stage tests (SURVEY.md §4.1):
scipy dense matvec as ground truth, edge sizes spanning sub-tile,
non-multiple, and multi-stripe scales.
"""

import numpy as np
import pytest
import scipy.sparse as sps

import jax.numpy as jnp

from libhpc_tpu.bench import matrices
from libhpc_tpu.ops.spmv_pallas import sbell_spmv
from libhpc_tpu.sparse.sbell import SBELL


def _check(A, rtol=1e-4, atol=1e-5):
    sb = SBELL.from_scipy(A)
    x = np.linspace(-1.0, 1.0, A.shape[1]).astype(np.float32)
    y = np.asarray(sbell_spmv(sb, jnp.asarray(x)))
    y_ref = A @ x
    np.testing.assert_allclose(y, y_ref, rtol=rtol, atol=atol)
    return sb


@pytest.mark.parametrize("n", [8, 64, 1000, 1024, 1048, 2500])
def test_sbell_random_sizes(rng, n):
    A = sps.random(n, n, density=min(0.05, 2000 / (n * n) + 0.001),
                   format="csr", dtype=np.float32, random_state=42)
    A.setdiag(1.0)
    _check(A)


def test_sbell_rect():
    A = sps.random(500, 1300, density=0.01, format="csr",
                   dtype=np.float32, random_state=7)
    _check(A)


def test_sbell_block_structured(rng):
    A = matrices.block_random(400, block=8, blocks_per_row=8, seed=3,
                              far_fraction=0.0)
    sb = _check(A)
    # purely banded: the bulk rides the kernel path; only sub-MIN_OCCUPANCY
    # slivers (tail-stripe slices, stray deep slices) may route far
    assert sb.far_fraction < 0.02
    # on a tiny 4-stripe matrix the tail stripe is a large fraction, so its
    # slot padding inflates fill; large matrices (cant/pwtk) sit near 1.1
    assert sb.fill_ratio(A.nnz) < 2.2


def test_sbell_far_split(rng):
    """Scattered blocks route to the far path; banded bulk stays on the
    kernel path; the sum is still exact."""
    A = matrices.block_random(400, block=8, blocks_per_row=8, seed=3,
                              far_fraction=0.3)
    sb = _check(A)
    assert sb.far is not None
    assert 0.0 < sb.far_fraction < 0.5


def test_sbell_poisson():
    A = matrices.poisson2d(64)
    _check(A)


def test_sbell_multi_pane_spread(rng):
    """Columns scattered across many panes (far blocks) — exercises the
    greedy tile cut and per-tile dynamic pane windows."""
    n = 6000
    rows = np.repeat(np.arange(n), 3)
    cols = np.concatenate([
        np.arange(n),                                  # diagonal
        (np.arange(n) * 977) % n,                      # pseudo-random far
        (np.arange(n) * 31 + 17) % n,
    ])
    vals = np.ones_like(cols, dtype=np.float32)
    A = sps.coo_matrix((vals, (rows, cols)), shape=(n, n)).tocsr()
    A.sum_duplicates()
    _check(A)


def test_sbell_empty_rows():
    A = sps.csr_matrix((1024, 1024), dtype=np.float32)
    A[5, 7] = 2.0
    A = A.tocsr()
    sb = SBELL.from_scipy(A)
    x = np.arange(1024, dtype=np.float32)
    y = np.asarray(sbell_spmv(sb, jnp.asarray(x)))
    assert y[5] == 14.0
    assert np.count_nonzero(y) == 1


def test_sbell_duplicate_block_cols():
    """Multiple slots with the same (row, col) accumulate additively."""
    A = sps.csr_matrix(
        (np.array([1.0, 2.0, 3.0], np.float32),
         (np.array([0, 0, 0]), np.array([0, 200, 4000]))),
        shape=(128, 8192))
    _check(A)


def test_sbell_chunked_forced(monkeypatch):
    """VMEM-cliff guard (VERDICT r2 #5): force the chunked path with a tiny
    cap and check it matches the resident path and the scipy oracle."""
    from libhpc_tpu.ops import spmv_pallas

    A = matrices.block_random(2000, block=8, blocks_per_row=6, seed=5,
                              half_band=4, far_fraction=0.02)
    sb = SBELL.from_scipy(A)
    x = jnp.asarray(np.linspace(-1, 1, A.shape[1]).astype(np.float32))
    y_res = np.asarray(sbell_spmv(sb, x))
    # cap chosen above the single-stripe minimum (the spc=1 guard fires
    # below ~45 KB for any matrix) but far below this matrix's resident
    # footprint, so the plan must split into several chunks
    assert spmv_pallas._resident_bytes(sb.n_stripes, sb.n_panes) > 60_000
    monkeypatch.setattr(spmv_pallas, "VMEM_CAP", 60_000)
    sb2 = SBELL.from_scipy(A)   # fresh object (no cached plan)
    y_chk = np.asarray(sbell_spmv(sb2, x))
    np.testing.assert_allclose(y_chk, A @ np.asarray(x), rtol=1e-4,
                               atol=1e-5)
    # chunked runs the XLA far fallback, resident the Pallas far kernel
    # (ops/far_pallas.py) — same values, different accumulation order
    np.testing.assert_allclose(y_chk, y_res, rtol=1e-4, atol=1e-6)
    spc, win, tiles_max, bounds = spmv_pallas._chunk_plan(sb2)
    assert len(bounds) > 1      # actually chunked


@pytest.mark.slow
def test_sbell_chunked_2m_cols(monkeypatch):
    """>2M columns through the guard (the former scale cliff): a banded
    block matrix at 2.1M rows/cols, modest cap so the pane+output budget
    trips, oracle-checked on a spot of rows via scipy."""
    from libhpc_tpu.ops import spmv_pallas

    n_rows = 2_101_248            # > 2M, multiple of 1024
    # thin banded matrix built directly in BSR form (vectorized; the
    # block_random python loop is too slow at this scale)
    nbr = n_rows // 8
    rs = np.random.RandomState(11)
    bpr = 2
    cols = np.clip(np.arange(nbr)[:, None]
                   + np.stack([np.zeros(nbr, np.int64),
                               rs.randint(-4, 5, nbr)], axis=1),
                   0, nbr - 1)
    cols.sort(axis=1)
    data = rs.standard_normal((nbr * bpr, 8, 8)).astype(np.float32) * 0.1
    indptr = np.arange(nbr + 1, dtype=np.int64) * bpr
    A = sps.bsr_matrix((data, cols.reshape(-1), indptr),
                       shape=(n_rows, n_rows)).tocsr()
    A.sum_duplicates()

    monkeypatch.setattr(spmv_pallas, "VMEM_CAP", 4 * 1024 * 1024)
    sb = SBELL.from_scipy(A)
    assert spmv_pallas._resident_bytes(sb.n_stripes, sb.n_panes) \
        > spmv_pallas.VMEM_CAP
    x = jnp.asarray(rs.standard_normal(n_rows).astype(np.float32))
    y = np.asarray(sbell_spmv(sb, x))
    y_ref = A @ np.asarray(x)
    np.testing.assert_allclose(y, y_ref, rtol=2e-3, atol=2e-3)


def test_sbell_spmv_padded_domain():
    """Padded-domain variant: pad cols are zeros, pad rows inert; result
    matches the public op and the scipy oracle on the true rows."""
    from libhpc_tpu.ops.spmv_pallas import sbell_spmv_padded

    A = matrices.block_random(150, block=8, blocks_per_row=5, seed=9,
                              half_band=5, far_fraction=0.05)
    sb = SBELL.from_scipy(A)
    m, n = A.shape
    x = np.linspace(-1, 1, n).astype(np.float32)
    xpad = jnp.asarray(np.pad(x, (0, sb.n_panes * 1024 - n)))
    ypad = np.asarray(sbell_spmv_padded(sb, xpad))
    assert ypad.shape[0] == sb.n_stripes * 1024
    np.testing.assert_allclose(ypad[:m], A @ x, rtol=1e-4, atol=1e-5)
    assert np.all(ypad[m:] == 0.0)
    y_pub = np.asarray(sbell_spmv(sb, jnp.asarray(x)))
    np.testing.assert_allclose(ypad[:m], y_pub, rtol=1e-6, atol=1e-7)


def test_sbell_spmv_panes_chain():
    """Pane-resident chained form: matches the flat API, and chaining
    y->x through the pane layout equals two flat matvecs (A @ (A @ x))."""
    from libhpc_tpu.ops.spmv_pallas import (panes_to_x, sbell_spmv_panes,
                                            x_to_panes)

    A = matrices.block_random(260, block=8, blocks_per_row=5, seed=13,
                              half_band=5, far_fraction=0.04)
    m, n = A.shape
    assert m == n
    sb = SBELL.from_scipy(A)
    x = np.linspace(-1, 1, n).astype(np.float32)
    xpad = np.pad(x, (0, sb.n_panes * 1024 - n))
    x3 = x_to_panes(sb, jnp.asarray(xpad))
    o3 = sbell_spmv_panes(sb, x3)
    assert o3.shape[0] == sb.n_stripes + 2   # guarded output
    assert np.all(np.asarray(o3[sb.n_stripes:]) == 0.0)
    y = np.asarray(panes_to_x(sb, o3))[:m]
    np.testing.assert_allclose(y, A @ x, rtol=1e-4, atol=1e-5)
    # chain: second application without leaving pane layout — the guarded
    # output IS the next guarded x, zero wrapper ops
    o6 = sbell_spmv_panes(sb, o3)
    y2 = np.asarray(panes_to_x(sb, o6))[:m]
    Ap = A.copy(); Ap.resize((sb.n_stripes * 1024, sb.n_panes * 1024))
    np.testing.assert_allclose(y2, (Ap @ (Ap @ xpad))[:m], rtol=1e-3,
                               atol=1e-4)


def test_sbell_chunk_plan_single_stripe_guard(monkeypatch):
    """VERDICT r3 #7: when even a single stripe's pane window busts the
    VMEM cap, the chunk planner fails with a clear error naming the
    stripe and the required bytes — never a raw Mosaic failure."""
    from libhpc_tpu.ops import spmv_pallas

    # one stripe (128 rows), 32 slices spaced ~40 panes apart: every
    # slice keeps its 128-row column cluster (>= MIN_OCCUPANCY), so the
    # stripe's tiles span ~1240 panes — wider than any spc can fix
    rows = np.tile(np.arange(128), 32)
    slice_id = np.repeat(np.arange(32), 128)
    cols = slice_id * 40 * 1024 + (rows * 8) % 1024
    A = sps.coo_matrix(
        (np.ones(rows.size, np.float32), (rows, cols)),
        shape=(128, int(cols.max()) + 1)).tocsr()
    sb = SBELL.from_scipy(A)
    assert sb.n_stripes == 1
    monkeypatch.setattr(spmv_pallas, "VMEM_CAP", 4 * 1024 * 1024)
    assert spmv_pallas._resident_bytes(sb.n_stripes, sb.n_panes) \
        > spmv_pallas.VMEM_CAP
    with pytest.raises(ValueError, match="stripe 0 alone needs"):
        spmv_pallas._chunk_plan(sb)
    # the public op surfaces the same clear error
    x = jnp.zeros((A.shape[1],), jnp.float32)
    with pytest.raises(ValueError, match="VMEM"):
        sbell_spmv(sb, x)


def test_sbell_bf16_values():
    """bf16 value-stream variant (ROADMAP #7): matches the bf16-QUANTIZED
    operator tightly (the kernel accumulates f32) and the f32 operator
    within bf16's value-rounding bound."""
    A = matrices.block_random(260, block=8, blocks_per_row=6, seed=21,
                              half_band=5, far_fraction=0.05)
    sb16 = SBELL.from_scipy(A).astype_values(jnp.bfloat16)
    assert sb16.vflat.dtype == jnp.bfloat16
    x = np.linspace(-1.0, 1.0, A.shape[1]).astype(np.float32)
    y = np.asarray(sbell_spmv(sb16, jnp.asarray(x)))
    # exact-layout oracle: the uniformly bf16-quantized operator applied
    # in f32 — the kernel accumulates f32, so this matches tightly
    Aq = A.copy()
    Aq.data = np.asarray(
        jnp.asarray(A.data).astype(jnp.bfloat16).astype(jnp.float32))
    y_q = Aq @ x
    y_f = A @ x
    scale = np.max(np.abs(y_f)) + 1e-30
    np.testing.assert_allclose(y, y_q, rtol=1e-4, atol=1e-4)
    # vs the f32 operator: bounded by bf16's 2^-8 value rounding
    assert np.max(np.abs(y - y_f)) / scale < 2e-2
    # bf16 stream must be half the f32 stream on the value term
    sb32 = SBELL.from_scipy(A)
    assert sb16.hbm_bytes < sb32.hbm_bytes
    assert sb16.vflat.size * 2 == sb16.vflat.size * sb16.vflat.dtype.itemsize


def test_sbell_bf16_chunked(monkeypatch):
    """bf16 variant through the row-chunked kernel path."""
    from libhpc_tpu.ops import spmv_pallas

    A = matrices.block_random(2000, block=8, blocks_per_row=6, seed=22,
                              half_band=4, far_fraction=0.0)
    monkeypatch.setattr(spmv_pallas, "VMEM_CAP", 60_000)
    sb16 = SBELL.from_scipy(A).astype_values(jnp.bfloat16)
    x = np.linspace(-1.0, 1.0, A.shape[1]).astype(np.float32)
    y = np.asarray(sbell_spmv(sb16, jnp.asarray(x)))
    Aq = A.copy()
    Aq.data = np.asarray(
        jnp.asarray(A.data).astype(jnp.bfloat16).astype(jnp.float32))
    np.testing.assert_allclose(y, Aq @ x, rtol=1e-4, atol=1e-4)
