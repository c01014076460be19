"""SELL-P (per-row-sourced plane ELL) tests — the round-5 SELL redesign.

Oracle: scipy matvec, same strategy as test_ell_pallas / the reference's
stage-vs-CPU-oracle style (SURVEY.md §4.1)."""

import numpy as np
import pytest
import scipy.sparse as sps
import jax.numpy as jnp

from libhpc_tpu.bench import matrices
from libhpc_tpu.ops.sellp import SELLP, sellp_from_scipy, sellp_spmv


def _check(A, fill_below=None):
    A = sps.csr_matrix(A, dtype=np.float32)
    sp = sellp_from_scipy(A)
    x = np.linspace(-1.0, 1.0, A.shape[1]).astype(np.float32)
    y = np.asarray(sellp_spmv(sp, jnp.asarray(x)))
    np.testing.assert_allclose(y, A @ x, rtol=1e-4, atol=1e-4)
    if fill_below is not None:
        assert sp.fill_ratio(A.nnz) < fill_below
    return sp


def test_sellp_poisson():
    # diagonal structure packs near-perfectly at scale (fill 1.00 at
    # Poisson-1024^2); at 96^2 the ±96 offsets split each (pane, jp)
    # bucket 3 ways and stripe/pane boundaries fragment the per-pane
    # tiles — small-matrix fill stays bounded but not tight
    _check(matrices.poisson2d(96), fill_below=3.0)


def test_sellp_banded_offsets():
    n = 9000
    A = sps.diags([np.ones(n - k) for k in (0, 1, 2, 3)], [0, -1, 2, 17],
                  shape=(n, n), format="csr")
    _check(A, fill_below=2.5)


def test_sellp_fem_blocks():
    A = matrices.block_random(300, block=8, blocks_per_row=5, seed=3,
                              half_band=4, far_fraction=0.02)
    _check(A, fill_below=4.0)


def test_sellp_no_window_restriction():
    """Round-4 SELL raised on >W-pane scatter; SELL-P addresses any
    absolute pane per tile row."""
    n = 8192
    rng = np.random.default_rng(8)
    rows = np.arange(n).repeat(2)
    cols = np.concatenate([np.arange(n)[:, None],
                           rng.integers(0, n, (n, 1))], axis=1).ravel()
    A = sps.coo_matrix((np.ones(rows.size, np.float32), (rows, cols)),
                       shape=(n, n)).tocsr()
    A.sum_duplicates()
    _check(A)


def test_sellp_rectangular_and_ragged():
    A = sps.random(1111, 2222, density=0.004, random_state=6,
                   format="csr", dtype=np.float32)
    _check(A)


def test_sellp_empty_rows_and_multiplicity():
    """Rows with repeated (pane, sublane) targets split into extra
    units; empty stripes are skipped."""
    n = 4096
    rows = np.concatenate([np.zeros(20, np.int64),
                           np.arange(2048, 2068, dtype=np.int64)])
    cols = np.concatenate([np.arange(0, 160, 8, dtype=np.int64),
                           np.arange(0, 160, 8, dtype=np.int64)])
    vals = np.linspace(1, 2, rows.size).astype(np.float32)
    A = sps.coo_matrix((vals, (rows, cols)), shape=(n, n)).tocsr()
    _check(A)


def test_sellp_chains_with_pane_layout():
    """Output in pane order equals the next matvec's x panes (square)."""
    A = matrices.poisson2d(64)
    sp = sellp_from_scipy(A)
    x = np.linspace(-1, 1, A.shape[1]).astype(np.float32)
    y1 = np.asarray(sellp_spmv(sp, jnp.asarray(x)))
    y2 = np.asarray(sellp_spmv(sp, jnp.asarray(y1)))
    np.testing.assert_allclose(y2, A @ (A @ x), rtol=1e-3, atol=1e-3)


def test_sellp_vmem_guard(monkeypatch):
    from libhpc_tpu.ops import spmv_pallas

    A = matrices.poisson2d(96)
    sp = sellp_from_scipy(A)
    monkeypatch.setattr(spmv_pallas, "VMEM_CAP", 1024)
    with pytest.raises(ValueError, match="VMEM"):
        sellp_spmv(sp, jnp.zeros((A.shape[1],), jnp.float32))
