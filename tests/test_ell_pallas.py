"""SELL (Pallas scalar-ELL) tests — scipy dense matvec oracles with the
reference's edge-size style sweep (SURVEY.md §4.1)."""

import numpy as np
import pytest
import scipy.sparse as sps

import jax.numpy as jnp

from libhpc_tpu.bench import matrices
from libhpc_tpu.ops.ell_pallas import SELL, sell_from_scipy, sell_spmv


def _check(A, rtol=1e-4, atol=1e-5, W=3):
    sp = sell_from_scipy(A, W=W)
    x = np.linspace(-1.0, 1.0, A.shape[1]).astype(np.float32)
    y = np.asarray(sell_spmv(sp, jnp.asarray(x)))
    np.testing.assert_allclose(y, A @ x, rtol=rtol, atol=atol)
    return sp


@pytest.mark.parametrize("n", [8, 111, 1000, 1024, 1048, 2500])
def test_sell_banded_sizes(n):
    A = sps.diags([np.full(n - abs(k), 1.0 + k) for k in (-2, -1, 0, 1, 3)],
                  [-2, -1, 0, 1, 3], shape=(n, n), format="csr",
                  dtype=np.float32)
    _check(A)


def test_sell_poisson():
    _check(matrices.poisson2d(48))     # ±48 offdiagonals cross sublanes


def test_sell_poisson_pane_crossing():
    # ±1024-class offsets: slice windows span 2 panes (the W>1 passes)
    _check(matrices.poisson2d(64))


def test_sell_rect():
    # 1300 cols span 2 panes, so this matrix must always build (a raise
    # here is a regression in rectangular SELL support, not a skip)
    A = sps.random(500, 1300, density=0.01, format="csr",
                   dtype=np.float32, random_state=7).tocsr()
    _check(A, W=3)


def test_sell_irregular_row_lengths(rng):
    # rows with 0..7 entries, columns within a narrow band
    n = 3000
    rows, cols, vals = [], [], []
    for r in range(n):
        k = r % 8
        for i in range(k):
            rows.append(r)
            cols.append(min(n - 1, max(0, r + i - 3)))
            vals.append(float(i + 1))
    A = sps.coo_matrix((vals, (rows, cols)), shape=(n, n)).tocsr()
    A.sum_duplicates()
    _check(A)


def test_sell_wide_scatter_raises():
    # one entry per row at column 37*r: slice 0's columns span panes 0..4
    # (> W=3), which the window kernel cannot serve
    rows = np.arange(128)
    A = sps.coo_matrix(
        (np.ones(128, np.float32), (rows, rows * 37)),
        shape=(128, 8 * 1024)).tocsr()
    with pytest.raises(ValueError, match="SBELL"):
        sell_from_scipy(A)


def test_sell_empty_and_zero_rows():
    A = sps.csr_matrix((2048, 2048), dtype=np.float32)
    A[5, 7] = 2.0
    A[2000, 1999] = -3.0
    sp = sell_from_scipy(A.tocsr())
    x = np.arange(2048, dtype=np.float32)
    y = np.asarray(sell_spmv(sp, jnp.asarray(x)))
    assert y[5] == 14.0
    assert y[2000] == -3.0 * 1999
    assert np.count_nonzero(y) == 2


def test_sell_chains_pane_layout():
    """Output row layout == x pane layout: A @ (A @ x) via two kernel
    calls matches scipy."""
    A = matrices.poisson2d(48)
    sp = sell_from_scipy(A)
    x = np.linspace(-1, 1, A.shape[1]).astype(np.float32)
    y2 = np.asarray(sell_spmv(sp, sell_spmv(sp, jnp.asarray(x))))
    np.testing.assert_allclose(y2, A @ (A @ x), rtol=1e-3, atol=1e-3)
