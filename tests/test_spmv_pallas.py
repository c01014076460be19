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
