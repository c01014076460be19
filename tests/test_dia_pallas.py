"""Pallas DIA SpMV tests — scipy oracles, offset/size edge sweep."""

import numpy as np
import pytest
import scipy.sparse as sps

import jax.numpy as jnp

from libhpc_tpu.bench import matrices
from libhpc_tpu.ops.dia_pallas import DiaPallas, dia_spmv_pallas
from libhpc_tpu.sparse import DIA


def _check(A, T=1 << 13, rtol=1e-4, atol=1e-4):
    dia = DIA.from_scipy(A)
    dp = DiaPallas.from_dia(dia, T=T)
    x = np.linspace(-1.0, 1.0, A.shape[1]).astype(np.float32)
    y = np.asarray(dia_spmv_pallas(dp, jnp.asarray(x)))
    np.testing.assert_allclose(y, A @ x, rtol=rtol, atol=atol)
    return dp


@pytest.mark.parametrize("n", [1000, 8192, 9000, 40000])
def test_dia_pallas_banded(n):
    A = sps.diags(
        [np.full(n - abs(o), 1.0 + o) for o in (-70, -1, 0, 1, 65)],
        [-70, -1, 0, 1, 65], shape=(n, n), format="csr",
        dtype=np.float32)
    _check(A)


def test_dia_pallas_poisson():
    _check(matrices.poisson2d(96))     # +-96 offsets: multi-row shifts


def test_dia_pallas_wide_offsets():
    n = 50000
    A = sps.diags([np.ones(n - 9000), np.ones(n), np.ones(n - 12288)],
                  [-9000, 0, 12288], shape=(n, n), format="csr",
                  dtype=np.float32)
    _check(A)


def test_dia_pallas_multi_tile():
    # several tiles with lane-unaligned offsets crossing tile seams
    _check(matrices.poisson2d(128), T=1 << 13)


def test_dia_pallas_rect():
    m, n = 5000, 7000
    A = sps.diags([np.ones(5000), np.ones(5000)], [0, 1500],
                  shape=(m, n), format="csr", dtype=np.float32)
    _check(A)


def test_dia_pallas_wide_rect():
    """ncols far beyond the diagonals' reach (regression: negative pad)."""
    m, n = 1000, 200000
    A = sps.diags([np.ones(m)], [0], shape=(m, n), format="csr",
                  dtype=np.float32)
    _check(A)


def test_dia_pattern_probe_matches_model():
    """The speed-of-light probe must touch the same operands as the
    kernel and produce a deterministic, finite result: out = sum of
    diagonal planes + two window reads (an exact oracle in numpy)."""
    import jax.numpy as jnp

    from libhpc_tpu.ops.dia_pallas import (DiaPallas, dia_pattern_probe,
                                           LANE)
    from libhpc_tpu.sparse import DIA

    A = matrices.poisson2d(64)
    dp = DiaPallas.from_dia(DIA.from_scipy(A), T=1 << 12)
    n = A.shape[1]
    x = np.linspace(-1, 1, n).astype(np.float32)
    out = np.asarray(dia_pattern_probe(dp, jnp.asarray(x)))
    assert np.isfinite(out).all()
    # oracle: per tile g, acc = xs[0:Tr] + xs[sr:sr+Tr] + sum_d planes
    D = len(dp.coffs)
    Tr = dp.T // LANE
    sr = dp.span_pad // LANE
    n_tiles = dp.n_tiles
    L = max(dp.x_pad_lo + n_tiles * dp.T + dp.span_pad,
            -(-(dp.x_pad_lo + n) // LANE) * LANE)
    xe = np.zeros(L, np.float32)
    xe[dp.x_pad_lo:dp.x_pad_lo + n] = x
    x2 = xe.reshape(-1, LANE)
    dflat = np.asarray(dp.dflat).reshape(n_tiles, D, Tr, LANE)
    for g in range(n_tiles):
        exp = (x2[g * Tr:g * Tr + Tr]
               + x2[g * Tr + sr:g * Tr + sr + Tr]
               + dflat[g].sum(axis=0))
        np.testing.assert_allclose(out[g * Tr:(g + 1) * Tr], exp,
                                   rtol=1e-5, atol=1e-5)
