"""auto_format picks the measured-fastest container per structure."""

import numpy as np
import scipy.sparse as sps

import jax.numpy as jnp

from libhpc_tpu.bench import matrices
from libhpc_tpu.sparse.auto import auto_format


def _roundtrip(A):
    c, mv = auto_format(A)
    x = np.linspace(-1, 1, A.shape[1]).astype(np.float32)
    y = np.asarray(mv(c, jnp.asarray(x)))
    np.testing.assert_allclose(y, A @ x, rtol=2e-3, atol=2e-3)
    return c


def test_auto_poisson_is_dia():
    from libhpc_tpu.sparse.dia import DIA

    c = _roundtrip(matrices.poisson2d(64))
    assert isinstance(c, DIA)


def test_auto_fem_is_sbell():
    from libhpc_tpu.sparse.sbell import SBELL

    A = matrices.block_random(200, block=8, blocks_per_row=6, seed=2,
                              half_band=5, far_fraction=0.05)
    c = _roundtrip(A)
    assert isinstance(c, SBELL)


def test_auto_irregular_banded_is_sell():
    from libhpc_tpu.ops.ell_pallas import SELL

    # many distinct diagonals (not DIA-able), narrow band, regular-ish
    n = 4000
    rng = np.random.default_rng(0)
    rows = np.repeat(np.arange(n), 4)
    cols = np.clip(rows + rng.integers(-120, 121, rows.size), 0, n - 1)
    A = sps.coo_matrix((np.ones(rows.size, np.float32), (rows, cols)),
                       shape=(n, n)).tocsr()
    A.sum_duplicates()
    c = _roundtrip(A)
    assert isinstance(c, SELL)


def test_auto_bf16():
    A = matrices.block_random(150, block=8, blocks_per_row=5, seed=3,
                              half_band=4)
    c, mv = auto_format(A, prefer_bf16=True)
    assert c.vflat.dtype == jnp.bfloat16
    x = np.linspace(-1, 1, A.shape[1]).astype(np.float32)
    Aq = A.copy()
    Aq.data = np.asarray(jnp.asarray(A.data).astype(
        jnp.bfloat16).astype(jnp.float32))
    np.testing.assert_allclose(np.asarray(mv(c, jnp.asarray(x))), Aq @ x,
                               rtol=2e-3, atol=2e-3)
