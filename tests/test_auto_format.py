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
    # few random nnz/row in a band: SELL-P's (pane, sublane) buckets
    # fragment (measured fill 12.4 here) — the chooser falls back to the
    # rotation-gather SELL, which packs any within-window structure
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


def test_auto_scattered_dia_candidate_not_densified():
    """A few-diagonal matrix whose diagonals are nearly EMPTY must not
    build the dense m*D DIA rectangle (ADVICE r4: gate on diagonal fill,
    not just distinct-diagonal count)."""
    from libhpc_tpu.sparse.dia import DIA
    from libhpc_tpu.ops.dia_pallas import DiaPallas

    n = 200_000
    rng = np.random.default_rng(1)
    # ~3 nnz per diagonal scattered along 8 long offsets -> fill ~1e-5
    offs = np.array([0, 17, -9931, 45001, -120007, 8888, 3, -1])
    rows, cols = [], []
    for o in offs:
        r = rng.integers(max(0, -o), min(n, n - o), 40)
        rows.append(r)
        cols.append(r + o)
    rows = np.concatenate(rows)
    cols = np.concatenate(cols)
    A = sps.coo_matrix((np.ones(rows.size, np.float32), (rows, cols)),
                       shape=(n, n)).tocsr()
    A.sum_duplicates()
    c, mv = auto_format(A)
    assert not isinstance(c, (DIA, DiaPallas))


def test_auto_large_scattered_no_memory_blowup():
    """>=10M-nnz scattered matrix: the chooser must not host-densify
    (the old A.tobsr((8,8)) path cost up to 64x memory — VERDICT r4 #7).
    Peak traced via resource.getrusage RSS delta staying far below the
    64x-densified size (~2.6 GB for this matrix)."""
    import resource

    n = 2_000_000
    rng = np.random.default_rng(7)
    nnz = 10_000_000
    rows = rng.integers(0, n, nnz)
    cols = rng.integers(0, n, nnz)
    A = sps.coo_matrix((np.ones(nnz, np.float32), (rows, cols)),
                       shape=(n, n)).tocsr()
    A.sum_duplicates()
    rss0 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    # chooser must run its heuristics without densifying; we don't need
    # the (huge) container itself — patch the terminal constructors to
    # observe the ROUTE only
    import libhpc_tpu.sparse.auto as auto_mod

    route = {}

    class _Stop(Exception):
        pass

    import libhpc_tpu.sparse.sbell as sbell_mod
    import libhpc_tpu.ops.ell_pallas as ell_mod

    orig_sbell = sbell_mod.SBELL.from_scipy
    orig_sell = ell_mod.sell_from_scipy

    def stop_sbell(*a, **k):
        route["fmt"] = "sbell"
        raise _Stop

    def stop_sell(*a, **k):
        route["fmt"] = "sell"
        raise _Stop

    sbell_mod.SBELL.from_scipy = staticmethod(stop_sbell)
    ell_mod.sell_from_scipy = stop_sell
    try:
        try:
            auto_mod.auto_format(A)
        except _Stop:
            pass
    finally:
        sbell_mod.SBELL.from_scipy = staticmethod(orig_sbell)
        ell_mod.sell_from_scipy = orig_sell
    rss1 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    # heuristic phase must stay under ~600 MB of new RSS (the densified
    # BSR alone would be ~2.6 GB)
    assert (rss1 - rss0) * 1024 < 600 * 1024 * 1024
    # the chooser reached a terminal constructor (SELL probe fires first
    # for non-blockish input; real sell_from_scipy would reject the wide
    # windows and fall through to SBELL)
    assert route.get("fmt") in ("sbell", "sell")
