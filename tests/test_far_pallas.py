"""FarPane kernel tests (ops/far_pallas.py, round 5).

The far contribution is validated three ways: Pallas kernel vs the XLA
fallback form vs a scipy-constructed far-only operator (stage-vs-oracle,
SURVEY.md §4.1)."""

import numpy as np
import scipy.sparse as sps
import jax.numpy as jnp

from libhpc_tpu.bench import matrices
from libhpc_tpu.ops.far_pallas import (far_pane_out_panes,
                                       far_pane_out_panes_xla)
from libhpc_tpu.ops.spmv_pallas import x_to_panes
from libhpc_tpu.sparse.sbell import B, LANE, SBELL, W_PANES, FarPane


def _far_oracle(sb, A, x):
    """Scipy far-only operator: full A minus the near-kernel part equals
    the far part; compute via total - near."""
    from libhpc_tpu.ops.spmv_pallas import _sbell_call

    x3 = x_to_panes(sb, jnp.pad(
        jnp.asarray(x), (0, sb.n_panes * 1024 - A.shape[1])))
    near = np.asarray(_sbell_call(
        (sb.pane, sb.sid, sb.vflat, sb.meta, x3),
        sb.n_tiles, sb.n_stripes, sb.n_panes, sb.tpb))
    guarded = (sb.n_stripes + W_PANES - 1) * B
    ypad = np.zeros(sb.n_stripes * 1024, np.float32)
    ypad[:A.shape[0]] = A @ x
    total = ypad.reshape(sb.n_stripes, LANE, B).transpose(0, 2, 1) \
        .reshape(sb.n_stripes * B, LANE)
    far_ref = total - near[:sb.n_stripes * B]
    return x3, far_ref, guarded


def _build(far_fraction=0.05, n_block_rows=260, seed=21):
    A = matrices.block_random(n_block_rows, block=8, blocks_per_row=6,
                              seed=seed, half_band=5,
                              far_fraction=far_fraction)
    sb = SBELL.from_scipy(A)
    assert isinstance(sb.far, FarPane)
    return A, sb


def test_far_pane_kernel_vs_oracle():
    A, sb = _build()
    x = np.linspace(-1, 1, A.shape[1]).astype(np.float32)
    x3, far_ref, guarded = _far_oracle(sb, A, x)
    got = np.asarray(far_pane_out_panes(sb.far, x3, guarded))
    np.testing.assert_allclose(got[:sb.n_stripes * B], far_ref,
                               rtol=1e-4, atol=1e-4)
    # guard rows are zero
    assert np.allclose(got[sb.n_stripes * B:], 0.0)


def test_far_pane_xla_fallback_matches_kernel():
    A, sb = _build(seed=5)
    x = np.linspace(-1, 1, A.shape[1]).astype(np.float32)
    x3, _, guarded = _far_oracle(sb, A, x)
    k = np.asarray(far_pane_out_panes(sb.far, x3, guarded))
    f = np.asarray(far_pane_out_panes_xla(sb.far, x3, guarded))
    np.testing.assert_allclose(k, f, rtol=1e-5, atol=1e-6)


def test_far_pane_multi_pane_stripe():
    """Entries of one stripe scattered over many panes exercise the
    distinct-pane select loop (D > 1)."""
    rows = np.arange(128, dtype=np.int64) * 8          # block rows 0..127
    cols = (np.arange(128, dtype=np.int64) * 977) % 2000
    A = sps.coo_matrix(
        (np.linspace(1, 2, 128 * 1, dtype=np.float32),
         (rows, cols * 8)), shape=(1024, 2048 * 8)).tocsr()
    sb = SBELL.from_scipy(A)
    x = np.linspace(-1, 1, A.shape[1]).astype(np.float32)
    y = np.asarray(
        __import__("libhpc_tpu.ops.spmv_pallas",
                   fromlist=["sbell_spmv"]).sbell_spmv(sb, jnp.asarray(x)))
    np.testing.assert_allclose(y, A @ x, rtol=1e-4, atol=1e-4)


def test_far_pane_bf16_cast():
    A, sb = _build(seed=9)
    sb16 = sb.astype_values(jnp.bfloat16)
    assert sb16.far.bt.dtype == jnp.bfloat16
    assert sb16.far.oh.dtype == jnp.float32   # one-hot stays exact
    Aq = A.copy()
    Aq.data = np.asarray(
        jnp.asarray(A.data).astype(jnp.bfloat16).astype(jnp.float32))
    x = np.linspace(-1, 1, A.shape[1]).astype(np.float32)
    from libhpc_tpu.ops.spmv_pallas import sbell_spmv

    y = np.asarray(sbell_spmv(sb16, jnp.asarray(x)))
    np.testing.assert_allclose(y, Aq @ x, rtol=1e-4, atol=1e-4)


def test_far_pane_builder_invariants():
    A, sb = _build(seed=13)
    fp = sb.far
    ep = np.asarray(fp.ep)
    panes = np.asarray(fp.panes)
    oh = np.asarray(fp.oh).reshape(fp.n_grouped, fp.e_pad, LANE)
    # every live entry's pane appears in its stripe's distinct-pane list
    for s in range(fp.n_grouped):
        live = ep[s] >= 0
        assert set(ep[s][live]) <= set(panes[s])
    # one-hot rows: exactly one lane per live entry, zero elsewhere
    n_live = int((ep >= 0).sum())
    assert int(oh.sum()) == n_live == fp.n_real
    # grid-step padding: n_grouped divisible by FAR_SPS
    from libhpc_tpu.sparse.sbell import FAR_SPS

    assert fp.n_grouped % FAR_SPS == 0
