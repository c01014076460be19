"""Real-TPU smoke suite: each Pallas kernel compiled + validated once at a
representative size (the full oracle matrix runs on the CPU simulation; this
file guards Mosaic compatibility). Run with LIBHPC_TEST_TPU=1."""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

pytestmark = pytest.mark.skipif(
    os.environ.get("LIBHPC_TEST_TPU") != "1"
    or jax.devices()[0].platform != "tpu",
    reason="real-TPU smoke tests need LIBHPC_TEST_TPU=1",
)


def test_scan_pallas_tpu(rng):
    from libhpc_tpu.ops.scan import exclusive_scan_pallas

    x = rng.random(5000).astype(np.float32)
    got = np.asarray(exclusive_scan_pallas(jnp.asarray(x)))
    ref = (np.cumsum(x.astype(np.float64)) - x).astype(np.float32)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-3)

    xi = rng.integers(0, 1000, 5000).astype(np.int32)
    got = np.asarray(exclusive_scan_pallas(jnp.asarray(xi)))
    np.testing.assert_array_equal(got, np.cumsum(xi) - xi)


def test_histogram_pallas_tpu(rng):
    from libhpc_tpu.ops.histogram import histogram_pallas

    x = rng.integers(0, 256, 3987).astype(np.int32)
    got = np.asarray(histogram_pallas(jnp.asarray(x), 256))
    np.testing.assert_array_equal(got, np.bincount(x, minlength=256))


def test_transpose_pallas_tpu(rng):
    from libhpc_tpu.ops.transpose import transpose_pallas

    x = rng.random((257, 513)).astype(np.float32)
    got = np.asarray(transpose_pallas(jnp.asarray(x)))
    np.testing.assert_array_equal(got, x.T)


def test_row_sum_pallas_tpu(rng):
    from libhpc_tpu.ops.reduce import row_sum_pallas

    x = rng.random((100, 300)).astype(np.float32)
    got = np.asarray(row_sum_pallas(jnp.asarray(x)))
    np.testing.assert_allclose(got, x.sum(axis=1), rtol=1e-4, atol=1e-4)


def test_blur2d_pallas_tpu(rng):
    from libhpc_tpu.ops.stencil import blur2d_pallas
    from test_stencil import naive_blur_x, naive_blur_y

    a = rng.random((300, 129)).astype(np.float32)
    got = np.asarray(blur2d_pallas(jnp.asarray(a), 8, tile_m=64))
    ref = naive_blur_y(naive_blur_x(a, 8), 8)
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-3)


def test_sort_tpu(rng):
    from libhpc_tpu.ops.sort import sort_u32, radix_sort_pipeline

    x = rng.integers(0, 1 << 32, 50_000, dtype=np.uint32)
    np.testing.assert_array_equal(np.asarray(sort_u32(jnp.asarray(x))),
                                  np.sort(x))
    np.testing.assert_array_equal(
        np.asarray(radix_sort_pipeline(jnp.asarray(x))), np.sort(x)
    )


def test_spmv_formats_tpu(rng):
    from libhpc_tpu.bench.matrices import poisson2d
    from libhpc_tpu.sparse import CSR, ELL, DIA, BSR
    from libhpc_tpu.ops import spmv

    A = poisson2d(32)
    x = rng.random(A.shape[1]).astype(np.float32)
    ref = A @ x
    csr = CSR.from_scipy(A)
    np.testing.assert_allclose(np.asarray(spmv.csr_spmv(csr, jnp.asarray(x))),
                               ref, rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(
        np.asarray(spmv.ell_spmv(ELL.from_csr(csr), jnp.asarray(x))), ref,
        rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(
        np.asarray(spmv.dia_spmv(DIA.from_scipy(A), jnp.asarray(x))), ref,
        rtol=1e-3, atol=1e-3)
    bsr = BSR.from_scipy(A, block=8)
    xp = np.zeros(bsr.shape[1], np.float32)
    xp[: A.shape[1]] = x
    got = np.asarray(spmv.bsr_spmv(bsr, jnp.asarray(xp)))[: A.shape[0]]
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-3)


def test_cg_tpu(rng):
    from libhpc_tpu.bench.matrices import poisson2d
    from libhpc_tpu.sparse import DIA
    from libhpc_tpu.ops import solver

    A = poisson2d(16)
    dia = DIA.from_scipy(A)
    x_true = rng.random(A.shape[0]).astype(np.float32)
    b = jnp.asarray(A @ x_true)
    x, it, _ = solver.cg(lambda v: dia @ v, b, tol=1e-5, max_iter=1500)
    assert int(it) < 1500
    np.testing.assert_allclose(np.asarray(x), x_true, rtol=2e-2, atol=2e-2)


def test_merge_sort_tpu(rng):
    from libhpc_tpu.ops.sort_pallas import merge_sort_u32

    # power-of-two chunks and segmented path
    for n in (1 << 17, 200_000):
        x = rng.integers(0, 2**32, size=n, dtype=np.uint32)
        got = np.asarray(merge_sort_u32(jnp.asarray(x)))
        np.testing.assert_array_equal(got, np.sort(x))


def test_merge_argsort_tpu(rng):
    from libhpc_tpu.ops.sort_pallas_kv import merge_argsort_u32

    x = rng.integers(0, 2**32, size=200_000, dtype=np.uint32)
    s, order = merge_argsort_u32(jnp.asarray(x))
    s, order = np.asarray(s), np.asarray(order)
    np.testing.assert_array_equal(s, np.sort(x))
    np.testing.assert_array_equal(x[order], s)


def test_bell_spmv_tpu(rng):
    import scipy.sparse as sps
    from libhpc_tpu.sparse.bell import BELL
    from libhpc_tpu.ops.spmv import bell_spmv

    A = sps.random(512, 512, density=0.02, format="csr",
                   random_state=np.random.RandomState(9)).astype(np.float32)
    bell = BELL.from_scipy(A, block=8)
    x = rng.random(bell.shape[1]).astype(np.float32)
    got = np.asarray(bell_spmv(bell, jnp.asarray(x)))[:512]
    np.testing.assert_allclose(got, A @ x[:512], rtol=2e-4, atol=2e-4)


def test_sell_pallas_tpu(rng):
    from libhpc_tpu.bench import matrices
    from libhpc_tpu.ops.ell_pallas import sell_from_scipy, sell_spmv

    A = matrices.poisson2d(48)
    sp = sell_from_scipy(A)
    x = np.linspace(-1, 1, A.shape[1]).astype(np.float32)
    got = np.asarray(sell_spmv(sp, jnp.asarray(x)))
    np.testing.assert_allclose(got, A @ x, rtol=2e-3, atol=2e-3)


def test_dia_pallas_tpu(rng):
    from libhpc_tpu.bench import matrices
    from libhpc_tpu.ops.dia_pallas import DiaPallas, dia_spmv_pallas
    from libhpc_tpu.sparse import DIA

    A = matrices.poisson2d(96)
    dp = DiaPallas.from_dia(DIA.from_scipy(A), T=1 << 13)
    x = np.linspace(-1, 1, A.shape[1]).astype(np.float32)
    got = np.asarray(dia_spmv_pallas(dp, jnp.asarray(x)))
    np.testing.assert_allclose(got, A @ x, rtol=2e-3, atol=2e-3)


def test_sbell_bf16_tpu(rng):
    from libhpc_tpu.bench import matrices
    from libhpc_tpu.ops.spmv_pallas import sbell_spmv
    from libhpc_tpu.sparse.sbell import SBELL

    A = matrices.block_random(120, block=8, blocks_per_row=5, seed=4,
                              half_band=4, far_fraction=0.03)
    sb16 = SBELL.from_scipy(A).astype_values(jnp.bfloat16)
    x = np.linspace(-1, 1, A.shape[1]).astype(np.float32)
    Aq = A.copy()
    Aq.data = np.asarray(jnp.asarray(A.data).astype(
        jnp.bfloat16).astype(jnp.float32))
    got = np.asarray(sbell_spmv(sb16, jnp.asarray(x)))
    np.testing.assert_allclose(got, Aq @ x, rtol=2e-3, atol=2e-3)
