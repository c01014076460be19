"""Container tests — oracle: scipy.sparse (SURVEY.md §4 takeaway 1)."""

import numpy as np
import pytest
import scipy.sparse as sps
import jax.numpy as jnp

from libhpc_tpu.sparse import COO, CSR, BSR, ELL


def random_csr(rng, m, n, density=0.05, dtype=np.float32):
    return sps.random(m, n, density=density, format="csr", dtype=dtype,
                      random_state=np.random.RandomState(rng.integers(1 << 30)))


@pytest.mark.parametrize("shape", [(1, 1), (7, 13), (64, 64), (111, 297)])
def test_csr_roundtrip(rng, shape):
    sp = random_csr(rng, *shape, density=0.2)
    csr = CSR.from_scipy(sp)
    np.testing.assert_allclose(np.asarray(csr.todense()), sp.toarray(),
                               rtol=1e-6)
    back = csr.to_scipy()
    assert (back != sp).nnz == 0


def test_coo_to_csr(rng):
    sp = random_csr(rng, 50, 60, density=0.1).tocoo()
    # shuffle triplets to exercise the sort
    perm = rng.permutation(sp.nnz)
    coo = COO(
        row=jnp.asarray(sp.row[perm], jnp.int32),
        col=jnp.asarray(sp.col[perm], jnp.int32),
        data=jnp.asarray(sp.data[perm]),
        shape=sp.shape,
    )
    csr = coo.tocsr()
    np.testing.assert_allclose(np.asarray(csr.todense()), sp.toarray(),
                               rtol=1e-6)


def test_coo_sum_duplicates(rng):
    row = jnp.asarray([0, 0, 1, 0, 2, 1], jnp.int32)
    col = jnp.asarray([1, 1, 2, 1, 0, 2], jnp.int32)
    dat = jnp.asarray([1.0, 2.0, 3.0, 4.0, 5.0, 6.0], jnp.float32)
    coo = COO(row=row, col=col, data=dat, shape=(3, 3)).sum_duplicates()
    dense = np.asarray(coo.todense())
    expect = np.zeros((3, 3), np.float32)
    expect[0, 1] = 7.0
    expect[1, 2] = 9.0
    expect[2, 0] = 5.0
    np.testing.assert_allclose(dense, expect)


def test_coo_morton_sort(rng):
    sp = random_csr(rng, 32, 32, density=0.2).tocoo()
    coo = COO.from_scipy(sp).sort_indices("morton")
    # same matrix, different order
    np.testing.assert_allclose(np.asarray(coo.todense()), sp.toarray(),
                               rtol=1e-6)


@pytest.mark.parametrize("k", [None, 16])
def test_ell_roundtrip(rng, k):
    sp = random_csr(rng, 40, 50, density=0.1)
    ell = ELL.from_csr(CSR.from_scipy(sp), max_nnz_per_row=k)
    np.testing.assert_allclose(np.asarray(ell.todense()), sp.toarray(),
                               rtol=1e-6)
    assert ell.k % 8 == 0


def test_ell_too_small_k_raises(rng):
    sp = sps.csr_matrix(np.ones((4, 10), np.float32))
    with pytest.raises(ValueError):
        ELL.from_csr(CSR.from_scipy(sp), max_nnz_per_row=2)


@pytest.mark.parametrize("shape,block", [((64, 64), 8), ((60, 52), 8),
                                         ((33, 31), 16)])
def test_bsr_roundtrip(rng, shape, block):
    sp = random_csr(rng, *shape, density=0.1)
    bsr = BSR.from_scipy(sp, block=block)
    dense = np.asarray(bsr.todense())
    np.testing.assert_allclose(dense[: shape[0], : shape[1]], sp.toarray(),
                               rtol=1e-6)
    # padding region is zero
    assert np.all(dense[shape[0]:, :] == 0)
    assert np.all(dense[:, shape[1]:] == 0)
    assert bsr.fill_ratio() >= 1.0


def test_bsr_morton_same_matrix(rng):
    sp = random_csr(rng, 64, 64, density=0.1)
    a = BSR.from_scipy(sp, block=8, morton=False)
    b = BSR.from_scipy(sp, block=8, morton=True)
    np.testing.assert_allclose(np.asarray(a.todense()),
                               np.asarray(b.todense()), rtol=1e-6)


def test_row_of_nnz(rng):
    sp = random_csr(rng, 30, 30, density=0.1)
    csr = CSR.from_scipy(sp)
    rows = np.asarray(csr.row_of_nnz())
    expect = np.repeat(np.arange(30), np.diff(sp.indptr))
    np.testing.assert_array_equal(rows, expect)


def test_empty_rows():
    # matrix with empty rows (indptr with repeats)
    dense = np.zeros((5, 5), np.float32)
    dense[0, 1] = 1.0
    dense[3, 2] = 2.0
    csr = CSR.from_dense(dense)
    np.testing.assert_allclose(np.asarray(csr.todense()), dense)
    rows = np.asarray(csr.row_of_nnz())
    np.testing.assert_array_equal(rows, [0, 3])
