"""Key-value Pallas merge sort tests (CPU interpret mode)."""

import numpy as np
import pytest

from libhpc_tpu.ops.sort_pallas_kv import merge_argsort_u32, merge_sort_kv_u32

LOG2C, LOG2W = 10, 11


def _check_argsort(x):
    s, order = merge_argsort_u32(x, log2c=LOG2C, log2w=LOG2W)
    s, order = np.asarray(s), np.asarray(order)
    np.testing.assert_array_equal(s, np.sort(x))
    np.testing.assert_array_equal(x[order], s)  # order is a permutation
    assert np.unique(order).size == x.size


_slow = pytest.mark.slow

@pytest.mark.parametrize("n", [
    1, 111, 512,
    pytest.param(1024, marks=_slow), pytest.param(3987, marks=_slow),
    pytest.param(4096, marks=_slow), pytest.param(5120, marks=_slow),
    pytest.param(11300, marks=_slow)])
def test_argsort_sizes(rng, n):
    _check_argsort(rng.integers(0, 2**32, size=n, dtype=np.uint32))


def test_argsort_duplicate_keys(rng):
    # duplicates: payload order unspecified (unstable) but must be a
    # permutation mapping to equal keys
    x = rng.choice(np.array([3, 7, 2**31, 0xFFFFFFFF], np.uint32), 4096)
    _check_argsort(x)


@pytest.mark.slow
def test_sort_kv_f32_payload(rng):
    n = 3 * 1024 + 17
    k = rng.integers(0, 2**32, size=n, dtype=np.uint32)
    v = rng.random(n).astype(np.float32)
    ks, vs = merge_sort_kv_u32(k, v, log2c=LOG2C, log2w=LOG2W)
    ks, vs = np.asarray(ks), np.asarray(vs)
    order = np.argsort(k, kind="stable")
    np.testing.assert_array_equal(ks, k[order])
    # unique keys here w.h.p.: payloads must follow exactly
    if np.unique(k).size == n:
        np.testing.assert_array_equal(vs, v[order])


@pytest.mark.slow
def test_argsort_all_equal():
    x = np.full(2048, 42, np.uint32)
    s, order = merge_argsort_u32(x, log2c=LOG2C, log2w=LOG2W)
    np.testing.assert_array_equal(np.asarray(s), x)
    assert np.unique(np.asarray(order)).size == x.size
