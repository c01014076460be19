"""Pallas merge-path sort tests (CPU interpret mode; TPU via smoke suite).

Mirrors the reference's sort test strategy (SURVEY.md §4.1-4.2): edge-size
sweep, property tests vs np.sort, adversarial value distributions. Small
log2c/log2w force multi-level merges at test sizes."""

import numpy as np
import pytest

from libhpc_tpu.ops.sort_pallas import merge_sort_u32

# small chunks/windows: C=1024 (8 rows), W=2048 — exercises W>C clamp,
# multi-level merges, and both window parities at tiny sizes
LOG2C, LOG2W = 10, 11


def _check(x):
    got = np.asarray(merge_sort_u32(x, log2c=LOG2C, log2w=LOG2W))
    np.testing.assert_array_equal(got, np.sort(x))


@pytest.mark.parametrize("n", [1, 111, 256, 297, 500, 512, 1024, 3987])
def test_edge_sizes(rng, n):
    _check(rng.integers(0, 2**32, size=n, dtype=np.uint32))


@pytest.mark.parametrize("n_chunks", [2, 4, 8])
def test_multi_level(rng, n_chunks):
    n = n_chunks * (1 << LOG2C)
    _check(rng.integers(0, 2**32, size=n, dtype=np.uint32))


def test_non_power_of_two_chunks(rng):
    # 3 chunks of data -> padded to 4; padding must not leak into output
    n = 3 * (1 << LOG2C) + 77
    _check(rng.integers(0, 2**32, size=n, dtype=np.uint32))


def test_extreme_values(rng):
    n = 2 * (1 << LOG2C)
    x = rng.integers(0, 2**32, size=n, dtype=np.uint32)
    x[:100] = 0
    x[100:200] = 0xFFFFFFFF
    x[200:300] = 0x7FFFFFFF  # i32 sign boundary
    x[300:400] = 0x80000000
    _check(x)


def test_all_equal():
    _check(np.full(4 * (1 << LOG2C), 0xDEADBEEF, np.uint32))


def test_two_values(rng):
    n = 4 * (1 << LOG2C)
    _check(rng.choice(np.array([7, 2**31], np.uint32), size=n))


def test_presorted_and_reversed(rng):
    n = 4 * (1 << LOG2C)
    x = np.sort(rng.integers(0, 2**32, size=n, dtype=np.uint32))
    _check(x)
    _check(x[::-1].copy())


def test_default_tuning_small(rng):
    # default log2c/log2w on a sub-chunk input (single-chunk fast path)
    x = rng.integers(0, 2**32, size=3000, dtype=np.uint32)
    got = np.asarray(merge_sort_u32(x))
    np.testing.assert_array_equal(got, np.sort(x))


# ---------------------------------------------------------------------------
# segmented (non-power-of-two) path: <=3 power-of-two segments + pair merges
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("n", [
    5120,   # 4096+1024: exactly two segments (C=1024)
    pytest.param(5137, marks=pytest.mark.slow),  # two segments + tail pad
    pytest.param(9216, marks=pytest.mark.slow),  # 8192+1024
    pytest.param(9300, marks=pytest.mark.slow),  # + tail-segment padding
    pytest.param(11264, marks=pytest.mark.slow),  # three segments
    11300,  # three segments + padding (keeps one 3-seg case in fast tier)
])
def test_segmented_sizes(rng, n):
    _check(rng.integers(0, 2**32, size=n, dtype=np.uint32))


def test_segmented_extremes(rng):
    n = 5120
    x = rng.integers(0, 2**32, size=n, dtype=np.uint32)
    x[:50] = 0xFFFFFFFF
    x[50:100] = 0
    _check(x)


def test_decompose_properties():
    from libhpc_tpu.ops.sort_pallas import _decompose
    C = 1 << 16
    for n in [1, C, C + 1, 10_000_000, 100_000_000, 500_000_000,
              (1 << 27) - 1, 1 << 27]:
        segs = _decompose(n, C)
        assert len(segs) <= 3
        assert sum(segs) >= n
        assert all(s >= C and (s & (s - 1)) == 0 for s in segs)
        # padding waste bounded (documented <= ~12.5% + chunk rounding)
        assert sum(segs) <= max(n * 1.13 + C, 2 * C)
