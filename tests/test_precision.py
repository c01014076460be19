"""Compensated-reduction tests — oracle: float64 numpy."""

import numpy as np
import jax.numpy as jnp

from libhpc_tpu.ops import precision as pr


def test_two_sum_exact():
    a, b = np.float32(1e8), np.float32(1.5)
    s, e = pr.two_sum(jnp.float32(a), jnp.float32(b))
    assert float(s) + float(e) == float(np.float64(a) + np.float64(b))


def test_two_prod_exact(rng):
    a = rng.random(100).astype(np.float32) * 1e3
    b = rng.random(100).astype(np.float32) * 1e-3
    p, e = pr.two_prod(jnp.asarray(a), jnp.asarray(b))
    exact = a.astype(np.float64) * b.astype(np.float64)
    np.testing.assert_array_equal(
        np.asarray(p, np.float64) + np.asarray(e, np.float64), exact
    )


def test_sum_compensated_beats_plain(rng):
    # adversarial: large values cancel, residue carried by small ones
    big = rng.random(50_000).astype(np.float32) * 1e7
    x = np.concatenate([big, -big, rng.random(50_001).astype(np.float32)])
    rng.shuffle(x)
    exact = x.astype(np.float64).sum()
    plain = float(jnp.sum(jnp.asarray(x)))
    comp = float(pr.sum_compensated(jnp.asarray(x)))
    assert abs(comp - exact) <= abs(plain - exact)
    assert abs(comp - exact) < 1e-2


def test_dot_compensated(rng):
    x = (rng.random(100_001) * 2 - 1).astype(np.float32) * 1e4
    y = (rng.random(100_001) * 2 - 1).astype(np.float32) * 1e-4
    exact = np.dot(x.astype(np.float64), y.astype(np.float64))
    comp = float(pr.dot_compensated(jnp.asarray(x), jnp.asarray(y)))
    rel = abs(comp - exact) / max(abs(exact), 1e-30)
    assert rel < 1e-6


def test_odd_sizes(rng):
    for n in [1, 2, 3, 7, 1023]:
        x = rng.random(n).astype(np.float32)
        got = float(pr.sum_compensated(jnp.asarray(x)))
        np.testing.assert_allclose(got, x.astype(np.float64).sum(),
                                   rtol=1e-6)
