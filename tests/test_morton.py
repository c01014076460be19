"""Morton code tests — oracle: bit-by-bit numpy reference."""

import numpy as np
import jax.numpy as jnp

from libhpc_tpu.utils.morton import (
    morton2d_encode, morton2d_decode, morton3d_encode, morton3d_decode,
)


def _oracle_encode2d(x, y):
    out = np.zeros_like(x, dtype=np.uint64)
    for b in range(16):
        out |= ((x.astype(np.uint64) >> b) & 1) << (2 * b)
        out |= ((y.astype(np.uint64) >> b) & 1) << (2 * b + 1)
    return out.astype(np.uint32)


def test_encode2d_matches_oracle(rng):
    x = rng.integers(0, 1 << 16, size=1000).astype(np.uint32)
    y = rng.integers(0, 1 << 16, size=1000).astype(np.uint32)
    got = np.asarray(morton2d_encode(jnp.asarray(x), jnp.asarray(y)))
    np.testing.assert_array_equal(got, _oracle_encode2d(x, y))


def test_roundtrip2d(rng):
    x = rng.integers(0, 1 << 16, size=1000).astype(np.uint32)
    y = rng.integers(0, 1 << 16, size=1000).astype(np.uint32)
    code = morton2d_encode(jnp.asarray(x), jnp.asarray(y))
    dx, dy = morton2d_decode(code)
    np.testing.assert_array_equal(np.asarray(dx), x)
    np.testing.assert_array_equal(np.asarray(dy), y)


def test_edge_values():
    for v in [0, 1, 2, 255, 256, 65535]:
        c = morton2d_encode(jnp.uint32(v), jnp.uint32(0))
        dx, dy = morton2d_decode(c)
        assert int(dx) == v and int(dy) == 0


def test_roundtrip3d(rng):
    x = rng.integers(0, 1 << 10, size=500).astype(np.uint32)
    y = rng.integers(0, 1 << 10, size=500).astype(np.uint32)
    z = rng.integers(0, 1 << 10, size=500).astype(np.uint32)
    code = morton3d_encode(jnp.asarray(x), jnp.asarray(y), jnp.asarray(z))
    dx, dy, dz = morton3d_decode(code)
    np.testing.assert_array_equal(np.asarray(dx), x)
    np.testing.assert_array_equal(np.asarray(dy), y)
    np.testing.assert_array_equal(np.asarray(dz), z)


def test_locality():
    # adjacent coords within a 2x2 tile have adjacent-ish codes
    c00 = int(morton2d_encode(jnp.uint32(0), jnp.uint32(0)))
    c10 = int(morton2d_encode(jnp.uint32(1), jnp.uint32(0)))
    c01 = int(morton2d_encode(jnp.uint32(0), jnp.uint32(1)))
    c11 = int(morton2d_encode(jnp.uint32(1), jnp.uint32(1)))
    assert [c00, c10, c01, c11] == [0, 1, 2, 3]
