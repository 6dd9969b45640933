import numpy as np
import jax.numpy as jnp

from aprilsam_tpu.geometry import (
    mod2pi, np_mod2pi, np_xyt_inv, np_xyt_inv_mul, np_xyt_mul,
    xyt_inv, xyt_inv_mul, xyt_mul,
)


def rand_xyt(rng, n=64):
    v = rng.uniform(-10, 10, size=(n, 3))
    v[:, 2] = rng.uniform(-8, 8, size=n)
    return v


def test_mod2pi_range_and_values():
    vals = np.array([0.0, np.pi - 1e-9, -np.pi, np.pi, 3 * np.pi, -7.5, 123.456])
    out = np.asarray(mod2pi(jnp.asarray(vals)))
    assert np.all(out >= -np.pi) and np.all(out < np.pi + 1e-12)
    # same branch cuts as the reference formula
    np.testing.assert_allclose(out, np_mod2pi(vals), atol=1e-12)
    # equivalence modulo 2pi
    np.testing.assert_allclose(
        np.cos(out), np.cos(vals), atol=1e-9
    )
    np.testing.assert_allclose(np.sin(out), np.sin(vals), atol=1e-9)


def test_xyt_identities():
    rng = np.random.default_rng(0)
    a = rand_xyt(rng)
    b = rand_xyt(rng)
    ja, jb = jnp.asarray(a), jnp.asarray(b)

    # inv(a) . a == identity
    ident = np.asarray(xyt_mul(xyt_inv(ja), ja))
    np.testing.assert_allclose(ident, 0.0, atol=1e-9)

    # inv_mul(a, b) == inv(a) . b
    lhs = np.asarray(xyt_inv_mul(ja, jb))
    rhs = np.asarray(xyt_mul(xyt_inv(ja), jb))
    np.testing.assert_allclose(lhs, rhs, atol=1e-9)

    # jnp and numpy twins agree
    np.testing.assert_allclose(np.asarray(xyt_mul(ja, jb)), np_xyt_mul(a, b), atol=1e-12)
    np.testing.assert_allclose(np.asarray(xyt_inv(ja)), np_xyt_inv(a), atol=1e-12)
    np.testing.assert_allclose(
        np.asarray(xyt_inv_mul(ja, jb)), np_xyt_inv_mul(a, b), atol=1e-12
    )


def test_xyt_associativity():
    rng = np.random.default_rng(1)
    a, b, c = (jnp.asarray(rand_xyt(rng, 16)) for _ in range(3))
    lhs = np.asarray(xyt_mul(xyt_mul(a, b), c))
    rhs = np.asarray(xyt_mul(a, xyt_mul(b, c)))
    np.testing.assert_allclose(lhs, rhs, atol=1e-9)
