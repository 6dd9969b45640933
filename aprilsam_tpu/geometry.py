"""SE(2) geometry on xyt = (x, y, theta) vectors, vectorized for TPU.

TPU-native equivalent of the reference's scalar xyt toolbox
(reference: aprilsam/common/doubles_floats_impl.h:497-630 and
aprilsam/common/math_util.h:111-121).  All functions are pure jnp ops that
broadcast over leading batch dimensions, so they vectorize across whole
factor tables / node tables in one VPU pass instead of per-pose C calls.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

TWOPI = 2.0 * np.pi


def mod2pi(theta):
    """Map angle to [-pi, pi).

    Matches the reference exactly: mod2pi(v) = mod2pi_positive(v + pi) - pi
    with mod2pi_positive(v) = v - 2pi*floor(v/2pi)
    (reference: aprilsam/common/math_util.h:111-121).
    """
    v = theta + np.pi
    return (v - TWOPI * jnp.floor(v / TWOPI)) - np.pi


def xyt_mul(a, b):
    """Compose two rigid-body transforms: r = a (+) b.

    reference: doubles_floats_impl.h:498-506 (s_xyt_mul).
    a, b: [..., 3] arrays; returns [..., 3].  Theta is NOT wrapped (matching
    the reference, which leaves composition angles unwrapped).
    """
    a = jnp.asarray(a)
    b = jnp.asarray(b)
    ta = a[..., 2]
    s, c = jnp.sin(ta), jnp.cos(ta)
    x = c * b[..., 0] - s * b[..., 1] + a[..., 0]
    y = s * b[..., 0] + c * b[..., 1] + a[..., 1]
    t = ta + b[..., 2]
    return jnp.stack([x, y, t], axis=-1)


def xyt_inv(a):
    """Inverse transform.  reference: doubles_floats_impl.h:569-575."""
    a = jnp.asarray(a)
    s, c = jnp.sin(a[..., 2]), jnp.cos(a[..., 2])
    x = -s * a[..., 1] - c * a[..., 0]
    y = -c * a[..., 1] + s * a[..., 0]
    t = -a[..., 2]
    return jnp.stack([x, y, t], axis=-1)


def xyt_inv_mul(a, b):
    """r = inv(a) (+) b, i.e. pose of b expressed in frame a.

    reference: doubles_floats_impl.h:619-630 (s_xyt_inv_mul).
    """
    a = jnp.asarray(a)
    b = jnp.asarray(b)
    theta = a[..., 2]
    ca, sa = jnp.cos(theta), jnp.sin(theta)
    dx = b[..., 0] - a[..., 0]
    dy = b[..., 1] - a[..., 1]
    x = ca * dx + sa * dy
    y = -sa * dx + ca * dy
    t = b[..., 2] - a[..., 2]
    return jnp.stack([x, y, t], axis=-1)


# numpy twins for host-side code paths (graph building, data loading) where
# staying off-device is deliberate.

def np_mod2pi(theta):
    v = np.asarray(theta, dtype=np.float64) + np.pi
    return (v - TWOPI * np.floor(v / TWOPI)) - np.pi


def np_xyt_mul(a, b):
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    ta = a[..., 2]
    s, c = np.sin(ta), np.cos(ta)
    return np.stack(
        [
            c * b[..., 0] - s * b[..., 1] + a[..., 0],
            s * b[..., 0] + c * b[..., 1] + a[..., 1],
            ta + b[..., 2],
        ],
        axis=-1,
    )


def np_xyt_inv(a):
    a = np.asarray(a, dtype=np.float64)
    s, c = np.sin(a[..., 2]), np.cos(a[..., 2])
    return np.stack(
        [
            -s * a[..., 1] - c * a[..., 0],
            -c * a[..., 1] + s * a[..., 0],
            -a[..., 2],
        ],
        axis=-1,
    )


def np_xyt_inv_mul(a, b):
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    theta = a[..., 2]
    ca, sa = np.cos(theta), np.sin(theta)
    dx = b[..., 0] - a[..., 0]
    dy = b[..., 1] - a[..., 1]
    return np.stack(
        [ca * dx + sa * dy, -sa * dx + ca * dy, b[..., 2] - a[..., 2]],
        axis=-1,
    )
