"""Closed-form batched 3x3 linear algebra for the hot path.

XLA's general cholesky/eigh/triangular-solve lower to blocked iterative
algorithms with fixed overhead that dwarfs the arithmetic at 3x3 scale; the
incremental step uses these unrolled closed forms instead (pure VPU
elementwise code, fully fusable).
"""

from __future__ import annotations

import jax.numpy as jnp


def chol3(W, jitter=0.0):
    """Batched upper-triangular M with M^T M = W for symmetric PSD W[...,3,3].

    Returns the UPPER factor (R such that R^T R = W).  `jitter` (relative to
    the diagonal scale) regularizes PSD-singular inputs; zero matrices map to
    ~zero factors.
    """
    eps = jitter + 1e-30
    w00 = W[..., 0, 0]
    w01 = W[..., 0, 1]
    w02 = W[..., 0, 2]
    w11 = W[..., 1, 1]
    w12 = W[..., 1, 2]
    w22 = W[..., 2, 2]
    scale = w00 + w11 + w22
    # dtype-aware positive floor: a literal like 1e-300 underflows to 0 in
    # float32, turning the padding-factor case (W == 0) into 0/0 = NaN that
    # then poisons the frontal QR through the masked-but-NaN J rows
    tiny = jnp.finfo(jnp.result_type(W)).tiny
    d0 = jnp.maximum(w00 + eps * scale, tiny)
    l00 = jnp.sqrt(d0)
    l01 = w01 / l00
    l02 = w02 / l00
    d1 = jnp.maximum(w11 + eps * scale - l01 * l01, tiny)
    l11 = jnp.sqrt(d1)
    l12 = (w12 - l01 * l02) / l11
    d2 = jnp.maximum(w22 + eps * scale - l02 * l02 - l12 * l12, tiny)
    l22 = jnp.sqrt(d2)
    z = jnp.zeros_like(l00)
    # upper factor rows: [l00 l01 l02; 0 l11 l12; 0 0 l22]
    return jnp.stack([
        jnp.stack([l00, l01, l02], axis=-1),
        jnp.stack([z, l11, l12], axis=-1),
        jnp.stack([z, z, l22], axis=-1),
    ], axis=-2)


def solve_upper3(R, b):
    """Batched solve R x = b for upper-triangular R[...,3,3], b[...,3]."""
    x2 = b[..., 2] / R[..., 2, 2]
    x1 = (b[..., 1] - R[..., 1, 2] * x2) / R[..., 1, 1]
    x0 = (b[..., 0] - R[..., 0, 1] * x1 - R[..., 0, 2] * x2) / R[..., 0, 0]
    return jnp.stack([x0, x1, x2], axis=-1)
