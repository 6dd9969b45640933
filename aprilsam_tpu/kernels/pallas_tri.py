"""Pallas TPU kernel: blocked upper-triangular inversion.

Inverts the panel diagonal triangles of R (used by the full-path
back-substitution's cached-inverse refresh, solver/incremental.py).  XLA's
TriangularSolve lowers to a mostly-sequential loop; this kernel instead runs
the classic blocked algorithm entirely in VMEM with MXU matmuls:

    partition T into BLK-wide column panels; right-to-left, for panel j:
        invert the BLK x BLK diagonal tile (unrolled Gauss-Jordan on the
        upper triangle),
        then the off-diagonal strip  X[0:j, j] = -Tinv[0:j, 0:j] @ T[0:j, j]
        @ Dinv[j]  (two MXU matmuls against already-inverted panels).

The whole [N, N] tile (N = 384 for 128-node panels: 576 KB fp32) fits VMEM
comfortably; the batch dimension maps onto the pallas grid.

Falls back to jax.scipy solve_triangular off-TPU (interpret mode is used in
tests to validate the kernel itself).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLK = 48  # divides 3 * panel_nodes for the standard configs (384, 96)


def _invert_diag_tile(tile):
    """Unrolled in-register inversion of a BLK x BLK upper triangle via
    back-substitution on columns of the identity: X[:, k] columns solved
    jointly with a fori loop over rows (bottom-up)."""
    n = tile.shape[0]
    eye = jnp.eye(n, dtype=tile.dtype)

    def row_body(i_rev, X):
        i = n - 1 - i_rev
        # x_i = (e_i - T[i, i+1:] X[i+1:, :]) / T[i, i]
        mask = (jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0) > i)
        contrib = jnp.sum(
            jnp.where(mask, tile[i][:, None] * X, 0.0), axis=0)
        xi = (eye[i] - contrib) / tile[i, i]
        return jnp.where(
            jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0) == i, xi[None, :], X)

    return jax.lax.fori_loop(0, n, row_body, jnp.zeros_like(tile))


def _tri_inv_kernel(t_ref, out_ref, *, N: int):
    nb = N // BLK
    T = t_ref[0]
    X = jnp.zeros((N, N), dtype=T.dtype)
    # right-to-left over diagonal tiles
    for jr in range(nb):
        j = nb - 1 - jr
        lo = j * BLK
        Dinv = _invert_diag_tile(T[lo : lo + BLK, lo : lo + BLK])
        X = jax.lax.dynamic_update_slice(X, Dinv, (lo, lo))
        if j + 1 < nb:
            hi = lo + BLK
            # strip above-right of the diagonal tile:
            # X[lo:lo+BLK, hi:] = -Dinv @ T[lo:lo+BLK, hi:] @ X[hi:, hi:]
            strip = T[lo : lo + BLK, hi:N]
            rest = X[hi:N, hi:N]
            upd = -jnp.dot(Dinv, jnp.dot(strip, rest,
                                         preferred_element_type=T.dtype),
                           preferred_element_type=T.dtype)
            X = jax.lax.dynamic_update_slice(X, upd, (lo, hi))
    out_ref[0] = X


@partial(jax.jit, static_argnames=("interpret",))
def tri_inv_pallas(T, interpret: bool = False):
    """Batched inverse of upper-triangular matrices T [B, N, N] (N % 48 == 0)."""
    B, N, _ = T.shape
    kern = partial(_tri_inv_kernel, N=N)
    return pl.pallas_call(
        kern,
        grid=(B,),
        in_specs=[pl.BlockSpec((1, N, N), lambda b: (b, 0, 0))],
        out_specs=pl.BlockSpec((1, N, N), lambda b: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, N, N), T.dtype),
        interpret=interpret,
    )(T)


def tri_inv(T, use_pallas: bool = None):
    """Batched upper-triangular inverse with backend selection."""
    if use_pallas is None:
        use_pallas = pallas_available() and T.shape[-1] % BLK == 0
    if use_pallas:
        return tri_inv_pallas(T)
    eye = jnp.eye(T.shape[-1], dtype=T.dtype)
    return jax.vmap(
        lambda t: jax.scipy.linalg.solve_triangular(t, eye, lower=False)
    )(T)


_pallas_ok = None


def pallas_available() -> bool:
    """Probe-compile the kernel once on the current backend; cache the
    verdict so step jits can bake the backend choice in safely."""
    global _pallas_ok
    if _pallas_ok is None:
        try:
            if jax.devices()[0].platform != "tpu":
                _pallas_ok = False
            else:
                t = jnp.broadcast_to(
                    jnp.eye(2 * BLK, dtype=jnp.float32), (1, 2 * BLK, 2 * BLK))
                out = tri_inv_pallas(t)
                jax.block_until_ready(out)
                _pallas_ok = bool(np.isfinite(np.asarray(out)).all())
        except Exception:
            _pallas_ok = False
    return _pallas_ok
