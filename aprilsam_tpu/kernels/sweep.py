"""Whole-graph panel back-substitution x = R^{-1} y (shared by the
incremental sweep and the batch epochs).

Blocked two-phase solve over the block-sparse upper-triangular R
(reference: smatd_utriangle_solve, smatd.c:1075-1097, recast as a reverse
panel scan): the panel diagonal triangles are extracted for ALL panels in
one one-hot MXU einsum and inverted batched (pallas blocked tri-inverse on
TPU); the scan body per panel is a sparse gather + one [3P, 3P] matvec.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def panel_backsub(R_blocks, R_idx, y, n, PANEL: int, NPANB: int):
    """Solve R x = y over the first NPANB*PANEL block rows.

    R_blocks [NCAP, BCAP, 3, 3], R_idx [NCAP, BCAP] (sorted, pad NCAP),
    y [NCAP, 3]; n = active block count (traced).  Returns x [NCAP, 3]
    in POSITION space (zeros beyond the active panels).
    """
    NCAP = R_blocks.shape[0]
    BCAP = R_idx.shape[1]
    dtype = R_blocks.dtype
    NP3 = 3 * PANEL

    act_rows = R_blocks[: NPANB * PANEL].reshape(NPANB, PANEL, BCAP, 3, 3)
    act_idx = R_idx[: NPANB * PANEL].reshape(NPANB, PANEL, BCAP)
    p0s = (jnp.arange(NPANB, dtype=jnp.int32) * PANEL)[:, None, None]
    # T[n, p, c] = the row's block at column p0+c, via one-hot MXU einsum.
    # (A vectorized binary-search + take_along_axis variant was measured
    # 3-4x SLOWER on the v5e despite materializing an [NPANB, PANEL, BCAP,
    # PANEL] one-hot — batched dynamic gathers lower poorly where the MXU
    # eats the one-hot contraction.)
    loc = act_idx - p0s
    inpan = (loc >= 0) & (loc < PANEL)
    oh = jax.nn.one_hot(jnp.where(inpan, loc, 0), PANEL,
                        dtype=dtype) * inpan[..., None]
    T = jnp.einsum("npbij,npbc->npcij", act_rows, oh)
    Td = T.transpose(0, 1, 3, 2, 4).reshape(NPANB, NP3, NP3)
    prow_all = p0s.reshape(NPANB, 1) + jnp.arange(PANEL, dtype=jnp.int32)
    act_scal = jnp.repeat(prow_all < n, 3, axis=1)          # [NPANB, NP3]
    Td = Td + jnp.eye(NP3, dtype=dtype)[None] * jnp.where(
        act_scal, 0.0, 1.0)[:, :, None]
    from .pallas_tri import tri_inv

    Tinv = tri_inv(Td)

    xb = jnp.zeros((NCAP + 1, 3), dtype=dtype)

    def panel_body(xb, j_rev):
        j = NPANB - 1 - j_rev
        p0 = j * PANEL
        rows = jax.lax.dynamic_slice_in_dim(R_blocks, p0, PANEL, 0)
        idx = jax.lax.dynamic_slice_in_dim(R_idx, p0, PANEL, 0)
        yp = jax.lax.dynamic_slice_in_dim(y, p0, PANEL, 0)
        beyond = idx >= (p0 + PANEL)
        xg = xb[jnp.clip(idx, 0, NCAP)]
        acc = jnp.einsum("pbij,pbj->pi", rows,
                         jnp.where(beyond[..., None], xg, 0.0))
        prow = p0 + jnp.arange(PANEL, dtype=jnp.int32)
        active = jnp.repeat(prow < n, 3)
        rhs = jnp.where(active, (yp - acc).reshape(-1), 0.0)
        Ti = jax.lax.dynamic_slice_in_dim(Tinv, j, 1, 0)[0]
        xp = Ti @ rhs
        xb = jax.lax.dynamic_update_slice_in_dim(
            xb, xp.reshape(PANEL, 3), p0, 0)
        return xb, None

    xb, _ = jax.lax.scan(panel_body, xb, jnp.arange(NPANB))
    return xb[:NCAP]


def panel_backsub_windowed(R_blocks, R_idx, y, x_prev, panels, n,
                           PANEL: int, PW: int):
    """Back-substitution restricted to a WINDOW of panels — the TPU analogue
    of the reference's pruned tree-gated descent (solve_node,
    aprilsam.c:721-779): only the listed panels' x is recomputed; pattern
    columns landing outside the window read the previous solution x_prev.

    `panels` [PW] holds DESCENDING panel indices (pad -1 = skip).  Because
    affected sets are ancestor-closed and R-row patterns only reference
    etree ancestors, the recomputed x is EXACT for every affected position
    when the window covers the affected panels; non-window positions keep
    their (slightly stale) x_prev — the same approximation the reference's
    delta-delta early-exit makes (aprilsam.c:755-772), at panel
    granularity.  Cost is O(PW), independent of the trajectory length.

    x_prev [NCAP, 3] is the previous solution in POSITION space.  Returns
    the updated x (position space).
    """
    NCAP = R_blocks.shape[0]
    dtype = R_blocks.dtype
    NP3 = 3 * PANEL

    xb = jnp.concatenate([x_prev, jnp.zeros((1, 3), dtype=dtype)], axis=0)

    def panel_body(xb, j):
        live = j >= 0
        p0 = jnp.maximum(j, 0) * PANEL
        rows = jax.lax.dynamic_slice_in_dim(R_blocks, p0, PANEL, 0)
        idx = jax.lax.dynamic_slice_in_dim(R_idx, p0, PANEL, 0)
        yp = jax.lax.dynamic_slice_in_dim(y, p0, PANEL, 0)
        beyond = idx >= (p0 + PANEL)
        xg = xb[jnp.clip(idx, 0, NCAP)]
        acc = jnp.einsum("pbij,pbj->pi", rows,
                         jnp.where(beyond[..., None], xg, 0.0))
        prow = p0 + jnp.arange(PANEL, dtype=jnp.int32)
        active = jnp.repeat(prow < n, 3)
        rhs = jnp.where(active, (yp - acc).reshape(-1), 0.0)
        # panel diagonal triangle via in-panel one-hot (single panel)
        loc = idx - p0
        inpan = (loc >= 0) & (loc < PANEL)
        oh = jax.nn.one_hot(jnp.where(inpan, loc, 0), PANEL,
                            dtype=dtype) * inpan[..., None]
        T = jnp.einsum("pbij,pbc->pcij", rows, oh)
        Td = T.transpose(0, 2, 1, 3).reshape(NP3, NP3)
        Td = Td + jnp.eye(NP3, dtype=dtype) * jnp.where(active, 0.0, 1.0)
        xp = jax.scipy.linalg.solve_triangular(Td, rhs, lower=False)
        old = jax.lax.dynamic_slice_in_dim(xb, p0, PANEL, 0)
        act_n = prow < n
        xp = jnp.where((live & act_n)[:, None], xp.reshape(PANEL, 3), old)
        xb = jax.lax.dynamic_update_slice_in_dim(xb, xp, p0, 0)
        return xb, None

    xb, _ = jax.lax.scan(panel_body, xb, panels)
    return xb[:NCAP]
