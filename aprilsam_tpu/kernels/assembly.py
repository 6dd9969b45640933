"""Normal-equation assembly: batched factor eval -> block scatter-add.

TPU-native replacement for the reference's per-factor assembly loop
(aprilsam.c:152-195): all factors are linearized in one vmapped kernel
(factors.py) and their 3x3 Gauss-Newton blocks scatter-added into the dense
normal equations with a single XLA scatter over scalar indices (a block-grid
intermediate would materialize an [MB+1, MB+1, 3, 3] tensor — 600 MB at the
4096-node bucket — so blocks are expanded to scalar (row, col) index pairs
instead).  The reference's upper-triangle rule is replicated exactly: it
keeps only scalar entries with row <= col and mirrors them
(aprilsam.c:169-178, 216-225), which matters because the M3500 loader fills
W upper-triangular only — the lower-triangle J^T W J contribution is
discarded, not symmetrized.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..factors import eval_xyt, eval_xytpos, gn_blocks_xyt


def _scatter_block(dense, pr, pc, H):
    """dense[3*pr:+3, 3*pc:+3] += H[f] for each factor f.

    One [3, 3]-WINDOW scatter-add per factor instead of 9 scalar updates:
    TPU scatters serialize per index row, so collapsing 9 scalars into one
    windowed update is ~an order of magnitude fewer serialized rows (the
    scalar form measured ~40 ms per 4096-bucket assembly).  Out-of-range
    windows (padded factors at position MB) are dropped whole."""
    idx = jnp.stack([3 * pr, 3 * pc], axis=1).astype(jnp.int32)   # [F, 2]
    dn = jax.lax.ScatterDimensionNumbers(
        update_window_dims=(1, 2),
        inserted_window_dims=(),
        scatter_dims_to_operand_dims=(0, 1),
    )
    return jax.lax.scatter_add(
        dense, idx, H, dn,
        indices_are_sorted=False, unique_indices=False,
        mode=jax.lax.GatherScatterMode.FILL_OR_DROP)


def _scatter_vec(vec, pr, g):
    idx = (3 * pr)[:, None].astype(jnp.int32)                      # [F, 1]
    dn = jax.lax.ScatterDimensionNumbers(
        update_window_dims=(1,),
        inserted_window_dims=(),
        scatter_dims_to_operand_dims=(0,),
    )
    return jax.lax.scatter_add(
        vec, idx, g, dn,
        indices_are_sorted=False, unique_indices=False,
        mode=jax.lax.GatherScatterMode.FILL_OR_DROP)


def assemble_block_dense(
    l_points,      # [NCAP, 3] linearization points (node-id space)
    states,        # [NCAP, 3] current states (xytpos factors read these)
    pos,           # [NCAP] int32 node id -> elimination position
    xyt_a, xyt_b, xyt_z, xyt_W, xyt_valid,
    pos_node, pos_z, pos_W, pos_valid,
    MB: int,       # static block dimension of the output (positions 0..MB-1)
    tikhonov,
    dtype,
):
    """Assemble the dense (bucketed) normal equations in position space.

    Returns (A [3MB, 3MB] symmetric-by-upper-mirror, B [3MB]).
    Invalid (padded) factors scatter out of range and are dropped.
    """
    n3 = 3 * MB
    dense = jnp.zeros((n3, n3), dtype=dtype)
    B = jnp.zeros(n3, dtype=dtype)
    oob = MB  # 3*MB is out of range -> dropped

    if xyt_a.shape[0]:
        ev = eval_xyt(l_points, xyt_a, xyt_b, xyt_z.astype(dtype), xyt_W.astype(dtype))
        Haa, Hab, Hba, Hbb, ga, gb = gn_blocks_xyt(ev, xyt_W.astype(dtype))
        pa = jnp.where(xyt_valid, pos[xyt_a], oob)
        pb = jnp.where(xyt_valid, pos[xyt_b], oob)
        dense = _scatter_block(dense, pa, pa, Haa)
        dense = _scatter_block(dense, pa, pb, Hab)
        dense = _scatter_block(dense, pb, pa, Hba)
        dense = _scatter_block(dense, pb, pb, Hbb)
        B = _scatter_vec(B, pa, ga)
        B = _scatter_vec(B, pb, gb)

    if pos_node.shape[0]:
        ev = eval_xytpos(states, pos_node, pos_z.astype(dtype), pos_W.astype(dtype))
        W = pos_W.astype(dtype)
        g = jnp.einsum("fij,fj->fi", W, ev.r)
        pp = jnp.where(pos_valid, pos[pos_node], oob)
        dense = _scatter_block(dense, pp, pp, W)  # J = I so H = W
        B = _scatter_vec(B, pp, g)

    # reference upper-triangle rule: keep row<=col scalars, mirror
    # (aprilsam.c:171, 216-225)
    U = jnp.triu(dense)
    A = U + jnp.triu(dense, 1).T
    A = A + jnp.asarray(tikhonov, dtype=dtype) * jnp.eye(n3, dtype=dtype)
    return A, B


def upper_mirror(M):
    """Symmetrize a matrix by the reference's convention: upper triangle wins."""
    U = jnp.triu(M)
    return U + jnp.triu(M, 1).T
