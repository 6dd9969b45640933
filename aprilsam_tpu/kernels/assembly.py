"""Normal-equation assembly: batched factor eval -> block scatter-add.

TPU-native replacement for the reference's per-factor assembly loop
(aprilsam.c:152-195): all factors are linearized in one vmapped kernel
(factors.py) and their 3x3 Gauss-Newton blocks scatter-added into the block
Hessian with a single XLA scatter.  The reference's upper-triangle rule is
replicated exactly: it keeps only scalar entries with row <= col and mirrors
them (aprilsam.c:169-178, 216-225), which matters because the M3500 loader
fills W upper-triangular only — the lower-triangle J^T W J contribution is
discarded, not symmetrized.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..factors import eval_xyt, eval_xytpos, gn_blocks_xyt


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
    Invalid (padded) factors scatter into a scratch row MB that is dropped.
    """
    scratch = MB  # one extra block row/col for masked scatter

    Ablk = jnp.zeros((MB + 1, MB + 1, 3, 3), dtype=dtype)
    Bblk = jnp.zeros((MB + 1, 3), dtype=dtype)

    if xyt_a.shape[0]:
        ev = eval_xyt(l_points, xyt_a, xyt_b, xyt_z.astype(dtype), xyt_W.astype(dtype))
        Haa, Hab, Hba, Hbb, ga, gb = gn_blocks_xyt(ev, xyt_W.astype(dtype))
        pa = jnp.where(xyt_valid, pos[xyt_a], scratch)
        pb = jnp.where(xyt_valid, pos[xyt_b], scratch)
        Ablk = Ablk.at[pa, pa].add(Haa)
        Ablk = Ablk.at[pa, pb].add(Hab)
        Ablk = Ablk.at[pb, pa].add(Hba)
        Ablk = Ablk.at[pb, pb].add(Hbb)
        Bblk = Bblk.at[pa].add(ga)
        Bblk = Bblk.at[pb].add(gb)

    if pos_node.shape[0]:
        ev = eval_xytpos(states, pos_node, pos_z.astype(dtype), pos_W.astype(dtype))
        W = pos_W.astype(dtype)
        g = jnp.einsum("fij,fj->fi", W, ev.r)
        pp = jnp.where(pos_valid, pos[pos_node], scratch)
        Ablk = Ablk.at[pp, pp].add(W)  # J = I so H = W (april_graph_xytpos.c:73-76)
        Bblk = Bblk.at[pp].add(g)

    dense = (
        Ablk[:MB, :MB].transpose(0, 2, 1, 3).reshape(3 * MB, 3 * MB)
    )
    # reference upper-triangle rule: keep row<=col scalars, mirror
    # (aprilsam.c:171, 216-225)
    U = jnp.triu(dense)
    A = U + jnp.triu(dense, 1).T
    A = A + jnp.asarray(tikhonov, dtype=dtype) * jnp.eye(3 * MB, dtype=dtype)
    B = Bblk[:MB].reshape(3 * MB)
    return A, B


def upper_mirror(M):
    """Symmetrize a matrix by the reference's convention: upper triangle wins."""
    U = jnp.triu(M)
    return U + jnp.triu(M, 1).T
