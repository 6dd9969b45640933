"""Multi-chip distributed solves over a jax.sharding Mesh.

The reference is strictly single-threaded C (SURVEY.md section 2.7) — there
is nothing to port.  The TPU-native scaling design introduces parallelism in
two stages:

  1. data-parallel assembly (this module, `dp_batch_solve`): the factor
     tables are sharded across the mesh's `dp` axis, each device linearizes
     and scatter-adds its shard of J^T W J / J^T W r, and one psum over ICI
     produces the replicated normal equations; the factorization + solves
     run replicated.  Assembly is the O(F) part of a batch epoch, and F >> N.

  2. keyframe-block domain decomposition (parallel/schur.py): contiguous
     trajectory blocks are eliminated locally, the inter-block separator
     Schur complement is all-reduced, the separator system is solved
     replicated, and interiors back-substitute locally — the SLAM analogue
     of sequence/context parallelism.

Communication is exclusively XLA collectives (psum / all_gather) laid out by
shard_map PartitionSpecs; there is no hand-rolled transport.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..kernels.assembly import assemble_block_dense


def make_mesh(n_devices: Optional[int] = None, axis: str = "dp") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.asarray(devs[:n]), (axis,))


def dp_batch_solve(
    mesh: Mesh,
    l_points,       # [NCAP, 3] replicated
    states,         # [NCAP, 3] replicated
    pos,            # [NCAP] replicated
    xyt_a, xyt_b, xyt_z, xyt_W, xyt_valid,   # [F_pad] sharded over dp
    pos_node, pos_z, pos_W, pos_valid,       # [Fp_pad] sharded over dp
    MB: int,
    tikhonov: float,
):
    """Distributed batch Gauss-Newton linear solve.

    Factor tables must be padded to a multiple of the mesh size.  Returns
    (dx [3MB], y [3MB], L [3MB,3MB]) replicated.
    """
    dtype = l_points.dtype

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(
            P(), P(), P(),
            P("dp"), P("dp"), P("dp"), P("dp"), P("dp"),
            P("dp"), P("dp"), P("dp"), P("dp"),
        ),
        out_specs=(P(), P(), P()),
    )
    def step(lp, st, pp, xa, xb, xz, xW, xv, pn, pz, pW, pv):
        A_loc, B_loc = assemble_block_dense(
            lp, st, pp, xa, xb, xz, xW, xv, pn, pz, pW, pv,
            MB=MB, tikhonov=0.0, dtype=dtype,
        )
        # reduce the normal equations over ICI
        A = jax.lax.psum(A_loc, "dp")
        B = jax.lax.psum(B_loc, "dp")
        A = A + jnp.asarray(tikhonov, dtype) * jnp.eye(3 * MB, dtype=dtype)
        L = jnp.linalg.cholesky(A)
        y = jax.scipy.linalg.solve_triangular(L, B, lower=True)
        x = jax.scipy.linalg.solve_triangular(L.T, y, lower=False)
        return x, y, L

    return step(
        l_points, states, pos,
        xyt_a, xyt_b, xyt_z, xyt_W, xyt_valid,
        pos_node, pos_z, pos_W, pos_valid,
    )


def shard_factor_tables(n_devices: int, xyt_a, xyt_b, xyt_z, xyt_W, xyt_valid):
    """Pad factor arrays to a multiple of the mesh size (host helper)."""
    F = xyt_a.shape[0]
    Fp = ((F + n_devices - 1) // n_devices) * n_devices
    pad = Fp - F

    def p(a, fill=0):
        return np.pad(a, [(0, pad)] + [(0, 0)] * (a.ndim - 1),
                      constant_values=fill)

    return p(xyt_a), p(xyt_b), p(xyt_z), p(xyt_W), p(xyt_valid)
