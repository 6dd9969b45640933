"""Distributed separator Cholesky (parallel/pchol) correctness.

Validates the block-cyclic distributed factorization + solves against numpy
on the 8-virtual-device CPU mesh, and the schur_solve integration: the
distributed-separator path must produce the same states as the replicated
path (same algebra, different layout)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
from jax import shard_map

from aprilsam_tpu.datasets import manhattan_world
from aprilsam_tpu.parallel.dist import make_mesh
from aprilsam_tpu.parallel.pchol import layout_rows, pchol_geom, pchol_solve
from aprilsam_tpu.parallel.schur import partition_graph, schur_solve


def _rand_spd(nl, seed):
    rng = np.random.default_rng(seed)
    M = rng.standard_normal((nl, nl))
    return M @ M.T + nl * np.eye(nl)


@pytest.mark.parametrize("mode", ["gathered", "looped"])
@pytest.mark.parametrize("nl,block", [(96, 16), (200, 16), (513, 32)])
def test_pchol_matches_numpy(nl, block, mode):
    mesh = make_mesh(8)
    D = 8
    geom = pchol_geom(nl, D, block=block)
    A = _rand_spd(nl, seed=nl)
    rng = np.random.default_rng(nl + 1)
    c = rng.standard_normal(nl)

    # host-side emulation of the psum_scatter layout: pad, permute rows
    lrow = np.asarray(
        jax.device_get(layout_rows(geom, jnp.arange(geom.n)))
    )
    S_pad = np.zeros((geom.n, geom.n))
    S_pad[np.ix_(lrow[:nl], np.arange(nl))] = A
    c_pad = np.zeros(geom.n)
    c_pad[:nl] = c

    tikh = 1e-8
    axis = mesh.axis_names[0]

    solve = jax.jit(
        shard_map(
            lambda S, cc: pchol_solve(geom, axis, S, cc, tikhonov=tikh,
                                      solve_mode=mode),
            mesh=mesh,
            in_specs=(P(axis), P()),
            out_specs=P(),
            check_vma=False,
        )
    )
    x = np.asarray(jax.device_get(solve(jnp.asarray(S_pad), jnp.asarray(c_pad))))

    x_ref = np.linalg.solve(A + tikh * np.eye(nl), c)
    np.testing.assert_allclose(x[:nl], x_ref, rtol=1e-9, atol=1e-9)
    # padding region must solve to exactly zero
    assert np.all(x[nl:] == 0.0)


def test_schur_sep_dist_matches_replicated():
    g = manhattan_world(400, seed=11, closure_prob=0.5)
    mesh = make_mesh(8)
    part = partition_graph(g, 8)
    assert part.ns > 0
    s_rep = schur_solve(mesh, g, part, gn_iters=2, dtype=np.float64,
                        sep_dist=False)
    s_dist = schur_solve(mesh, g, part, gn_iters=2, dtype=np.float64,
                         sep_dist=True, sep_block=16)
    np.testing.assert_allclose(s_dist, s_rep, rtol=1e-8, atol=1e-8)
