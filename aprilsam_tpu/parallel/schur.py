"""Distributed batch solve by keyframe-block domain decomposition.

The SLAM analogue of sequence/context parallelism (SURVEY.md section 2.7):
the trajectory is partitioned into D contiguous keyframe blocks; each device
owns one block, eliminates its interior unknowns locally, and contributes a
Schur complement on the shared separator (nodes touched by cross-block
factors).  One psum over the ICI reduces the separator system; it is solved
replicated (it is small), and interiors back-substitute locally — an exact
algebraic decomposition of the global Gauss-Newton normal equations:

    [A_II  A_IS] [x_I]   [b_I]         S = sum_d (A_SS_d - A_SI A_II^-1 A_IS)
    [A_SI  A_SS] [x_S] = [b_S]   =>    S x_S = sum_d (b_S_d - A_SI A_II^-1 b_I)
                                       x_I = A_II^-1 (b_I - A_IS x_S)

Communication is a single psum of the [ns, ns] separator Schur complement
plus its [ns] right-hand side per Gauss-Newton iteration; everything else is
device-local dense math on the MXU.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..graph import FactorGraph, FACTOR_XYT, FACTOR_XYTPOS
from ..geometry import mod2pi


@dataclass
class Partition:
    """Host-side partition of a FactorGraph into D trajectory blocks."""

    D: int
    ni_max: int                 # padded interior nodes per device
    ns: int                     # separator nodes (global)
    fmax: int                   # padded xyt factors per device
    pmax: int                   # padded xytpos factors per device
    sep_nodes: np.ndarray       # [ns] node ids
    interiors: List[np.ndarray] # per-device node ids
    local_of_node: np.ndarray   # [n] local index: interiors 0..ni-1, sep ni_max+j
    device_of_node: np.ndarray  # [n] owning device (separator: -1)
    # padded per-device factor tables in LOCAL index space
    fa: np.ndarray              # [D, fmax]
    fb: np.ndarray              # [D, fmax]
    fz: np.ndarray              # [D, fmax, 3]
    fW: np.ndarray              # [D, fmax, 3, 3]
    fvalid: np.ndarray          # [D, fmax]
    pn: np.ndarray              # [D, pmax]
    pz: np.ndarray              # [D, pmax, 3]
    pW: np.ndarray              # [D, pmax, 3, 3]
    pvalid: np.ndarray          # [D, pmax]


def partition_graph(g: FactorGraph, D: int) -> Partition:
    """Contiguous keyframe-block partition; separator = endpoints of
    cross-block factors."""
    n = g.nnodes
    block_of = np.minimum(np.arange(n) * D // n, D - 1)

    is_sep = np.zeros(n, dtype=bool)
    for f in range(g.nfactors):
        a, b = g.fnodes[f]
        if b >= 0 and block_of[a] != block_of[b]:
            is_sep[a] = True
            is_sep[b] = True

    sep_nodes = np.where(is_sep)[0].astype(np.int32)
    ns = len(sep_nodes)
    interiors = [
        np.where((block_of == d) & ~is_sep)[0].astype(np.int32)
        for d in range(D)
    ]
    ni_max = max((len(i) for i in interiors), default=0)
    ni_max = max(ni_max, 1)

    local_of_node = np.full(n, -1, dtype=np.int32)
    device_of_node = np.full(n, -1, dtype=np.int32)
    for d, ids in enumerate(interiors):
        local_of_node[ids] = np.arange(len(ids), dtype=np.int32)
        device_of_node[ids] = d
    local_of_node[sep_nodes] = ni_max + np.arange(ns, dtype=np.int32)

    # assign each factor to the block of its minimum endpoint; factors whose
    # endpoints are all separator go to the block of the first endpoint
    per_dev_xyt: List[List[int]] = [[] for _ in range(D)]
    per_dev_pos: List[List[int]] = [[] for _ in range(D)]
    for f in range(g.nfactors):
        a, b = (int(v) for v in g.fnodes[f])
        d = int(block_of[a])
        if g.ftype[f] == FACTOR_XYT:
            per_dev_xyt[d].append(f)
        else:
            per_dev_pos[d].append(f)

    fmax = max(1, max(len(v) for v in per_dev_xyt))
    pmax = max(1, max(len(v) for v in per_dev_pos))

    fa = np.zeros((D, fmax), dtype=np.int32)
    fb = np.zeros((D, fmax), dtype=np.int32)
    fz = np.zeros((D, fmax, 3))
    fW = np.zeros((D, fmax, 3, 3))
    fvalid = np.zeros((D, fmax), dtype=bool)
    pn = np.zeros((D, pmax), dtype=np.int32)
    pz = np.zeros((D, pmax, 3))
    pW = np.zeros((D, pmax, 3, 3))
    pvalid = np.zeros((D, pmax), dtype=bool)
    for d in range(D):
        for i, f in enumerate(per_dev_xyt[d]):
            a, b = (int(v) for v in g.fnodes[f])
            fa[d, i] = local_of_node[a]
            fb[d, i] = local_of_node[b]
            fz[d, i] = g.fz[f]
            fW[d, i] = g.fW[f]
            fvalid[d, i] = True
        for i, f in enumerate(per_dev_pos[d]):
            a = int(g.fnodes[f][0])
            pn[d, i] = local_of_node[a]
            pz[d, i] = g.fz[f]
            pW[d, i] = g.fW[f]
            pvalid[d, i] = True

    return Partition(
        D=D, ni_max=ni_max, ns=ns, fmax=fmax, pmax=pmax,
        sep_nodes=sep_nodes, interiors=interiors,
        local_of_node=local_of_node, device_of_node=device_of_node,
        fa=fa, fb=fb, fz=fz, fW=fW, fvalid=fvalid,
        pn=pn, pz=pz, pW=pW, pvalid=pvalid,
    )


def _local_states(part: Partition, states: np.ndarray, dtype) -> np.ndarray:
    """[D, ni_max + ns, 3] per-device local state table (interiors + the
    replicated separator)."""
    D, ni, ns = part.D, part.ni_max, part.ns
    out = np.zeros((D, ni + ns, 3), dtype=dtype)
    for d, ids in enumerate(part.interiors):
        out[d, : len(ids)] = states[ids]
    out[:, ni:] = states[part.sep_nodes][None]
    return out


def schur_solve(
    mesh: Mesh,
    g: FactorGraph,
    part: Partition,
    gn_iters: int = 2,
    tikhonov: float = 1e-4,
    dtype=np.float32,
) -> np.ndarray:
    """Distributed Gauss-Newton: returns optimized states [n, 3] (float64).

    The partition may have more blocks than mesh devices (B = k*D): each
    device vmaps the interior elimination over its k blocks, so block sizes
    (hence dense interior matrices) stay small while the mesh stays fully
    utilized.  Each GN iteration: local assembly over sharded factor tables,
    local interior elimination, one psum of the separator Schur system,
    replicated separator solve, local interior back-substitution.
    """
    D = part.D
    ni = part.ni_max
    ns = max(part.ns, 1)
    NL = ni + ns
    dt = jnp.dtype(dtype)

    axis = mesh.axis_names[0]
    ndev = mesh.devices.size
    assert D % ndev == 0, "block count must be a multiple of the mesh size"

    @partial(
        shard_map, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis), P(axis),
                  P(axis), P(axis), P(axis), P(axis)),
        out_specs=P(axis),
    )
    def gn_step_sharded(loc_states, fa, fb, fz, fW, fv, pn, pz, pW):
        # each device holds [k, ...] blocks; eliminate interiors per block,
        # sum partial separator systems locally, then psum across devices
        S_d, c_d = jax.vmap(_interior_schur)(
            loc_states, fa, fb, fz, fW, fv, pn, pz, pW)
        S = jax.lax.psum(jnp.sum(S_d, axis=0), axis)
        c = jax.lax.psum(jnp.sum(c_d, axis=0), axis)
        S = S + tikhonov * jnp.eye(3 * ns, dtype=dt)
        ds2 = jax.lax.rsqrt(jnp.maximum(jnp.diagonal(S), 1e-30))
        Lsep = jnp.linalg.cholesky(S * ds2[:, None] * ds2[None, :])
        ysep = jax.scipy.linalg.solve_triangular(Lsep, ds2 * c, lower=True)
        x_S = ds2 * jax.scipy.linalg.solve_triangular(
            Lsep.T, ysep, lower=False)
        new = jax.vmap(lambda st, A, B, C, E, F2, G, H, I2: _interior_back(
            st, A, B, C, E, F2, G, H, I2, x_S))(
            loc_states, fa, fb, fz, fW, fv, pn, pz, pW)
        return new

    def _assemble(st, a, b, z, W, valid, pnn, pzz, pWW):
        from ..factors import eval_xyt, eval_xytpos, gn_blocks_xyt

        ev = eval_xyt(st, a, b, z, W)
        Haa, Hab, Hba, Hbb, ga, gb = gn_blocks_xyt(ev, W)
        sa = jnp.where(valid, a, NL)
        sb = jnp.where(valid, b, NL)
        Ablk = jnp.zeros((NL + 1, NL + 1, 3, 3), dtype=dt)
        Bblk = jnp.zeros((NL + 1, 3), dtype=dt)
        Ablk = Ablk.at[sa, sa].add(Haa)
        Ablk = Ablk.at[sa, sb].add(Hab)
        Ablk = Ablk.at[sb, sa].add(Hba)
        Ablk = Ablk.at[sb, sb].add(Hbb)
        Bblk = Bblk.at[sa].add(ga)
        Bblk = Bblk.at[sb].add(gb)
        evp = eval_xytpos(st, pnn, pzz, pWW)
        gp = jnp.einsum("fij,fj->fi", pWW, evp.r)
        Ablk = Ablk.at[pnn, pnn].add(pWW)
        Bblk = Bblk.at[pnn].add(gp)
        dense = Ablk[:NL, :NL].transpose(0, 2, 1, 3).reshape(3 * NL, 3 * NL)
        U = jnp.triu(dense)
        A = U + jnp.triu(dense, 1).T
        B = Bblk[:NL].reshape(3 * NL)
        return A, B

    def _interior_parts(st, a, b, z, W, valid, pnn, pzz, pWW):
        A, B = _assemble(st, a, b, z, W, valid, pnn, pzz, pWW)
        nI = 3 * ni
        A_II = A[:nI, :nI] + tikhonov * jnp.eye(nI, dtype=dt)
        dvec = jax.lax.rsqrt(jnp.maximum(jnp.diagonal(A_II), 1e-30))
        Ls = jnp.linalg.cholesky(A_II * dvec[:, None] * dvec[None, :])
        Wm = jax.scipy.linalg.solve_triangular(
            Ls, dvec[:, None] * A[:nI, nI:], lower=True)
        u_I = jax.scipy.linalg.solve_triangular(Ls, dvec * B[:nI], lower=True)
        return A, B, dvec, Ls, Wm, u_I

    def _interior_schur(st, a, b, z, W, valid, pnn, pzz, pWW):
        A, B, dvec, Ls, Wm, u_I = _interior_parts(
            st, a, b, z, W, valid, pnn, pzz, pWW)
        nI = 3 * ni
        S_d = A[nI:, nI:] - Wm.T @ Wm
        c_d = B[nI:] - Wm.T @ u_I
        return S_d, c_d

    def _interior_back(st, a, b, z, W, valid, pnn, pzz, pWW, x_S):
        A, B, dvec, Ls, Wm, u_I = _interior_parts(
            st, a, b, z, W, valid, pnn, pzz, pWW)
        rhs = u_I - Wm @ x_S
        x_I = dvec * jax.scipy.linalg.solve_triangular(Ls.T, rhs, lower=False)
        x = jnp.concatenate([x_I, x_S]).reshape(NL, 3)
        new = st + x
        return new.at[:, 2].set(mod2pi(new[:, 2]))

    states = g.state[: g.nnodes].astype(np.float64).copy()
    jitted = jax.jit(gn_step_sharded)
    args_static = (
        jnp.asarray(part.fa), jnp.asarray(part.fb),
        jnp.asarray(part.fz, dt), jnp.asarray(part.fW, dt),
        jnp.asarray(part.fvalid),
        jnp.asarray(part.pn), jnp.asarray(part.pz, dt),
        jnp.asarray(part.pW, dt),
    )
    for _ in range(gn_iters):
        loc = jnp.asarray(_local_states(part, states, dtype))
        out = np.asarray(jax.device_get(jitted(loc, *args_static)))
        # write back: interiors from their device, separator from device 0
        for d, ids in enumerate(part.interiors):
            states[ids] = out[d, : len(ids)].astype(np.float64)
        states[part.sep_nodes] = out[0, part.ni_max :].astype(np.float64)[: part.ns]
    return states
