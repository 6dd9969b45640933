"""Batched factor evaluation — the linearization kernel.

TPU-native replacement for the per-factor eval vtables
(reference: xyt_factor_eval, april_graph_xyt.c:62-124; xytpos_factor_eval,
april_graph_xytpos.c:63-102).  Where the reference evaluates one factor at a
time into heap-allocated matd buffers, here ALL factors of a type are
evaluated in one fused pass over [F,...] tables: residuals, analytic 3x3
Jacobians, the 3x3 Gauss-Newton blocks J^T W J, the gradient blocks J^T W r,
and per-factor chi^2 all come out of a handful of einsums that XLA fuses and
tiles onto the VPU/MXU.

Conventions (must match the reference bit-for-bit in structure):
  * residual r = z - zhat, with mod2pi on the theta component
    (april_graph_xyt.c:105-107).
  * chi2 = r^T W r with W used exactly as stored (the reference applies W
    without symmetrizing; the M3500 text loader only fills the upper
    triangle - april_graph_xyt.c:112-121, aprilsam_demo.c:72-75).
  * xyt Jacobians: J_a = d zhat / d pose_a, J_b = d zhat / d pose_b,
    closed forms at april_graph_xyt.c:90-100.
  * xytpos: J = I3, residual z - state (april_graph_xytpos.c:73-85); note it
    linearizes about `state`, not `l_point` (the reference's eval reads
    state; there is no state_eval - april_graph_xytpos.c:83).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .geometry import mod2pi


class XytEval(NamedTuple):
    """Batched evaluation of F xyt factors."""

    r: jax.Array      # [F, 3] residuals
    Ja: jax.Array     # [F, 3, 3] d zhat / d pose_a
    Jb: jax.Array     # [F, 3, 3] d zhat / d pose_b
    chi2: jax.Array   # [F]


def eval_xyt(points, a_idx, b_idx, z, W) -> XytEval:
    """Linearize xyt (relative SE(2)) factors at the given points.

    points: [N, 3] linearization points (l_point for solver assembly,
            state for chi2 "state_eval" - both code paths in the reference
            are identical except for which array they read,
            april_graph_xyt.c:62-188).
    a_idx, b_idx: [F] int endpoint node indices.
    z: [F, 3] measurements;  W: [F, 3, 3] information matrices.
    """
    pa = points[a_idx]  # [F, 3]
    pb = points[b_idx]
    ta = pa[:, 2]
    ca, sa = jnp.cos(ta), jnp.sin(ta)
    dx = pb[:, 0] - pa[:, 0]
    dy = pb[:, 1] - pa[:, 1]

    zhat = jnp.stack([ca * dx + sa * dy, -sa * dx + ca * dy, pb[:, 2] - ta], axis=-1)

    r = z - zhat
    r = r.at[:, 2].set(mod2pi(r[:, 2]))

    zeros = jnp.zeros_like(ca)
    ones = jnp.ones_like(ca)
    # J_a rows (april_graph_xyt.c:90-93)
    Ja = jnp.stack(
        [
            jnp.stack([-ca, -sa, -sa * dx + ca * dy], axis=-1),
            jnp.stack([sa, -ca, -ca * dx - sa * dy], axis=-1),
            jnp.stack([zeros, zeros, -ones], axis=-1),
        ],
        axis=-2,
    )
    # J_b rows (april_graph_xyt.c:97-100)
    Jb = jnp.stack(
        [
            jnp.stack([ca, sa, zeros], axis=-1),
            jnp.stack([-sa, ca, zeros], axis=-1),
            jnp.stack([zeros, zeros, ones], axis=-1),
        ],
        axis=-2,
    )

    Wr = jnp.einsum("fij,fj->fi", W, r)
    chi2 = jnp.einsum("fi,fi->f", r, Wr)
    return XytEval(r=r, Ja=Ja, Jb=Jb, chi2=chi2)


class XytposEval(NamedTuple):
    r: jax.Array      # [F, 3]
    chi2: jax.Array   # [F]


def eval_xytpos(states, idx, z, W) -> XytposEval:
    """Evaluate absolute-pose prior factors at `states` (the reference always
    reads state for this type, april_graph_xytpos.c:83-85).  J = I3 so it is
    never materialized; assembly uses W directly."""
    s = states[idx]
    r = z - s
    r = r.at[:, 2].set(mod2pi(r[:, 2]))
    Wr = jnp.einsum("fij,fj->fi", W, r)
    chi2 = jnp.einsum("fi,fi->f", r, Wr)
    return XytposEval(r=r, chi2=chi2)


def gn_blocks_xyt(ev: XytEval, W):
    """Gauss-Newton blocks for xyt factors.

    Returns (Haa, Hab, Hba, Hbb, ga, gb):
      H.. = J_.^T W J_.  ([F,3,3]),  g. = J_.^T W r  ([F,3]).
    Matches the reference's matd_op("M'*M") chains (aprilsam.c:162-187) in one
    einsum batch.  W is used exactly as stored (no symmetrization).
    """
    JaW = jnp.einsum("fki,fkl->fil", ev.Ja, W)  # Ja^T W
    JbW = jnp.einsum("fki,fkl->fil", ev.Jb, W)
    Haa = jnp.einsum("fil,flj->fij", JaW, ev.Ja)
    Hab = jnp.einsum("fil,flj->fij", JaW, ev.Jb)
    Hba = jnp.einsum("fil,flj->fij", JbW, ev.Ja)
    Hbb = jnp.einsum("fil,flj->fij", JbW, ev.Jb)
    ga = jnp.einsum("fil,fl->fi", JaW, ev.r)
    gb = jnp.einsum("fil,fl->fi", JbW, ev.r)
    return Haa, Hab, Hba, Hbb, ga, gb


def gn_blocks_xytpos(ev: XytposEval, W):
    """H = W (J = I), g = W r for prior factors."""
    g = jnp.einsum("fij,fj->fi", W, ev.r)
    return W, g


def _quad_form(W, r0, r1, r2):
    """sum_ij W_ij r_i r_j with W used exactly as stored (no symmetrization,
    matching april_graph_xyt.c:112-121), expanded per column so the whole
    chain stays one elementwise fusion (no [F,3,3] x [F,3] contraction)."""
    return (W[:, 0, 0] * r0 * r0 + W[:, 1, 1] * r1 * r1
            + W[:, 2, 2] * r2 * r2
            + (W[:, 0, 1] + W[:, 1, 0]) * r0 * r1
            + (W[:, 0, 2] + W[:, 2, 0]) * r0 * r2
            + (W[:, 1, 2] + W[:, 2, 1]) * r1 * r2)


def graph_chi2(states, xyt_a, xyt_b, xyt_z, xyt_W, pos_idx, pos_z, pos_W,
               xyt_valid=None, pos_valid=None):
    """Fused total-graph chi2 at `states`, replicating the reference's
    0.5x (xyt, via state_eval) / 1.0x (xytpos) convention
    (april_graph_chi2, april_graph.c:79-98).

    Optional boolean masks support padded factor tables (fixed shapes across
    incremental steps).  Written column-scalarized: per-step cost is bounded
    by kernel-launch count on TPU, and this form fuses into a handful of
    kernels (two gathers + one elementwise chain + reductions) instead of
    the ~30 that the generic eval produces.
    """
    total = jnp.zeros((), dtype=states.dtype)
    if xyt_a.shape[0]:
        pa = states[xyt_a]
        pb = states[xyt_b]
        ta = pa[:, 2]
        ca, sa = jnp.cos(ta), jnp.sin(ta)
        dx = pb[:, 0] - pa[:, 0]
        dy = pb[:, 1] - pa[:, 1]
        r0 = xyt_z[:, 0] - (ca * dx + sa * dy)
        r1 = xyt_z[:, 1] - (-sa * dx + ca * dy)
        r2 = mod2pi(xyt_z[:, 2] - (pb[:, 2] - ta))
        c = _quad_form(xyt_W, r0, r1, r2)
        if xyt_valid is not None:
            c = jnp.where(xyt_valid, c, 0.0)
        total = total + 0.5 * jnp.sum(c)
    if pos_idx.shape[0]:
        s = states[pos_idx]
        r0 = pos_z[:, 0] - s[:, 0]
        r1 = pos_z[:, 1] - s[:, 1]
        r2 = mod2pi(pos_z[:, 2] - s[:, 2])
        c = _quad_form(pos_W, r0, r1, r2)
        if pos_valid is not None:
            c = jnp.where(pos_valid, c, 0.0)
        total = total + jnp.sum(c)
    return total
