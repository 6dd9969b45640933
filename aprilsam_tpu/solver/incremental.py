"""Hybrid incremental/batch solver — the AprilSAM algorithm, TPU-native.

Re-design of april_graph_cholesky_inc (reference: aprilsam.c:377-576).  The
reference mutates sparse rows in place through four recursive passes over the
"affected" subtree (reconstruct aprilsam.c:791-848, scatter-add :508-542,
partial refactorization :850-906, tree-gated solves :702-789).  The TPU
recast exploits two structural facts:

  1. row p of R has nonzeros only at etree ancestors of p;
  2. the affected set F (paths from touched nodes to the root,
     aprilsam.c:482-498) is ancestor-closed.

Together these make the affected submatrix self-contained: every nonzero of
every affected row lies in an affected column.  The whole
reconstruct -> add -> refactor -> solve cycle therefore collapses into ONE
dense frontal update on a padded [3m, 3m] tile:

      S      = R_F^T R_F + dA_new        (reconstruct + scatter-add)
      R_F'   = chol(S)^T                 (partial refactorization)
      y_F'   = R_F'^{-T} (R_F^T y_F + g) (gated forward solve)

followed by either
  * fast path (naffected <= 5): x_F = R_F'^{-1} y_F', update only affected
    nodes + relinearization bookkeeping on their fringe — exactly the
    reference's pruned descent (solve_node always prunes at the first
    unchanged node because delta_X is overwritten before the delta-delta
    comparison, aprilsam.c:752-771); or
  * full path: a panel-blocked back-substitution over the whole block-sparse
    R (lax.scan over 384-wide panels: sparse gather-matvec + dense
    triangular solve per panel), updating every node (aprilsam.c:721-779
    with naffected > 5 disables pruning).

Batch fallback policy is the reference's, replicated exactly: start_over
counts nodes whose GN delta ever exceeded (delta_xy, delta_theta) since the
last batch (aprilsam.c:741-751); a wall-clock gate forces INT_MAX when the
step exceeds batch_time/3 (aprilsam.c:557-559); start_over > nthreshold
triggers a full batch epoch that records batch_time (aprilsam.c:566-575).
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from functools import partial
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry import mod2pi
from ..graph import FactorGraph, FACTOR_XYT, FACTOR_XYTPOS
from ..factors import eval_xyt, eval_xytpos, gn_blocks_xyt
from .batch import BatchInfo, run_batch_epoch
from .config import SolverConfig
from .ingest import ingest_graph
from .state import DeviceState, init_device_state, state_chi2
from . import symbolic as sym_mod
from .symbolic import SymbolicState

INT_MAX = np.iinfo(np.int32).max


# ======================================================================
# host step planning
# ======================================================================

@dataclass
class StepPlan:
    """Everything the device step needs, computed on host per step."""

    m: int                      # |F|
    naffected: int              # reference tr->naffected (marking walk count)
    MAXAFF: int                 # frontal bucket (static)
    F_pos: np.ndarray           # [MAXAFF] global positions (pad sentinel NCAP)
    F_node: np.ndarray          # [MAXAFF] node ids (pad 0)
    gather_fc: np.ndarray       # [MAXAFF, BCAP] frontal col slot of old slot
    scat_fc: np.ndarray         # [MAXAFF, BCAP] frontal col slot of new slot
    new_Ridx: np.ndarray        # [MAXAFF, BCAP] new column indices for F rows
    new_Rnnz: np.ndarray        # [MAXAFF]
    nf_a_slot: np.ndarray       # [KNEW] frontal slot of xyt endpoint a (-pad)
    nf_b_slot: np.ndarray       # [KNEW]
    nf_a: np.ndarray            # [KNEW] node ids
    nf_b: np.ndarray
    nf_z: np.ndarray            # [KNEW, 3]
    nf_W: np.ndarray            # [KNEW, 3, 3]
    n_new_xyt: int
    np_slot: np.ndarray         # [KPOS] frontal slot of xytpos node
    np_node: np.ndarray         # [KPOS]
    np_z: np.ndarray
    np_W: np.ndarray
    n_new_pos: int
    MAXFR: int
    fringe_overflow: bool
    fringe_pos: np.ndarray      # [MAXFR]
    fringe_node: np.ndarray     # [MAXFR]
    fringe_fc: np.ndarray       # [MAXFR, BCAP] frontal col slots of fringe rows
    n_fringe: int


def _bucket(n: int, buckets) -> Optional[int]:
    for b in buckets:
        if n <= b:
            return b
    return None


def _padded_rows(patterns: List[np.ndarray], rows: np.ndarray, BCAP: int,
                 sentinel: int) -> Tuple[np.ndarray, np.ndarray]:
    out = np.full((len(rows), BCAP), sentinel, dtype=np.int32)
    nnz = np.zeros(len(rows), dtype=np.int32)
    for i, p in enumerate(rows):
        pat = patterns[p]
        if len(pat) > BCAP:
            raise OverflowError("row_block_capacity exceeded")
        out[i, : len(pat)] = pat
        nnz[i] = len(pat)
    return out, nnz


def plan_step(
    sym: SymbolicState,
    cfg: SolverConfig,
    g: FactorGraph,
    f0: int,
    f1: int,
    n_old: int,
) -> Optional[StepPlan]:
    """Host symbolic work for one incremental step.  Returns None when the
    affected set exceeds the largest frontal bucket (caller falls back to a
    batch epoch, the moral equivalent of the reference's wall-clock gate)."""
    NCAP = cfg.node_capacity
    BCAP = cfg.row_block_capacity

    # 1. extend ordering with new nodes (aprilsam.c:392-397)
    new_ids = list(range(n_old, g.nnodes))
    sym_mod.append_nodes(sym, new_ids)

    # 2. mark affected (walk to root with OLD parents; new nodes isolated)
    touched = []
    for f in range(f0, f1):
        a, b = g.fnodes[f]
        touched.append(int(a))
        if b >= 0:
            touched.append(int(b))
    F = sym_mod.mark_affected(sym, touched)
    naffected = len(F)
    # every new row must be (re)factored even if untouched
    new_pos = np.asarray([int(sym.pos[i]) for i in new_ids], dtype=np.int32)
    F = np.unique(np.concatenate([F, new_pos])) if len(new_pos) else F
    m = len(F)

    MAXAFF = _bucket(m, cfg.frontal_buckets)
    if MAXAFF is None:
        return None

    # 3. gather maps from OLD patterns (before symbolic update)
    pos2f = np.full(NCAP + 1, -1, dtype=np.int32)
    pos2f[F] = np.arange(m, dtype=np.int32)
    old_rows, _ = _padded_rows(sym.patterns, F, BCAP, NCAP)
    gather_fc = np.where(old_rows < NCAP, pos2f[old_rows], -1).astype(np.int32)

    # 4. symbolic update (pattern growth + new parents, the structural
    #    equivalent of search_tree_append, aprilsam.c:958-987)
    edges = [(int(g.fnodes[f][0]), int(g.fnodes[f][1])) for f in range(f0, f1)]
    sym_mod.update_patterns_incremental(sym, F, edges)

    new_rows, new_nnz = _padded_rows(sym.patterns, F, BCAP, NCAP)
    scat_fc = np.where(new_rows < NCAP, pos2f[new_rows], -1).astype(np.int32)

    # 5. fringe (children of F outside F, NEW tree)
    fringe = sym_mod.fringe_of(sym, F)
    MAXFR = _bucket(len(fringe), (32, 128))
    fringe_overflow = MAXFR is None
    if fringe_overflow:
        # extremely rare: take the full path instead of compiling huge
        # fringe buckets (documented policy deviation)
        fringe = fringe[:0]
        MAXFR = 32
    fr_rows, _ = _padded_rows(sym.patterns, fringe, BCAP, NCAP)
    fringe_fc = np.where(fr_rows < NCAP, pos2f[fr_rows], -1).astype(np.int32)

    # 6. pack padded plan arrays
    def pad1(a, n, fill):
        out = np.full(n, fill, dtype=np.int32)
        out[: len(a)] = a
        return out

    def pad2(a, n, fill):
        out = np.full((n,) + a.shape[1:], fill, dtype=a.dtype)
        out[: len(a)] = a
        return out

    F_pos = pad1(F, MAXAFF, NCAP)
    F_node = pad1(sym.order[F], MAXAFF, 0)

    # new factors split by type, endpoints to frontal slots
    nf_a, nf_b, nf_z, nf_W = [], [], [], []
    np_n, np_z, np_W = [], [], []
    for f in range(f0, f1):
        a, b = (int(v) for v in g.fnodes[f])
        if g.ftype[f] == FACTOR_XYT:
            nf_a.append(a)
            nf_b.append(b)
            nf_z.append(g.fz[f])
            nf_W.append(g.fW[f])
        else:
            np_n.append(a)
            np_z.append(g.fz[f])
            np_W.append(g.fW[f])
    KNEW = cfg.new_factor_capacity
    if len(nf_a) > KNEW or len(np_n) > KNEW:
        raise OverflowError("new_factor_capacity exceeded; raise it in config")

    def slots_of(nodes):
        return np.asarray(
            [int(pos2f[sym.pos[i]]) for i in nodes], dtype=np.int32
        )

    plan = StepPlan(
        m=m,
        naffected=naffected,
        MAXAFF=MAXAFF,
        F_pos=F_pos,
        F_node=F_node,
        gather_fc=pad2(gather_fc, MAXAFF, -1),
        scat_fc=pad2(scat_fc, MAXAFF, -1),
        new_Ridx=pad2(new_rows, MAXAFF, NCAP),
        new_Rnnz=pad1(new_nnz, MAXAFF, 0),
        nf_a_slot=pad1(slots_of(nf_a), KNEW, 0),
        nf_b_slot=pad1(slots_of(nf_b), KNEW, 0),
        nf_a=pad1(nf_a, KNEW, 0),
        nf_b=pad1(nf_b, KNEW, 0),
        nf_z=pad2(np.asarray(nf_z, dtype=np.float64).reshape(-1, 3), KNEW, 0.0)
        if nf_z else np.zeros((KNEW, 3)),
        nf_W=pad2(np.asarray(nf_W, dtype=np.float64).reshape(-1, 3, 3), KNEW, 0.0)
        if nf_W else np.zeros((KNEW, 3, 3)),
        n_new_xyt=len(nf_a),
        np_slot=pad1(slots_of(np_n), KNEW, 0),
        np_node=pad1(np_n, KNEW, 0),
        np_z=pad2(np.asarray(np_z, dtype=np.float64).reshape(-1, 3), KNEW, 0.0)
        if np_z else np.zeros((KNEW, 3)),
        np_W=pad2(np.asarray(np_W, dtype=np.float64).reshape(-1, 3, 3), KNEW, 0.0)
        if np_W else np.zeros((KNEW, 3, 3)),
        n_new_pos=len(np_n),
        MAXFR=MAXFR,
        fringe_overflow=fringe_overflow,
        fringe_pos=pad1(fringe, MAXFR, NCAP),
        fringe_node=pad1(sym.order[fringe] if len(fringe) else [], MAXFR, 0),
        fringe_fc=pad2(fringe_fc, MAXFR, -1),
        n_fringe=len(fringe),
    )
    return plan


# ======================================================================
# device frontal update (shared by fast and full paths)
# ======================================================================

def _frontal_update(ds: DeviceState, MAXAFF: int, F_pos, F_node, gather_fc,
                    scat_fc, new_Ridx, new_Rnnz, m,
                    nf_a_slot, nf_b_slot, nf_a, nf_b, nf_z, nf_W, n_new_xyt,
                    np_slot, np_node, np_z, np_W, n_new_pos):
    """Dense frontal reconstruct + scatter-add + refactor + forward solve.

    Returns (ds', R' upper [3M,3M], y' [3M], valid masks, spd).
    """
    NCAP = ds.state.shape[0]
    BCAP = ds.R_idx.shape[1]
    dtype = ds.R_blocks.dtype
    M = MAXAFF
    K3 = 3 * M

    row_valid = jnp.arange(M, dtype=jnp.int32) < m           # [M]
    scalar_valid = jnp.repeat(row_valid, 3)                  # [3M]

    # ---- gather frontal R_F
    rows = ds.R_blocks[jnp.clip(F_pos, 0, NCAP - 1)]         # [M, BCAP, 3, 3]
    rows = jnp.where(row_valid[:, None, None, None], rows, 0.0)
    r_ids = jnp.broadcast_to(jnp.arange(M)[:, None], (M, BCAP))
    fc = gather_fc
    fc_ok = fc >= 0
    fc_safe = jnp.where(fc_ok, fc, M)                        # M = scratch col
    RF = jnp.zeros((M, M + 1, 3, 3), dtype=dtype)
    RF = RF.at[r_ids, fc_safe].set(jnp.where(fc_ok[..., None, None], rows, 0.0))
    RF = RF[:, :M]                                           # [M, M, 3, 3]
    R_dense = RF.transpose(0, 2, 1, 3).reshape(K3, K3)

    # identity on padded diagonal slots keeps the stacked system regular
    R_dense = R_dense + jnp.where(scalar_valid, 0.0, 1.0) * jnp.eye(
        K3, dtype=dtype)

    # ---- y gather
    yscal = (3 * jnp.clip(F_pos, 0, NCAP - 1)[:, None]
             + jnp.arange(3)[None, :]).reshape(-1)           # [3M]
    y_F = jnp.where(scalar_valid, ds.y[yscal], 0.0)

    # ---- new measurement rows (aprilsam.c:508-542, but as stacked
    # square-root rows instead of J^T W J block sums: the frontal update is
    # a QR factor update  qr([R_F; W^{1/2} J]) — algebraically identical
    # (R'^T R' = R_F^T R_F + J^T W J) but backward stable in float32,
    # whereas forming R^T R squares the condition number)
    KNEW = nf_a.shape[0]
    nf_valid = jnp.arange(KNEW, dtype=jnp.int32) < n_new_xyt
    ev = eval_xyt(ds.l_point, jnp.clip(nf_a, 0, NCAP - 1),
                  jnp.clip(nf_b, 0, NCAP - 1), nf_z.astype(dtype),
                  nf_W.astype(dtype))
    npv = jnp.arange(KNEW, dtype=jnp.int32) < n_new_pos
    evp = eval_xytpos(ds.state, jnp.clip(np_node, 0, NCAP - 1),
                      np_z.astype(dtype), np_W.astype(dtype))

    def w_sqrt(W):
        # symmetric square root via eigh (robust to singular priors); W is
        # used in its upper-mirrored symmetric form — identical to the
        # reference for every symmetric/diagonal W it ships with
        Ws = jnp.triu(W) + jnp.triu(W, 1).transpose(0, 2, 1)
        lam, V = jnp.linalg.eigh(Ws)
        lam = jnp.sqrt(jnp.maximum(lam, 0.0))
        return jnp.einsum("fik,fk,fjk->fij", V, lam, V)

    Wh_xyt = w_sqrt(nf_W.astype(dtype)) * nf_valid[:, None, None]
    Wh_pos = w_sqrt(np_W.astype(dtype)) * npv[:, None, None]

    sa = jnp.where(nf_valid, nf_a_slot, M)
    sb = jnp.where(nf_valid, nf_b_slot, M)
    sp = jnp.where(npv, np_slot, M)

    # xyt rows: W^{1/2} [Ja at col sa | Jb at col sb], rhs W^{1/2} r
    Jrow = jnp.zeros((KNEW, 3, M + 1, 3), dtype=dtype)
    Jrow = Jrow.at[jnp.arange(KNEW), :, sa, :].add(
        jnp.einsum("fik,fkj->fij", Wh_xyt, ev.Ja))
    Jrow = Jrow.at[jnp.arange(KNEW), :, sb, :].add(
        jnp.einsum("fik,fkj->fij", Wh_xyt, ev.Jb))
    xyt_rows = Jrow[:, :, :M, :].reshape(KNEW * 3, K3)
    xyt_rhs = jnp.einsum("fik,fk->fi", Wh_xyt, ev.r).reshape(KNEW * 3)

    Prow = jnp.zeros((KNEW, 3, M + 1, 3), dtype=dtype)
    Prow = Prow.at[jnp.arange(KNEW), :, sp, :].add(Wh_pos)
    pos_rows = Prow[:, :, :M, :].reshape(KNEW * 3, K3)
    pos_rhs = jnp.einsum("fik,fk->fi", Wh_pos, evp.r).reshape(KNEW * 3)

    C = jnp.concatenate([R_dense, xyt_rows, pos_rows], axis=0)
    d_stack = jnp.concatenate([y_F, xyt_rhs, pos_rhs], axis=0)

    # ---- refactor: thin QR (aprilsam.c:850-906, square-root form)
    Q, Rq = jnp.linalg.qr(C, mode="reduced")
    sgn = jnp.where(jnp.diagonal(Rq) < 0, -1.0, 1.0).astype(dtype)
    R_up = sgn[:, None] * Rq
    diag = jnp.diagonal(R_up)
    spd = jnp.all(jnp.where(scalar_valid, jnp.isfinite(diag) & (diag > 0), True))

    # ---- gated forward solve on y (aprilsam.c:702-719): y' = Q^T d
    y_new = sgn * (Q.T @ d_stack)

    # scatter y back (valid rows only)
    y_out = ds.y.at[jnp.where(scalar_valid, yscal, NCAP * 3)].set(
        y_new, mode="drop"
    )

    # ---- scatter R_F' back on the NEW pattern
    Rt = R_up.reshape(M, 3, M, 3).transpose(0, 2, 1, 3)      # [Mrow, Mcol, 3, 3]
    sc_ok = scat_fc >= 0
    sc_safe = jnp.clip(scat_fc, 0, M - 1)
    newblocks = Rt[r_ids, sc_safe]                           # [M, BCAP, 3, 3]
    newblocks = jnp.where(sc_ok[..., None, None], newblocks, 0.0)
    dest_rows = jnp.where(row_valid, F_pos, NCAP)
    R_blocks = ds.R_blocks.at[
        jnp.broadcast_to(dest_rows[:, None], (M, BCAP)),
        jnp.broadcast_to(jnp.arange(BCAP)[None, :], (M, BCAP)),
    ].set(newblocks, mode="drop")
    R_idx = ds.R_idx.at[dest_rows].set(new_Ridx, mode="drop")
    R_nnz = ds.R_nnz.at[dest_rows].set(new_Rnnz, mode="drop")

    ds = ds._replace(R_blocks=R_blocks, R_idx=R_idx, R_nnz=R_nnz, y=y_out)
    return ds, R_up, y_new, row_valid, scalar_valid, spd


@partial(jax.jit, static_argnames=("MAXAFF", "MAXFR"),
         donate_argnames=("ds",))
def inc_step_fast(
    ds: DeviceState,
    F_pos, F_node, gather_fc, scat_fc, new_Ridx, new_Rnnz, m,
    nf_a_slot, nf_b_slot, nf_a, nf_b, nf_z, nf_W, n_new_xyt,
    np_slot, np_node, np_z, np_W, n_new_pos,
    fringe_pos, fringe_node, fringe_fc, n_fringe,
    delta_xy, delta_theta,
    MAXAFF: int, MAXFR: int,
):
    """Fast path (naffected <= 5): frontal update + affected-only
    back-substitution + fringe bookkeeping."""
    NCAP = ds.state.shape[0]
    BCAP = ds.R_idx.shape[1]
    dtype = ds.R_blocks.dtype
    M = MAXAFF

    ds, R_up, y_new, row_valid, scalar_valid, spd = _frontal_update(
        ds, MAXAFF, F_pos, F_node, gather_fc, scat_fc, new_Ridx, new_Rnnz, m,
        nf_a_slot, nf_b_slot, nf_a, nf_b, nf_z, nf_W, n_new_xyt,
        np_slot, np_node, np_z, np_W, n_new_pos)

    # back-substitution restricted to F (exact: F is ancestor-closed)
    x_F = jax.scipy.linalg.solve_triangular(R_up, y_new, lower=False)
    dxF = x_F.reshape(M, 3)

    # fringe: children of F — compute x, delta_X and relinearization only
    # (solve_node visits them once and prunes, aprilsam.c:752-771)
    fr_valid = jnp.arange(MAXFR, dtype=jnp.int32) < n_fringe
    fr_rows = ds.R_blocks[jnp.clip(fringe_pos, 0, NCAP - 1)]   # [MAXFR,BCAP,3,3]
    fc_ok = fringe_fc >= 0
    xF_blocks = dxF[jnp.clip(fringe_fc, 0, M - 1)]             # [MAXFR,BCAP,3]
    contrib = jnp.einsum("kbij,kbj->kbi", fr_rows,
                         jnp.where(fc_ok[..., None], xF_blocks, 0.0))
    # slot 0 is the diagonal block; off-diagonal sum excludes it
    off = jnp.sum(contrib[:, 1:], axis=1)                      # [MAXFR, 3]
    yscal_fr = (3 * jnp.clip(fringe_pos, 0, NCAP - 1)[:, None]
                + jnp.arange(3)[None, :])
    y_fr = ds.y[yscal_fr]                                      # [MAXFR, 3]
    T = fr_rows[:, 0]                                          # [MAXFR, 3, 3] upper
    rhs = y_fr - off
    x_fr = jax.vmap(
        lambda Tk, bk: jax.scipy.linalg.solve_triangular(Tk, bk, lower=False)
    )(T + jnp.eye(3, dtype=dtype) * jnp.where(fr_valid, 0.0, 1.0)[:, None, None],
      rhs)

    # ---- updates & bookkeeping
    def relin_mask(dx):
        return (jnp.abs(dx[:, 0]) > delta_xy) | (jnp.abs(dx[:, 1]) > delta_xy) \
            | (jnp.abs(dx[:, 2]) > delta_theta)

    ids_F = jnp.where(row_valid, F_node, NCAP)
    ids_fr = jnp.where(fr_valid, fringe_node, NCAP)

    # relinearization counting over F then fringe
    already = ds.relinearized
    newly_F = relin_mask(dxF) & row_valid & ~already[jnp.clip(ids_F, 0, NCAP - 1)]
    already = already.at[ids_F].set(
        already[jnp.clip(ids_F, 0, NCAP - 1)] | (relin_mask(dxF) & row_valid),
        mode="drop")
    newly_fr = relin_mask(x_fr) & fr_valid & ~already[jnp.clip(ids_fr, 0, NCAP - 1)]
    already = already.at[ids_fr].set(
        already[jnp.clip(ids_fr, 0, NCAP - 1)] | (relin_mask(x_fr) & fr_valid),
        mode="drop")
    start_over = ds.start_over + jnp.sum(newly_F).astype(jnp.int32) \
        + jnp.sum(newly_fr).astype(jnp.int32)

    # delta_X for F and fringe
    delta_X = ds.delta_X.at[ids_F].set(dxF, mode="drop")
    delta_X = delta_X.at[ids_fr].set(x_fr, mode="drop")

    # state update only for F (NaN guard + wrap)
    ok = row_valid & ~jnp.any(jnp.isnan(dxF), axis=1)
    lp = ds.l_point[jnp.clip(ids_F, 0, NCAP - 1)]
    new_state_F = lp + dxF
    new_state_F = new_state_F.at[:, 2].set(mod2pi(new_state_F[:, 2]))
    state = ds.state.at[jnp.where(ok, ids_F, NCAP)].set(new_state_F, mode="drop")

    ds = ds._replace(state=state, delta_X=delta_X, relinearized=already,
                     start_over=start_over)
    chi2 = state_chi2(ds)
    return ds, chi2, spd


@partial(jax.jit, static_argnames=("MAXAFF", "PANEL"),
         donate_argnames=("ds",))
def inc_step_full(
    ds: DeviceState,
    F_pos, F_node, gather_fc, scat_fc, new_Ridx, new_Rnnz, m,
    nf_a_slot, nf_b_slot, nf_a, nf_b, nf_z, nf_W, n_new_xyt,
    np_slot, np_node, np_z, np_W, n_new_pos,
    delta_xy, delta_theta,
    MAXAFF: int, PANEL: int,
):
    """Full path (naffected > 5): frontal update + panel-blocked
    back-substitution over the whole factor, updating every node."""
    NCAP = ds.state.shape[0]
    BCAP = ds.R_idx.shape[1]
    dtype = ds.R_blocks.dtype

    ds, R_up, y_new, row_valid, scalar_valid, spd = _frontal_update(
        ds, MAXAFF, F_pos, F_node, gather_fc, scat_fc, new_Ridx, new_Rnnz, m,
        nf_a_slot, nf_b_slot, nf_a, nf_b, nf_z, nf_W, n_new_xyt,
        np_slot, np_node, np_z, np_W, n_new_pos)

    # ---- panel back-substitution x = R^{-1} y over all block rows
    NPAN = NCAP // PANEL
    n = ds.nnodes

    xb = jnp.zeros((NCAP + 1, 3), dtype=dtype)  # row NCAP = sentinel zero

    def panel_body(xb, j_rev):
        j = NPAN - 1 - j_rev
        p0 = j * PANEL
        rows = jax.lax.dynamic_slice_in_dim(ds.R_blocks, p0, PANEL, 0)
        idx = jax.lax.dynamic_slice_in_dim(ds.R_idx, p0, PANEL, 0)
        yp = jax.lax.dynamic_slice_in_dim(
            ds.y.reshape(NCAP, 3), p0, PANEL, 0)
        beyond = idx >= (p0 + PANEL)
        xg = xb[jnp.clip(idx, 0, NCAP)]                        # [PANEL,BCAP,3]
        acc = jnp.einsum("pbij,pbj->pbi", rows,
                         jnp.where(beyond[..., None], xg, 0.0))
        rhs = yp - jnp.sum(acc, axis=1)                        # [PANEL, 3]
        # dense within-panel triangle
        inpan = (idx >= p0) & (idx < p0 + PANEL)
        lc = jnp.where(inpan, idx - p0, PANEL)
        pr = jnp.broadcast_to(jnp.arange(PANEL)[:, None], (PANEL, BCAP))
        T = jnp.zeros((PANEL, PANEL + 1, 3, 3), dtype=dtype)
        T = T.at[pr, lc].set(jnp.where(inpan[..., None, None], rows, 0.0))
        Td = T[:, :PANEL].transpose(0, 2, 1, 3).reshape(3 * PANEL, 3 * PANEL)
        # identity on rows beyond the active range so the triangle is regular
        prow = p0 + jnp.arange(PANEL, dtype=jnp.int32)
        active = jnp.repeat(prow < n, 3)
        Td = Td + jnp.where(active, 0.0, 1.0) * jnp.eye(3 * PANEL, dtype=dtype)
        xp = jax.scipy.linalg.solve_triangular(
            Td, jnp.where(active, rhs.reshape(-1), 0.0), lower=False)
        xb = jax.lax.dynamic_update_slice_in_dim(
            xb, xp.reshape(PANEL, 3), p0, 0)
        return xb, None

    xb, _ = jax.lax.scan(panel_body, xb, jnp.arange(NPAN))
    x_pos = xb[:NCAP]                                          # position space

    # scatter to node space: dx[node] = x_pos[pos[node]]
    node_ids = jnp.arange(NCAP, dtype=jnp.int32)
    valid = node_ids < n
    dx = jnp.where(valid[:, None], x_pos[jnp.clip(ds.pos, 0, NCAP - 1)], 0.0)

    # relinearization counting over every visited (= every valid) node
    relin = ((jnp.abs(dx[:, 0]) > delta_xy) | (jnp.abs(dx[:, 1]) > delta_xy)
             | (jnp.abs(dx[:, 2]) > delta_theta)) & valid
    newly = relin & ~ds.relinearized
    start_over = ds.start_over + jnp.sum(newly).astype(jnp.int32)
    relinearized = ds.relinearized | relin

    # update every node (naffected > 5 disables pruning, aprilsam.c:755-757)
    ok = valid & ~jnp.any(jnp.isnan(dx), axis=1)
    new_state = jnp.where(ok[:, None], ds.l_point + dx, ds.state)
    new_state = new_state.at[:, 2].set(
        jnp.where(ok, mod2pi(new_state[:, 2]), new_state[:, 2]))
    delta_X = jnp.where(ok[:, None], dx, ds.delta_X)

    ds = ds._replace(state=new_state, delta_X=delta_X,
                     relinearized=relinearized, start_over=start_over)
    chi2 = state_chi2(ds)
    return ds, chi2, spd


# ======================================================================
# orchestration
# ======================================================================

class IncrementalSolver:
    """Drop-in counterpart of the reference's incremental API: call
    solve() for a batch epoch, update() after appending nodes/factors for an
    AprilSAM incremental step with automatic batch fallback."""

    def __init__(self, cfg: Optional[SolverConfig] = None):
        self.cfg = cfg or SolverConfig()
        self.ds = init_device_state(self.cfg)
        self.sym: Optional[SymbolicState] = None
        self.factor_num = 0        # factors included in the last solve
        self.node_num = 0
        self.batch_time_ms = 0.0   # param->batch_time
        self._ingested_nodes = 0
        self._ingested_factors = 0
        self.last_path = "none"    # "fast" | "full" | "batch" (observability)

    # ---------------------------------------------------------------

    def _ingest(self, g: FactorGraph):
        self.ds = ingest_graph(
            self.ds, g, self.cfg, self._ingested_nodes, self._ingested_factors)
        self._ingested_nodes = g.nnodes
        self._ingested_factors = g.nfactors

    def _grow_row_capacity(self):
        """Re-shape the R storage for a larger per-row block capacity (fill
        outgrew the static headroom; recompile-once event)."""
        import dataclasses

        cfg = dataclasses.replace(
            self.cfg,
            row_block_capacity=int(self.cfg.row_block_capacity * 3 // 2),
        )
        NCAP, BCAP = cfg.node_capacity, cfg.row_block_capacity
        dt = self.ds.R_blocks.dtype
        self.ds = self.ds._replace(
            R_blocks=jnp.zeros((NCAP, BCAP, 3, 3), dtype=dt),
            R_idx=jnp.full((NCAP, BCAP), NCAP, dtype=jnp.int32),
            R_nnz=jnp.zeros((NCAP,), dtype=jnp.int32),
        )
        self.cfg = cfg

    def _run_batch(self, g: FactorGraph, record_time: bool = False) -> BatchInfo:
        t0 = time.perf_counter()
        while True:
            try:
                self.ds, self.sym, info = run_batch_epoch(
                    self.ds, self.cfg, g.nnodes,
                    g.ftype[: g.nfactors], g.fnodes[: g.nfactors])
                break
            except OverflowError:
                self._grow_row_capacity()
        jax.block_until_ready(self.ds.state)
        if record_time:
            # param->batch_time is recorded only when a batch is triggered
            # from the incremental path (aprilsam.c:568-572)
            self.batch_time_ms = (time.perf_counter() - t0) * 1e3
        self.factor_num = g.nfactors
        self.node_num = g.nnodes
        self.last_path = "batch"
        return info

    def solve(self, g: FactorGraph) -> BatchInfo:
        """Full batch solve (april_graph_cholesky)."""
        if g.nnodes == 0 or g.nfactors == 0:
            return BatchInfo(chi2=0.0, spd=True, n=0)
        self._ingest(g)
        return self._run_batch(g)

    def update(self, g: FactorGraph) -> BatchInfo:
        """Incremental update (april_graph_cholesky_inc): guards, frontal
        step, policy gates, batch fallback."""
        # guards (aprilsam.c:380-385)
        if g.nnodes == 0 or g.nfactors == 0:
            return BatchInfo(chi2=0.0, spd=True, n=0)
        if self.sym is None:
            return BatchInfo(chi2=float(state_chi2(self.ds)), spd=True, n=0)
        if self.factor_num == g.nfactors:
            return BatchInfo(chi2=float(state_chi2(self.ds)), spd=True, n=0)

        t0 = time.perf_counter()
        self._ingest(g)
        try:
            plan = plan_step(self.sym, self.cfg, g, self.factor_num,
                             g.nfactors, self.node_num)
        except OverflowError:
            # incremental fill outgrew row_block_capacity: a fresh batch
            # epoch (new ordering) shrinks the fill again
            plan = None
        self.factor_num = g.nfactors
        self.node_num = g.nnodes

        if plan is None:
            # affected set exceeds the largest frontal bucket: escalate to a
            # batch epoch (the reference's wall-clock gate would fire on such
            # steps; documented policy deviation)
            return self._run_batch(g, record_time=True)

        dt = self.cfg.jnp_dtype
        common = dict(
            F_pos=jnp.asarray(plan.F_pos), F_node=jnp.asarray(plan.F_node),
            gather_fc=jnp.asarray(plan.gather_fc),
            scat_fc=jnp.asarray(plan.scat_fc),
            new_Ridx=jnp.asarray(plan.new_Ridx),
            new_Rnnz=jnp.asarray(plan.new_Rnnz),
            m=jnp.int32(plan.m),
            nf_a_slot=jnp.asarray(plan.nf_a_slot),
            nf_b_slot=jnp.asarray(plan.nf_b_slot),
            nf_a=jnp.asarray(plan.nf_a), nf_b=jnp.asarray(plan.nf_b),
            nf_z=jnp.asarray(plan.nf_z, dtype=dt),
            nf_W=jnp.asarray(plan.nf_W, dtype=dt),
            n_new_xyt=jnp.int32(plan.n_new_xyt),
            np_slot=jnp.asarray(plan.np_slot),
            np_node=jnp.asarray(plan.np_node),
            np_z=jnp.asarray(plan.np_z, dtype=dt),
            np_W=jnp.asarray(plan.np_W, dtype=dt),
            n_new_pos=jnp.int32(plan.n_new_pos),
            delta_xy=jnp.asarray(self.cfg.delta_xy, dtype=dt),
            delta_theta=jnp.asarray(self.cfg.delta_theta, dtype=dt),
        )

        if plan.naffected <= self.cfg.small_path_max and not plan.fringe_overflow:
            self.last_path = "fast"
            self.ds, chi2, spd = inc_step_fast(
                self.ds,
                fringe_pos=jnp.asarray(plan.fringe_pos),
                fringe_node=jnp.asarray(plan.fringe_node),
                fringe_fc=jnp.asarray(plan.fringe_fc),
                n_fringe=jnp.int32(plan.n_fringe),
                MAXAFF=plan.MAXAFF, MAXFR=plan.MAXFR,
                **common,
            )
        else:
            self.last_path = "full"
            self.ds, chi2, spd = inc_step_full(
                self.ds,
                MAXAFF=plan.MAXAFF, PANEL=self.cfg.panel_nodes,
                **common,
            )

        start_over = int(self.ds.start_over)
        chi2_f = float(chi2)
        step_ms = (time.perf_counter() - t0) * 1e3

        # wall-clock gate (aprilsam.c:557-559)
        if (self.cfg.wallclock_gate
                and step_ms > self.batch_time_ms * self.cfg.batch_time_fraction):
            start_over = INT_MAX
        # SPD check (reference computes is_spd but ignores it; we act on it)
        if self.cfg.check_spd and not bool(spd):
            start_over = INT_MAX

        # batch fallback (aprilsam.c:566-575)
        if start_over > self.cfg.nthreshold:
            info = self._run_batch(g, record_time=True)
            return info

        return BatchInfo(chi2=chi2_f, spd=bool(spd), n=g.nnodes)

    # ---------------------------------------------------------------

    def chi2(self) -> float:
        return float(state_chi2(self.ds))

    def sync_states(self, g: FactorGraph) -> None:
        g.state[: g.nnodes] = np.asarray(self.ds.state[: g.nnodes],
                                         dtype=np.float64)
        g.l_point[: g.nnodes] = np.asarray(self.ds.l_point[: g.nnodes],
                                           dtype=np.float64)
        g.delta_X[: g.nnodes] = np.asarray(self.ds.delta_X[: g.nnodes],
                                           dtype=np.float64)
