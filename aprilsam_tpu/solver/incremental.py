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
dense frontal operation on a padded tile: a thin QR of the stacked system

      qr([R_F ; W^{1/2} J_new])  ->  R_F',   y_F' = Q^T [y_F ; W^{1/2} r]

which is algebraically R_F'^T R_F' = R_F^T R_F + J^T W J (reconstruct +
scatter-add + refactor) but backward stable in float32 — forming the Gram
matrix explicitly squares the condition number.

The solve phase is either
  * fast path (naffected <= 5): x_F = R_F'^{-1} y_F', update only affected
    nodes + relinearization bookkeeping on their fringe — exactly the
    reference's pruned descent (solve_node always prunes at the first
    unchanged node because delta_X is overwritten before the delta-delta
    comparison, aprilsam.c:752-771); or
  * full path: a panel-blocked back-substitution over the whole block-sparse
    R (lax.scan over panels: sparse gather-matvec + dense triangular solve),
    updating every node (aprilsam.c:721-779; naffected > 5 disables pruning).

Everything a step needs — new node ingestion, odometry seeding
(aprilsam_demo.c:180-191), factor-table appends, the frontal update, the
solve, chi2 — runs in ONE fused jit per (frontal-bucket, path) pair, with
per-step host work reduced to symbolic planning plus four packed array
uploads.  Per-step chi2 lands in a device-side ring (DeviceState.chi2_log) so
replay never blocks on the device; policy counters are read back with a
configurable lag (policy_lag) so round-trip latency overlaps compute.

Batch fallback policy is the reference's: start_over counts nodes whose GN
delta ever exceeded (delta_xy, delta_theta) since the last batch
(aprilsam.c:741-751); a wall-clock gate forces INT_MAX when a (synchronous)
step exceeds batch_time/3 (aprilsam.c:557-559); start_over > nthreshold
triggers a full batch epoch that records batch_time (aprilsam.c:566-575).
"""

from __future__ import annotations

import math
import time
from collections import deque
from dataclasses import dataclass
from functools import partial
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry import mod2pi, xyt_inv, xyt_mul
from ..graph import FactorGraph, FACTOR_XYT, FACTOR_XYTPOS
from ..factors import eval_xyt, eval_xytpos
from .batch import BatchInfo, PanelFallbackError, run_batch_epoch
from .config import SolverConfig
from .ingest import ingest_graph
from .state import DeviceState, init_device_state, state_chi2
from . import symbolic as sym_mod
from .symbolic import SymbolicState

INT_MAX = np.iinfo(np.int32).max

KNODE = 4   # max new nodes per step
KSEED = 4   # max odometry seedings per step

# Mixed-bundle branch layout (see "mixed bundles" section below): affected-set
# buckets sharing one executable, and THE single static fringe width — every
# fast plan is packed at MIXED_FR so fast and full slots share one layout.
# The 1024 branch exists so even the largest pre-overflow affected sets ride
# the mixed stream (a separate per-signature dispatch used to flush the
# queue around every such step).
MIXED_BUCKETS = (16, 64, 256, 1024)
MIXED_FR = 32

# Static word-length buckets of the RAGGED mixed-bundle flat buffer: each
# slot occupies only its own branch's packed length (a fast slot is ~1.4k
# words vs the 13.6k the old uniform layout reserved for every slot), so a
# typical 32-slot bundle packs into ~62k words — the first bucket.  Two
# buckets keep the executable count low; a bundle that would overflow the
# largest is dispatched in chunks.
MIXED_FLAT_BUCKETS = (131072, 262144)


@dataclass
class SeedSpec:
    """Odometry seeding of a new node's state: dst = src (+) z, or
    dst = src (+) inv(z) when invert (aprilsam_demo.c:180-191)."""

    src: int
    dst: int
    z: np.ndarray
    invert: bool


# ======================================================================
# host step planning
# ======================================================================

@dataclass
class StepPlan:
    m: int
    naffected: int
    MAXAFF: int
    MAXFR: int
    fringe_overflow: bool
    ints: np.ndarray      # packed int32 vector
    floats: np.ndarray    # packed float64 vector (bit-packed on upload)
    ridx: np.ndarray      # [MAXAFF, BCAP] new R pattern rows (pad = NCAP).
                          # The frontal gather/scatter/fringe maps are derived
                          # ON DEVICE from this + the resident R_idx, so the
                          # upload stays small (relay h2d is both
                          # latency-bound and ~50 MB/s when saturated)
    max_rnnz: int = 0     # max nonzeros over the new pattern rows (mixed-
                          # bundle eligibility: rows must fit RCAP columns)
    inv: Optional[np.ndarray] = None   # [MAXAFF, MAXAFF] int8: slot of front
                          # column c in row r's RESIDENT pattern (sentinel
                          # BCAP).  Superstep plans upload this so the front
                          # gather is a take_along_axis instead of a one-hot
                          # einsum whose [M, BCAP, M] operand costs ~400 MB
                          # of HBM traffic at the 1024 bucket.
    scat: Optional[np.ndarray] = None  # [MAXAFF, BCAP] int16: front slot of
                          # each NEW-pattern column (sentinel MAXAFF)
    F_pos: Optional[np.ndarray] = None      # affected POSITIONS (windowed
                          # sweep planning; superstep plans only)
    fringe_pos: Optional[np.ndarray] = None  # fringe POSITIONS (ditto)


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


def ints_layout(M: int, FR: int, K: int, knode: int = KNODE,
                kseed: int = KSEED):
    """Static offsets of the packed int vector."""
    names = [
        ("F_pos", M), ("F_node", M), ("new_Rnnz", M),
        ("nf_a_slot", K), ("nf_b_slot", K), ("nf_a", K), ("nf_b", K),
        ("np_slot", K), ("np_node", K),
        ("fringe_pos", FR), ("fringe_node", FR),
        ("node_ids", knode), ("seed_src", kseed), ("seed_dst", kseed),
        ("seed_inv", kseed),
        ("scalars", 8),  # m, n_new_xyt, n_new_pos, n_fringe, n_nodes, n_seeds
    ]
    off = {}
    o = 0
    for name, sz in names:
        off[name] = (o, o + sz)
        o += sz
    return off, o


def floats_layout(K: int, knode: int = KNODE, kseed: int = KSEED):
    names = [
        ("nf_z", K * 3), ("nf_W", K * 9), ("np_z", K * 3), ("np_W", K * 9),
        ("node_states", knode * 3), ("seed_z", kseed * 3),
    ]
    off = {}
    o = 0
    for name, sz in names:
        off[name] = (o, o + sz)
        o += sz
    return off, o


def half_ridx(NCAP: int, RCAP: int) -> bool:
    """Whether ridx rides as packed int16 pairs: pattern positions (and the
    NCAP sentinel) must fit int16 and RCAP must pair up evenly.  Derived
    identically on host (pack) and device (unpack) from static shapes."""
    return NCAP <= 32766 and RCAP % 2 == 0


def packed_layout(MAXAFF: int, MAXFR: int, K: int, BCAP: int, dtype,
                  RCAP: Optional[int] = None, half: bool = False,
                  knode: int = KNODE, kseed: int = KSEED,
                  with_tables: bool = False):
    """Static segment offsets of the single packed int32 plan vector.

    Every per-step input (control ints, measurement floats as raw bits, the
    new R pattern rows) rides in ONE h2d transfer: through the TPU relay
    each transfer costs ~2-3 ms of latency regardless of size (and ~50 MB/s
    when saturated), so one small merged buffer per dispatch is the
    difference between ~12 ms and ~2 ms of upload time per bundle.

    RCAP < BCAP packs only the first RCAP pattern columns per affected row
    (the kernel pads back to BCAP with sentinels); plans whose rows carry
    more nonzeros are ineligible and dispatch through the full-width
    layout.  `half` packs ridx as int16 pairs (two positions per int32
    word): ridx is ~94% of the slot, so this halves the bundle h2d payload
    whenever node_capacity fits int16."""
    if RCAP is None:
        RCAP = BCAP
    _, LI = ints_layout(MAXAFF, MAXFR, K, knode, kseed)
    _, LF = floats_layout(K, knode, kseed)
    words = 2 if np.dtype(dtype) == np.float64 else 1
    LFW = LF * words
    LM = MAXAFF * (RCAP // 2 if half else RCAP)
    seg = {
        "ints": (0, LI),
        "floats": (LI, LI + LFW),
        "ridx": (LI + LFW, LI + LFW + LM),
    }
    o = LI + LFW + LM
    if with_tables:
        # int8 inv [M, M] and int16 scat [M, BCAP], packed into int32 words
        # (M is a bucket multiple of 4; BCAP is even)
        LV = MAXAFF * MAXAFF // 4
        LS = MAXAFF * BCAP // 2
        seg["inv"] = (o, o + LV)
        seg["scat"] = (o + LV, o + LV + LS)
        o += LV + LS
    return seg, o


def pack_plan(plan: "StepPlan", dtype, RCAP: Optional[int] = None,
              half: bool = False) -> np.ndarray:
    """Serialize a StepPlan into the packed int32 vector (float payload as
    raw bits via .view, exact for both float32 and float64 modes)."""
    fbits = np.ascontiguousarray(
        plan.floats.astype(np.dtype(dtype))).view(np.int32)
    ridx = plan.ridx if RCAP is None else plan.ridx[:, :RCAP]
    ridx = np.ascontiguousarray(ridx)
    if half:
        # little-endian pair packing; mirrors the device-side bitcast
        # (int32 -> [2]int16 indexes the low half first), same convention
        # the float64 payload packing already relies on
        ridx = ridx.astype(np.int16).reshape(-1).view(np.int32)
    parts = [plan.ints, fbits, ridx.ravel()]
    if plan.inv is not None:
        parts.append(np.ascontiguousarray(
            plan.inv, dtype=np.int8).reshape(-1).view(np.int32))
        parts.append(np.ascontiguousarray(
            plan.scat, dtype=np.int16).reshape(-1).view(np.int32))
    return np.concatenate(parts)


def _unpack_plan(packed, MAXAFF, MAXFR, K, BCAP, dtype,
                 RCAP: Optional[int] = None, half: bool = False,
                 knode: int = KNODE, kseed: int = KSEED,
                 with_tables: bool = False):
    if RCAP is None:
        RCAP = BCAP
    _, LF = floats_layout(K, knode, kseed)
    seg, L = packed_layout(MAXAFF, MAXFR, K, BCAP, dtype, RCAP, half,
                           knode, kseed, with_tables)
    ints = packed[seg["ints"][0]:seg["ints"][1]]
    fw = packed[seg["floats"][0]:seg["floats"][1]]
    if np.dtype(dtype) == np.float64:
        floats = jax.lax.bitcast_convert_type(
            fw.reshape(LF, 2), jnp.float64)
    else:
        floats = jax.lax.bitcast_convert_type(fw, jnp.float32)
    rw = packed[seg["ridx"][0]:seg["ridx"][1]]
    if half:
        ridx = jax.lax.bitcast_convert_type(rw, jnp.int16).astype(
            jnp.int32).reshape(MAXAFF, RCAP)
    else:
        ridx = rw.reshape(MAXAFF, RCAP)
    inv = scat = None
    if with_tables:
        vw = packed[seg["inv"][0]:seg["inv"][1]]
        inv = jax.lax.bitcast_convert_type(vw, jnp.int8).astype(
            jnp.int32).reshape(MAXAFF, MAXAFF)
        sw = packed[seg["scat"][0]:seg["scat"][1]]
        scat = jax.lax.bitcast_convert_type(sw, jnp.int16).astype(
            jnp.int32).reshape(MAXAFF, BCAP)
    return ints, floats, ridx, inv, scat


def _ensure_native_sym(sym: SymbolicState, NCAP: int, BCAP: int) -> bool:
    """Attach the padded planner mirror (pad_idx/pad_nnz + visit stamps) to a
    fresh post-batch SymbolicState; returns False when the native runtime is
    unavailable (python planner path)."""
    from .. import native

    if not native.available():
        return False
    if getattr(sym, "pad_idx", None) is None:
        idx, nnz = sym_mod.padded_pattern_arrays(sym, NCAP, BCAP, NCAP)
        sym.pad_idx = idx
        sym.pad_nnz = nnz
        sym.patterns_stale = False
    if getattr(sym, "mark", None) is None or sym.mark.shape[0] != NCAP:
        # planner scratch + child lists over the parent array (windowed
        # fringe scan): the C planner maintains them O(1) per reparenting;
        # rebuild per epoch.  Separate from the pad build because the
        # device-backend epoch hands pads over directly.
        sym.mark = np.zeros(NCAP, dtype=np.int32)
        sym.token = np.zeros(1, dtype=np.int32)
        kid_head = np.full(NCAP, -1, dtype=np.int32)
        kid_next = np.full(NCAP, -1, dtype=np.int32)
        kid_prev = np.full(NCAP, -1, dtype=np.int32)
        for c in range(sym.nnodes):
            p = int(sym.parents[c])
            if p < 0:
                continue
            h = kid_head[p]
            kid_next[c] = h
            if h >= 0:
                kid_prev[h] = c
            kid_head[p] = c
        sym.kid_head = kid_head
        sym.kid_next = kid_next
        sym.kid_prev = kid_prev
    return True


def sym_patterns_list(sym: SymbolicState) -> List[np.ndarray]:
    """Materialize per-row patterns, reading the native pad arrays when the
    python list has gone stale (native planner mutates only the pads)."""
    if getattr(sym, "patterns_stale", False):
        return [sym.pad_idx[p, : sym.pad_nnz[p]].copy()
                for p in range(sym.nnodes)]
    return sym.patterns


def plan_step(
    sym: SymbolicState,
    cfg: SolverConfig,
    g: FactorGraph,
    f0: int,
    f1: int,
    n_old: int,
    seeds: Sequence[SeedSpec],
    knode: int = KNODE,
    kseed: int = KSEED,
    kfac: Optional[int] = None,
    buckets: Optional[tuple] = None,
    with_tables: bool = False,
    n_end: Optional[int] = None,
) -> Optional[StepPlan]:
    """Host symbolic work for one incremental step.  Returns None when the
    affected set exceeds the largest frontal bucket (caller falls back to a
    batch epoch).

    The knode/kseed/kfac/buckets capacities default to the per-step layout;
    superstep planning (plan the union of a whole bundle of steps in ONE
    call) passes bundle-sized capacities — the packed layout scales with
    them, and the kernel derives segment widths from the same parameters."""
    NCAP = cfg.node_capacity
    BCAP = cfg.row_block_capacity
    K = kfac if kfac is not None else cfg.new_factor_capacity
    if buckets is None:
        buckets = cfg.frontal_buckets

    # 1. extend ordering with new nodes (aprilsam.c:392-397).  n_end
    # bounds the span (superstep capacity-flushes dispatch a buffer whose
    # last entry predates the graph's current tail).
    if n_end is None:
        n_end = g.nnodes
    new_ids = list(range(n_old, n_end))
    # dedup seeds last-wins per destination (the reference applies them in
    # factor order, aprilsam_demo.c:180-191; the kernel applies them as one
    # vectorized scatter, so duplicates must be resolved here).  Seed sources
    # are always pre-existing nodes (the reference seeds the new endpoint
    # from the old one), which the vectorized gather relies on.
    by_dst = {}
    for s in seeds:
        by_dst[s.dst] = s
    seeds = list(by_dst.values())
    # the kernel seeds in ONE vectorized hop (gather src state after node
    # ingestion, scatter dst): a src that is itself seeded in the same plan
    # would read its pre-seed state.  Per-step plans guarantee this because
    # srcs pre-exist; superstep plans pre-compose within-bundle chains.
    dsts = {s.dst for s in seeds}
    assert all(s.src not in dsts for s in seeds), \
        "seed chains must be pre-composed (src also seeded in this plan)"
    if len(new_ids) > knode or len(seeds) > kseed:
        raise OverflowError("too many new nodes/seeds in one step")
    sym_mod.append_nodes(sym, new_ids)

    if _ensure_native_sym(sym, NCAP, BCAP):
        # ---- native planner: one C call does the affected walk, pattern
        # merge, parent re-derivation and fringe scan on the padded arrays
        from .. import native

        nn = sym.nnodes
        for i in new_ids:
            p = int(sym.pos[i])
            sym.pad_idx[p, 0] = p
            sym.pad_nnz[p] = 1
        fn = g.fnodes[f0:f1]
        ea_pos = sym.pos[fn[:, 0]].astype(np.int32)
        has_b = fn[:, 1] >= 0
        eb_pos = np.where(
            has_b, sym.pos[np.clip(fn[:, 1], 0, None)], -1).astype(np.int32)
        new_pos = sym.pos[new_ids].astype(np.int32) if new_ids else \
            np.zeros(0, dtype=np.int32)
        touched_pos = np.ascontiguousarray(np.concatenate(
            [ea_pos, eb_pos[has_b], new_pos]))
        MAXCAP = buckets[-1]
        FRCAP = 128
        F = np.empty(MAXCAP, dtype=np.int32)
        fringe = np.empty(FRCAP, dtype=np.int32)
        mbuf = np.zeros(1, dtype=np.int32)
        nfrbuf = np.zeros(1, dtype=np.int32)
        old_idx = np.empty((MAXCAP, BCAP), dtype=np.int32)
        old_nnz = np.empty(MAXCAP, dtype=np.int32)
        rc = native.plan_step_native(
            nn, NCAP, BCAP, sym.parents, sym.pad_idx, sym.pad_nnz,
            sym.mark, sym.token,
            sym.kid_head, sym.kid_next, sym.kid_prev, touched_pos,
            np.ascontiguousarray(ea_pos), np.ascontiguousarray(eb_pos),
            MAXCAP, FRCAP, F, fringe, mbuf, nfrbuf, old_idx, old_nnz)
        if rc == 1:
            return None                       # affected set > largest bucket
        if rc == 2:
            raise OverflowError("row_block_capacity exceeded")
        if rc == 3:
            raise RuntimeError("planner invariant violation")
        sym.patterns_stale = True
        m = int(mbuf[0])
        naffected = m - len(new_ids)
        F = F[:m]
        MAXAFF = _bucket(m, buckets)
        nfr = int(nfrbuf[0])
        # Single 32-wide fringe bucket: a fast step whose fringe exceeds it
        # takes the full path instead (exact, un-pruned solve — strictly more
        # accurate than the reference's pruned descent, and it keeps MAXFR a
        # single static value so every fast plan fits the mixed-bundle
        # layout; a second MAXFR axis would add lazily-compiled executables,
        # each a 10-25 s mid-run relay compile).  Never observed on M3500.
        MAXFR = _bucket(nfr, (MIXED_FR,))
        fringe_overflow = MAXFR is None
        if fringe_overflow:
            fringe = fringe[:0]
            MAXFR = MIXED_FR
        else:
            fringe = fringe[:nfr]
        new_rows = sym.pad_idx[F]
        new_nnz = sym.pad_nnz[F]
        old_idx = old_idx[:m]
        old_nnz = old_nnz[:m]
    else:
        # 2. mark affected (walk to root with OLD parents; new nodes isolated)
        touched = []
        for f in range(f0, f1):
            a, b = g.fnodes[f]
            touched.append(int(a))
            if b >= 0:
                touched.append(int(b))
        F = sym_mod.mark_affected(sym, touched)
        naffected = len(F)
        new_pos = np.asarray([int(sym.pos[i]) for i in new_ids],
                             dtype=np.int32)
        F = np.unique(np.concatenate([F, new_pos])) if len(new_pos) else F
        m = len(F)

        MAXAFF = _bucket(m, buckets)
        if MAXAFF is None:
            return None

        # 3. symbolic update (pattern growth + new parents — the structural
        #    equivalent of search_tree_append, aprilsam.c:958-987).  The
        #    frontal slot maps themselves are derived ON DEVICE from F_pos +
        #    R_idx (which mirrors sym.patterns) + the uploaded new rows —
        #    nothing to build here.
        # snapshot pre-merge (device-resident mirror) patterns for the
        # gather-table build; update_patterns_incremental replaces the row
        # arrays rather than mutating them, so references suffice
        old_pats = [sym.patterns[int(p)] for p in F]
        old_idx = np.full((m, BCAP), NCAP, dtype=np.int32)
        old_nnz = np.zeros(m, dtype=np.int32)
        for i, pat in enumerate(old_pats):
            old_idx[i, : len(pat)] = pat
            old_nnz[i] = len(pat)
        edges = [(int(g.fnodes[f][0]), int(g.fnodes[f][1]))
                 for f in range(f0, f1)]
        sym_mod.update_patterns_incremental(sym, F, edges)

        new_rows, new_nnz = _padded_rows(sym.patterns, F, BCAP, NCAP)

        # 4. fringe (children of F outside F, NEW tree); single 32-wide
        # bucket — overflow takes the full path (see the native branch above)
        fringe = sym_mod.fringe_of(sym, F)
        MAXFR = _bucket(len(fringe), (MIXED_FR,))
        fringe_overflow = MAXFR is None
        if fringe_overflow:
            fringe = fringe[:0]
            MAXFR = MIXED_FR

    # Full-path steps never read the fringe (the panel sweep updates every
    # node), so pack them at the canonical MIXED_FR layout with an empty
    # fringe — this is what lets fast and full slots share one mixed-bundle
    # executable regardless of the actual fringe size.
    if naffected > cfg.small_path_max or fringe_overflow:
        fringe = fringe[:0]
        MAXFR = MIXED_FR

    # 5. pack
    off_i, len_i = ints_layout(MAXAFF, MAXFR, K, knode, kseed)
    off_f, len_f = floats_layout(K, knode, kseed)
    ints = np.zeros(len_i, dtype=np.int32)
    flts = np.zeros(len_f, dtype=np.float64)

    def seti(name, arr, fill=0):
        lo, hi = off_i[name]
        seg = np.full(hi - lo, fill, dtype=np.int32)
        seg[: len(arr)] = arr
        ints[lo:hi] = seg

    def setf(name, arr):
        lo, hi = off_f[name]
        a = np.asarray(arr, dtype=np.float64).reshape(-1)
        flts[lo : lo + a.shape[0]] = a

    seti("F_pos", F, NCAP)
    seti("F_node", sym.order[F])
    seti("new_Rnnz", new_nnz)

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
    if len(nf_a) > K or len(np_n) > K:
        raise OverflowError("new_factor_capacity exceeded; raise it in config")

    slot_map = {int(p): i for i, p in enumerate(F)}

    def slots_of(nodes):
        return np.asarray([slot_map[int(sym.pos[i])] for i in nodes],
                          dtype=np.int32)

    seti("nf_a_slot", slots_of(nf_a))
    seti("nf_b_slot", slots_of(nf_b))
    seti("nf_a", nf_a)
    seti("nf_b", nf_b)
    seti("np_slot", slots_of(np_n))
    seti("np_node", np_n)
    seti("fringe_pos", fringe, NCAP)
    seti("fringe_node", sym.order[fringe] if len(fringe) else [])
    seti("node_ids", new_ids, NCAP)
    seti("seed_src", [s.src for s in seeds])
    seti("seed_dst", [s.dst for s in seeds], NCAP)
    seti("seed_inv", [1 if s.invert else 0 for s in seeds])
    seti("scalars", [m, len(nf_a), len(np_n), len(fringe), len(new_ids),
                     len(seeds), 0, 0])

    if nf_z:
        setf("nf_z", nf_z)
        setf("nf_W", nf_W)
    if np_z:
        setf("np_z", np_z)
        setf("np_W", np_W)
    if new_ids:
        setf("node_states", g.state[new_ids])
    if seeds:
        setf("seed_z", [s.z for s in seeds])

    def pad2(a, n, fill):
        out = np.full((n,) + a.shape[1:], fill, dtype=a.dtype)
        out[: len(a)] = a
        return out

    inv_t = scat_t = None
    if with_tables:
        # front-local gather/scatter tables (see StepPlan docstring): every
        # resident and new pattern column of an affected row is an etree
        # ancestor of that row, hence inside the ancestor-closed F
        pos2f_h = np.full(NCAP + 1, -1, dtype=np.int32)
        pos2f_h[F] = np.arange(m, dtype=np.int32)
        inv_t = np.full((MAXAFF, MAXAFF), BCAP, dtype=np.int8)
        scat_t = np.full((MAXAFF, BCAP), MAXAFF, dtype=np.int16)
        if m:
            bmask = np.arange(BCAP)[None, :] < old_nnz[:, None]
            ii, bb = np.nonzero(bmask)
            ss = pos2f_h[old_idx[ii, bb]]
            if len(ss) and ss.min() < 0:
                raise RuntimeError("resident pattern column outside front")
            inv_t[ii, ss] = bb
            bmask2 = np.arange(BCAP)[None, :] < new_nnz[:, None]
            ii2, bb2 = np.nonzero(bmask2)
            ss2 = pos2f_h[new_rows[ii2, bb2]]
            if len(ss2) and ss2.min() < 0:
                raise RuntimeError("new pattern column outside front")
            scat_t[ii2, bb2] = ss2

    return StepPlan(
        m=m, naffected=naffected, MAXAFF=MAXAFF, MAXFR=MAXFR,
        fringe_overflow=fringe_overflow,
        ints=ints, floats=flts,
        ridx=pad2(new_rows, MAXAFF, NCAP),
        max_rnnz=int(new_nnz.max()) if len(new_nnz) else 0,
        inv=inv_t, scat=scat_t,
        F_pos=np.asarray(F, dtype=np.int32),
        fringe_pos=np.asarray(fringe, dtype=np.int32),
    )


# ======================================================================
# device step
# ======================================================================

def _unpack(vec, off, name, shape=None):
    lo, hi = off[name]
    seg = vec[lo:hi]
    return seg if shape is None else seg.reshape(shape)


def _frontal_core(ds, ints, floats, new_Ridx, off_i, off_f, MAXAFF, KNEW,
                  inv=None, scat=None):
    NCAP = ds.state.shape[0]
    BCAP = ds.R_idx.shape[1]
    FCAP = ds.xyt_a.shape[0]
    FPOS = ds.pos_node.shape[0]
    dtype = ds.R_blocks.dtype
    M = MAXAFF
    K3 = 3 * M

    sc = _unpack(ints, off_i, "scalars")
    m, n_new_xyt, n_new_pos, n_fringe, n_nodes, n_seeds = (
        sc[0], sc[1], sc[2], sc[3], sc[4], sc[5])

    # ---------------- new node ingestion + odometry seeding
    # node/seed capacities are derived from the layout (KNODE/KSEED for
    # per-step plans; superstep plans carry bundle-sized segments)
    knode = off_i["node_ids"][1] - off_i["node_ids"][0]
    kseed = off_i["seed_src"][1] - off_i["seed_src"][0]
    node_ids = _unpack(ints, off_i, "node_ids")
    node_states = _unpack(floats, off_f, "node_states", (knode, 3)).astype(dtype)
    nv = jnp.arange(knode, dtype=jnp.int32) < n_nodes
    dst_nodes = jnp.where(nv, node_ids, NCAP)
    state = ds.state.at[dst_nodes].set(node_states, mode="drop")
    l_point = ds.l_point.at[dst_nodes].set(node_states, mode="drop")
    delta_X = ds.delta_X.at[dst_nodes].set(0.0, mode="drop")

    # Odometry seeding, vectorized: plan_step dedups seeds (last-wins per
    # dst, aprilsam_demo.c:180-191 applies them in factor order) and srcs
    # always resolve to pre-existing nodes (superstep planning composes
    # within-bundle seed chains host-side), so one gather + one scatter
    # suffices.
    seed_src = _unpack(ints, off_i, "seed_src")
    seed_dst = _unpack(ints, off_i, "seed_dst")
    seed_inv = _unpack(ints, off_i, "seed_inv")
    seed_z = _unpack(floats, off_f, "seed_z", (kseed, 3)).astype(dtype)
    sv = jnp.arange(kseed, dtype=jnp.int32) < n_seeds
    src_states = state[jnp.clip(seed_src, 0, NCAP - 1)]        # [KSEED, 3]
    z_eff = jnp.where((seed_inv > 0)[:, None],
                      jax.vmap(xyt_inv)(seed_z), seed_z)
    seeded = jax.vmap(xyt_mul)(src_states, z_eff)
    sdst = jnp.where(sv, seed_dst, NCAP)
    state = state.at[sdst].set(seeded, mode="drop")
    l_point = l_point.at[sdst].set(seeded, mode="drop")

    # ---------------- new factor table appends
    nf_a = _unpack(ints, off_i, "nf_a")
    nf_b = _unpack(ints, off_i, "nf_b")
    nf_z = _unpack(floats, off_f, "nf_z", (KNEW, 3)).astype(dtype)
    nf_W = _unpack(floats, off_f, "nf_W", (KNEW, 3, 3)).astype(dtype)
    np_node = _unpack(ints, off_i, "np_node")
    np_z = _unpack(floats, off_f, "np_z", (KNEW, 3)).astype(dtype)
    np_W = _unpack(floats, off_f, "np_W", (KNEW, 3, 3)).astype(dtype)

    nf_valid = jnp.arange(KNEW, dtype=jnp.int32) < n_new_xyt
    widx = jnp.where(nf_valid, ds.n_xyt + jnp.arange(KNEW, dtype=jnp.int32), FCAP)
    xyt_a = ds.xyt_a.at[widx].set(nf_a, mode="drop")
    xyt_b = ds.xyt_b.at[widx].set(nf_b, mode="drop")
    xyt_z = ds.xyt_z.at[widx].set(nf_z, mode="drop")
    xyt_W = ds.xyt_W.at[widx].set(nf_W, mode="drop")

    npv = jnp.arange(KNEW, dtype=jnp.int32) < n_new_pos
    pidx = jnp.where(npv, ds.n_pos + jnp.arange(KNEW, dtype=jnp.int32), FPOS)
    pos_node = ds.pos_node.at[pidx].set(np_node, mode="drop")
    pos_z = ds.pos_z.at[pidx].set(np_z, mode="drop")
    pos_W = ds.pos_W.at[pidx].set(np_W, mode="drop")

    ds = ds._replace(
        state=state, l_point=l_point, delta_X=delta_X,
        xyt_a=xyt_a, xyt_b=xyt_b, xyt_z=xyt_z, xyt_W=xyt_W,
        n_xyt=ds.n_xyt + n_new_xyt,
        pos_node=pos_node, pos_z=pos_z, pos_W=pos_W,
        n_pos=ds.n_pos + n_new_pos,
        nnodes=ds.nnodes + n_nodes,
    )

    # ---------------- frontal gather
    # Grid scatters/gathers are replaced by one-hot einsums: TPU lowers a
    # [M, BCAP]-indexed scatter to a serialized scatter kernel (~ms), while
    # the equivalent one-hot contraction is a single MXU matmul (~us).
    # The frontal-slot maps (position -> slot in F) are DERIVED here from
    # F_pos + the resident R_idx + the uploaded new pattern rows, instead of
    # being uploaded: R_idx mirrors the host symbolic patterns exactly, and
    # deriving keeps the per-step h2d payload ~4x smaller.
    F_pos = _unpack(ints, off_i, "F_pos")
    new_Rnnz = _unpack(ints, off_i, "new_Rnnz")

    row_valid = jnp.arange(M, dtype=jnp.int32) < m
    scalar_valid = jnp.repeat(row_valid, 3)

    # pos2f[p] = slot of position p in F, else -1 — built as a one-hot MXU
    # contraction (a direct M-element scatter serializes on TPU)
    oh_pos = jax.nn.one_hot(jnp.clip(F_pos, 0, NCAP), NCAP + 1, dtype=dtype)
    oh_pos = oh_pos * row_valid[:, None]
    slot1 = (jnp.arange(M, dtype=dtype) + 1.0)
    pos2f = jnp.einsum("mn,m->n", oh_pos, slot1).astype(jnp.int32) - 1

    rows = ds.R_blocks[jnp.clip(F_pos, 0, NCAP - 1)]
    if inv is not None:
        # host-built gather table: RF[r, c] = rows[r, inv[r, c]] with a
        # zero block at the BCAP sentinel — a windowed gather instead of a
        # one-hot [M, BCAP, M] einsum operand (~400 MB HBM traffic at the
        # 1024 bucket)
        rows_p = jnp.concatenate(
            [rows, jnp.zeros((M, 1, 3, 3), dtype=dtype)], axis=1)
        RF = jnp.take_along_axis(
            rows_p, jnp.clip(inv, 0, BCAP)[:, :, None, None], axis=1)
        RF = RF * row_valid[:, None, None, None]
    else:
        old_rows_idx = ds.R_idx[jnp.clip(F_pos, 0, NCAP - 1)]   # [M, BCAP]
        gather_fc = pos2f[jnp.clip(old_rows_idx, 0, NCAP)]
        oh_g = jax.nn.one_hot(jnp.clip(gather_fc, 0, M), M, dtype=dtype)
        oh_g = oh_g * ((gather_fc >= 0) & row_valid[:, None])[..., None]
        RF = jnp.einsum("rbij,rbc->rcij", rows, oh_g)       # [M, M, 3, 3]
    R_dense = RF.transpose(0, 2, 1, 3).reshape(K3, K3)
    R_dense = R_dense + jnp.where(scalar_valid, 0.0, 1.0) * jnp.eye(
        K3, dtype=dtype)

    y_F = jnp.where(
        row_valid[:, None], ds.y[jnp.clip(F_pos, 0, NCAP - 1)], 0.0
    ).reshape(K3)

    # ---------------- stacked square-root measurement rows
    # (aprilsam.c:508-542 as a QR factor update; see module docstring)
    ev = eval_xyt(ds.l_point, jnp.clip(nf_a, 0, NCAP - 1),
                  jnp.clip(nf_b, 0, NCAP - 1), nf_z, nf_W)
    evp = eval_xytpos(ds.state, jnp.clip(np_node, 0, NCAP - 1), np_z, np_W)

    # W^T/2 factors via closed-form 3x3 Cholesky (reads the upper triangle
    # only == the reference's upper-mirror W semantics); tiny jitter keeps
    # PSD-singular priors finite
    from ..kernels.linalg3 import chol3

    Wh_xyt = chol3(nf_W, jitter=1e-12) * nf_valid[:, None, None]
    Wh_pos = chol3(np_W, jitter=1e-12) * npv[:, None, None]

    def _psd_ok(Wh, W, valid):
        # the QR update is a Cholesky UPdate; an indefinite W cannot be
        # represented (the reference NaNs on it, smatd.c:669-699, and
        # ignores its own is_spd flag — we escalate to a batch instead).
        Wsym = jnp.triu(W) + jnp.triu(W, 1).transpose(0, 2, 1)
        err = jnp.abs(jnp.einsum("fki,fkj->fij", Wh, Wh) - Wsym)
        scale = 1e-3 * (1.0 + jnp.abs(Wsym).max(axis=(1, 2)))
        return jnp.all(jnp.where(valid, err.max(axis=(1, 2)) <= scale, True))

    w_ok = _psd_ok(Wh_xyt, nf_W, nf_valid) & _psd_ok(Wh_pos, np_W, npv)

    nf_a_slot = _unpack(ints, off_i, "nf_a_slot")
    nf_b_slot = _unpack(ints, off_i, "nf_b_slot")
    np_slot = _unpack(ints, off_i, "np_slot")
    sa = jnp.where(nf_valid, nf_a_slot, M)
    sb = jnp.where(nf_valid, nf_b_slot, M)
    sp = jnp.where(npv, np_slot, M)

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

    # ---------------- thin QR refactor (aprilsam.c:850-906)
    Q, Rq = jnp.linalg.qr(C, mode="reduced")
    sgn = jnp.where(jnp.diagonal(Rq) < 0, -1.0, 1.0).astype(dtype)
    R_up = sgn[:, None] * Rq
    diag = jnp.diagonal(R_up)
    spd = w_ok & jnp.all(
        jnp.where(scalar_valid, jnp.isfinite(diag) & (diag > 0), True))

    # gated forward solve on y (aprilsam.c:702-719): y' = Q^T d
    y_new = sgn * (Q.T @ d_stack)
    dest_rows = jnp.where(row_valid, F_pos, NCAP)
    y_out = ds.y.at[dest_rows].set(y_new.reshape(M, 3), mode="drop")

    # ---------------- scatter R' back on the NEW pattern: a windowed gather
    # from the front (newblocks[r, b] = Rt[r, slot of new_Ridx[r, b]]) —
    # gathers vectorize on TPU where the former one-hot einsum materialized
    # an [M, BCAP, M] operand
    Rt = R_up.reshape(M, 3, M, 3).transpose(0, 2, 1, 3)   # [M, M, 3, 3]
    if scat is not None:
        scat_idx = scat                                   # sentinel = M
    else:
        scat_fc = pos2f[jnp.clip(new_Ridx, 0, NCAP)]
        scat_idx = jnp.where(scat_fc >= 0, scat_fc, M)
    Rt_p = jnp.concatenate(
        [Rt, jnp.zeros((M, 1, 3, 3), dtype=dtype)], axis=1)
    newblocks = jnp.take_along_axis(
        Rt_p, jnp.clip(scat_idx, 0, M)[:, :, None, None], axis=1)
    R_blocks = ds.R_blocks.at[dest_rows].set(newblocks, mode="drop")
    R_idx = ds.R_idx.at[dest_rows].set(new_Ridx, mode="drop")
    R_nnz = ds.R_nnz.at[dest_rows].set(new_Rnnz, mode="drop")

    ds = ds._replace(R_blocks=R_blocks, R_idx=R_idx, R_nnz=R_nnz, y=y_out)
    return ds, R_up, y_new, row_valid, scalar_valid, spd, pos2f


def _finish(ds: DeviceState, chi2, start_over, spd, live, log_chi2: bool):
    """Write the per-step metric ring and pack the policy stats vector.
    `live` is False for padding slots of a partially-filled bundle: their
    chi2 is not logged and the ring pointer does not advance.

    Policy counters are CUMULATIVE on device (start_over monotone since the
    last batch, spd AND-accumulated into ds.spd_ok), so the host policy only
    ever needs the newest stats vector — older readbacks can be skipped
    entirely (cfg.policy_poll)."""
    spd_ok = ds.spd_ok & (spd | ~live)
    if log_chi2:
        LOG = ds.chi2_log.shape[0]
        # writes past capacity drop (mode="drop") instead of clobbering the
        # last slot; chi2_history() raises on readback when log_ptr > LOG
        chi2_log = ds.chi2_log.at[
            jnp.where(live, ds.log_ptr, LOG)
        ].set(chi2, mode="drop")
        ds = ds._replace(chi2_log=chi2_log,
                         log_ptr=ds.log_ptr + live.astype(jnp.int32))
    ds = ds._replace(start_over=start_over, spd_ok=spd_ok)
    stats = jnp.stack([
        chi2.astype(jnp.float32),
        start_over.astype(jnp.float32),
        spd_ok.astype(jnp.float32),
    ])
    return ds, stats


def _fast_body(ds: DeviceState, packed,
               MAXAFF: int, MAXFR: int, KNEW: int,
               delta_xy: float, delta_theta: float, log_chi2: bool,
               RCAP: Optional[int] = None, half: bool = False,
               knode: int = KNODE, kseed: int = KSEED,
               with_tables: bool = False):
    NCAP = ds.state.shape[0]
    BCAP = ds.R_idx.shape[1]
    dtype = ds.R_blocks.dtype
    M = MAXAFF
    off_i, _ = ints_layout(MAXAFF, MAXFR, KNEW, knode, kseed)
    off_f, _ = floats_layout(KNEW, knode, kseed)
    ints, floats, ridx, inv, scat = _unpack_plan(
        packed, MAXAFF, MAXFR, KNEW, BCAP, dtype, RCAP, half, knode, kseed,
        with_tables)
    if ridx.shape[1] < BCAP:
        ridx = jnp.pad(ridx, ((0, 0), (0, BCAP - ridx.shape[1])),
                       constant_values=NCAP)

    ds, R_up, y_new, row_valid, scalar_valid, spd, pos2f = _frontal_core(
        ds, ints, floats, ridx, off_i, off_f, MAXAFF, KNEW, inv, scat)

    # back-substitution restricted to F (exact: F is ancestor-closed)
    x_F = jax.scipy.linalg.solve_triangular(R_up, y_new, lower=False)
    dxF = x_F.reshape(M, 3)

    sc = _unpack(ints, off_i, "scalars")
    n_fringe = sc[3]
    F_node = _unpack(ints, off_i, "F_node")
    fringe_pos = _unpack(ints, off_i, "fringe_pos")
    fringe_node = _unpack(ints, off_i, "fringe_node")

    # fringe: children of F — compute x, delta_X and relinearization only
    # (solve_node visits them once and prunes, aprilsam.c:752-771).  Fringe
    # rows are NOT in F, so their resident R_idx rows are current; the
    # fringe slot map is pos2f over them (diagonal slot maps to -1, masked).
    fr_valid = jnp.arange(MAXFR, dtype=jnp.int32) < n_fringe
    fr_rows = ds.R_blocks[jnp.clip(fringe_pos, 0, NCAP - 1)]
    fringe_fc = pos2f[jnp.clip(ds.R_idx[jnp.clip(fringe_pos, 0, NCAP - 1)],
                               0, NCAP)]
    # beyond-diagonal contribution via one-hot contraction (slot 0 is the
    # fringe node's own diagonal, fringe_fc == -1 there, masked out)
    oh_f = jax.nn.one_hot(jnp.clip(fringe_fc, 0, M), M, dtype=dtype)
    oh_f = oh_f * (fringe_fc >= 0)[..., None]             # [FR, BCAP, M]
    xw = jnp.einsum("kbc,cj->kbj", oh_f, dxF)
    off = jnp.einsum("kbij,kbj->ki", fr_rows, xw)
    y_fr = ds.y[jnp.clip(fringe_pos, 0, NCAP - 1)]
    from ..kernels.linalg3 import solve_upper3

    T = fr_rows[:, 0] + jnp.eye(3, dtype=dtype) * jnp.where(
        fr_valid, 0.0, 1.0)[:, None, None]
    x_fr = solve_upper3(T, y_fr - off)

    def relin_mask(dx):
        return (jnp.abs(dx[:, 0]) > delta_xy) | (jnp.abs(dx[:, 1]) > delta_xy) \
            | (jnp.abs(dx[:, 2]) > delta_theta)

    ids_F = jnp.where(row_valid, F_node, NCAP)
    ids_fr = jnp.where(fr_valid, fringe_node, NCAP)

    already = ds.relinearized
    newly_F = relin_mask(dxF) & row_valid & ~already[jnp.clip(ids_F, 0, NCAP - 1)]
    already = already.at[ids_F].set(
        already[jnp.clip(ids_F, 0, NCAP - 1)] | (relin_mask(dxF) & row_valid),
        mode="drop")
    newly_fr = relin_mask(x_fr) & fr_valid & ~already[jnp.clip(ids_fr, 0, NCAP - 1)]
    already = already.at[ids_fr].set(
        already[jnp.clip(ids_fr, 0, NCAP - 1)] | (relin_mask(x_fr) & fr_valid),
        mode="drop")
    # saturate: the wall-clock/SPD escalations park start_over at INT_MAX-ish
    # values that must not wrap when later steps keep counting
    start_over = jnp.minimum(ds.start_over, jnp.int32(1 << 30)) \
        + jnp.sum(newly_F).astype(jnp.int32) \
        + jnp.sum(newly_fr).astype(jnp.int32)

    delta_X = ds.delta_X.at[ids_F].set(dxF, mode="drop")
    delta_X = delta_X.at[ids_fr].set(x_fr, mode="drop")

    ok = row_valid & ~jnp.any(jnp.isnan(dxF), axis=1)
    lp = ds.l_point[jnp.clip(ids_F, 0, NCAP - 1)]
    new_state_F = lp + dxF
    new_state_F = new_state_F.at[:, 2].set(mod2pi(new_state_F[:, 2]))
    state = ds.state.at[jnp.where(ok, ids_F, NCAP)].set(new_state_F, mode="drop")

    ds = ds._replace(state=state, delta_X=delta_X, relinearized=already)
    chi2 = state_chi2(ds) if log_chi2 else jnp.asarray(jnp.nan, dtype)
    live = _unpack(ints, off_i, "scalars")[0] > 0  # m > 0
    return _finish(ds, chi2, start_over, spd, live, log_chi2)


@partial(jax.jit, static_argnames=("KNEW", "knode", "kseed"),
         donate_argnames=("ds",))
def inc_ingest_tail(ds: DeviceState, packed, KNEW: int,
                    knode: int = KNODE, kseed: int = KSEED):
    """Ingestion-only step: new nodes + odometry seeding + factor-table
    appends, no frontal work.  Serves the plan-overflow batch-fallback path
    (aprilsam.c's full-batch branch), which previously ran these appends as
    eager ops — through the relay each eager op's first compile costs
    ~0.4 s, and reading the table counts stalled the pipeline.  Layout: the
    MAXAFF=0/MAXFR=0 prefix of the standard packed plan.  Superstep
    overflow fallbacks pass bundle-sized knode/kseed capacities."""
    NCAP = ds.state.shape[0]
    FCAP = ds.xyt_a.shape[0]
    FPOS = ds.pos_node.shape[0]
    dtype = ds.R_blocks.dtype
    off_i, LI = ints_layout(0, 0, KNEW, knode, kseed)
    _, LF = floats_layout(KNEW, knode, kseed)
    ints = packed[:LI]
    fw = packed[LI:]
    if np.dtype(dtype) == np.float64:
        floats = jax.lax.bitcast_convert_type(
            fw.reshape(LF, 2), jnp.float64)
    else:
        floats = jax.lax.bitcast_convert_type(fw, jnp.float32)

    sc = _unpack(ints, off_i, "scalars")
    n_new_xyt, n_new_pos, n_nodes, n_seeds = sc[1], sc[2], sc[4], sc[5]

    off_f = floats_layout(KNEW, knode, kseed)[0]
    node_ids = _unpack(ints, off_i, "node_ids")
    node_states = _unpack(floats, off_f, "node_states",
                          (knode, 3)).astype(dtype)
    nv = jnp.arange(knode, dtype=jnp.int32) < n_nodes
    dst_nodes = jnp.where(nv, node_ids, NCAP)
    state = ds.state.at[dst_nodes].set(node_states, mode="drop")
    l_point = ds.l_point.at[dst_nodes].set(node_states, mode="drop")
    delta_X = ds.delta_X.at[dst_nodes].set(0.0, mode="drop")

    seed_src = _unpack(ints, off_i, "seed_src")
    seed_dst = _unpack(ints, off_i, "seed_dst")
    seed_inv = _unpack(ints, off_i, "seed_inv")
    seed_z = _unpack(floats, off_f, "seed_z", (kseed, 3)).astype(dtype)
    sv = jnp.arange(kseed, dtype=jnp.int32) < n_seeds
    src_states = state[jnp.clip(seed_src, 0, NCAP - 1)]
    z_eff = jnp.where((seed_inv > 0)[:, None],
                      jax.vmap(xyt_inv)(seed_z), seed_z)
    seeded = jax.vmap(xyt_mul)(src_states, z_eff)
    sdst = jnp.where(sv, seed_dst, NCAP)
    state = state.at[sdst].set(seeded, mode="drop")
    l_point = l_point.at[sdst].set(seeded, mode="drop")

    nf_a = _unpack(ints, off_i, "nf_a")
    nf_b = _unpack(ints, off_i, "nf_b")
    nf_z = _unpack(floats, off_f, "nf_z", (KNEW, 3)).astype(dtype)
    nf_W = _unpack(floats, off_f, "nf_W", (KNEW, 3, 3)).astype(dtype)
    np_node = _unpack(ints, off_i, "np_node")
    np_z = _unpack(floats, off_f, "np_z", (KNEW, 3)).astype(dtype)
    np_W = _unpack(floats, off_f, "np_W", (KNEW, 3, 3)).astype(dtype)

    nf_valid = jnp.arange(KNEW, dtype=jnp.int32) < n_new_xyt
    widx = jnp.where(nf_valid, ds.n_xyt + jnp.arange(KNEW, dtype=jnp.int32),
                     FCAP)
    npv = jnp.arange(KNEW, dtype=jnp.int32) < n_new_pos
    pidx = jnp.where(npv, ds.n_pos + jnp.arange(KNEW, dtype=jnp.int32), FPOS)

    return ds._replace(
        state=state, l_point=l_point, delta_X=delta_X,
        xyt_a=ds.xyt_a.at[widx].set(nf_a, mode="drop"),
        xyt_b=ds.xyt_b.at[widx].set(nf_b, mode="drop"),
        xyt_z=ds.xyt_z.at[widx].set(nf_z, mode="drop"),
        xyt_W=ds.xyt_W.at[widx].set(nf_W, mode="drop"),
        n_xyt=ds.n_xyt + n_new_xyt,
        pos_node=ds.pos_node.at[pidx].set(np_node, mode="drop"),
        pos_z=ds.pos_z.at[pidx].set(np_z, mode="drop"),
        pos_W=ds.pos_W.at[pidx].set(np_W, mode="drop"),
        n_pos=ds.n_pos + n_new_pos,
        nnodes=ds.nnodes + n_nodes,
    )


def _legacy_half(ds: DeviceState) -> bool:
    """int16 pair-packing rule for the legacy (per-signature) layouts:
    full-width ridx (RCAP = BCAP).  Must mirror the host-side pack."""
    return half_ridx(ds.state.shape[0], ds.R_idx.shape[1])


@partial(jax.jit,
         static_argnames=("MAXAFF", "MAXFR", "KNEW", "delta_xy", "delta_theta",
                          "log_chi2"),
         donate_argnames=("ds",))
def inc_step_fast(ds: DeviceState, packed,
                  MAXAFF: int, MAXFR: int, KNEW: int,
                  delta_xy: float, delta_theta: float, log_chi2: bool):
    return _fast_body(ds, packed,
                      MAXAFF, MAXFR, KNEW, delta_xy, delta_theta, log_chi2,
                      None, _legacy_half(ds))


@partial(jax.jit,
         static_argnames=("MAXAFF", "MAXFR", "KNEW", "delta_xy", "delta_theta",
                          "log_chi2"),
         donate_argnames=("ds",))
def inc_bundle_fast(ds: DeviceState, packed_b,
                    MAXAFF: int, MAXFR: int, KNEW: int,
                    delta_xy: float, delta_theta: float, log_chi2: bool):
    """B consecutive fast steps in one dispatch (lax.scan over plan slices);
    padding slots are no-ops."""
    half = _legacy_half(ds)

    def body(ds, packed):
        ds, stats = _fast_body(ds, packed,
                               MAXAFF, MAXFR, KNEW, delta_xy, delta_theta,
                               log_chi2, None, half)
        return ds, stats

    return jax.lax.scan(body, ds, packed_b)


def _global_sweep(ds: DeviceState, PANEL: int, NPANB: int,
                  delta_xy: float, delta_theta: float) -> DeviceState:
    """Whole-graph back-substitution x = R^{-1} y + update of every node
    (solve_node with pruning disabled, aprilsam.c:721-779) over the ACTIVE
    block rows (NPANB = bucketed ceil(nnodes / PANEL), a static
    specialization so early-trajectory steps never sweep padding panels).

    The panel diagonal triangles are extracted for ALL panels in ONE
    one-hot MXU einsum and inverted BATCHED (pallas blocked tri-inverse on
    TPU, solve-vs-identity elsewhere); the remaining sequential scan body
    is a sparse gather + one [3P,3P] matvec per panel.  The dominant cost
    left is the xb gather over NCAP*BCAP pattern slots (~2.7 ms at the
    M3500 shapes) — which is why deferred-mode bundles coalesce this sweep
    to once per bundle (cfg.coalesce_full_solves)."""
    NCAP = ds.state.shape[0]
    n = ds.nnodes
    from ..kernels.sweep import panel_backsub

    x_pos = panel_backsub(ds.R_blocks, ds.R_idx, ds.y, n, PANEL, NPANB)

    node_ids = jnp.arange(NCAP, dtype=jnp.int32)
    valid = node_ids < n
    dx = jnp.where(valid[:, None], x_pos[jnp.clip(ds.pos, 0, NCAP - 1)], 0.0)

    relin = ((jnp.abs(dx[:, 0]) > delta_xy) | (jnp.abs(dx[:, 1]) > delta_xy)
             | (jnp.abs(dx[:, 2]) > delta_theta)) & valid
    newly = relin & ~ds.relinearized
    start_over = jnp.minimum(ds.start_over, jnp.int32(1 << 30)) \
        + jnp.sum(newly).astype(jnp.int32)
    relinearized = ds.relinearized | relin

    ok = valid & ~jnp.any(jnp.isnan(dx), axis=1)
    new_state = jnp.where(ok[:, None], ds.l_point + dx, ds.state)
    new_state = new_state.at[:, 2].set(
        jnp.where(ok, mod2pi(new_state[:, 2]), new_state[:, 2]))
    delta_X = jnp.where(ok[:, None], dx, ds.delta_X)

    return ds._replace(state=new_state, delta_X=delta_X,
                       relinearized=relinearized, start_over=start_over)


def _windowed_sweep(ds: DeviceState, panels, PANEL: int, PW: int,
                    delta_xy: float, delta_theta: float) -> DeviceState:
    """Back-substitution + state update restricted to a panel WINDOW — the
    reference's pruned tree-gated descent (solve_node, aprilsam.c:721-779)
    at panel granularity.  `panels` [PW] holds descending panel indices
    (pad -1).  Cost is O(PW), independent of trajectory length: this is
    what makes the incremental step N-independent at 20k/100k poses, where
    the whole-graph sweep decayed throughput with N (VERDICT r4 missing
    #1).  Non-window nodes keep their states/deltas; their drift is
    re-synced by batch epochs and by periodic full sweeps
    (cfg.sweep_full_every), and bounded by the same delta-threshold
    rationale as the reference's early-exit pruning."""
    NCAP = ds.state.shape[0]
    NPANMAX = NCAP // PANEL
    n = ds.nnodes
    from ..kernels.sweep import panel_backsub_windowed

    node_ids = jnp.arange(NCAP, dtype=jnp.int32)
    valid = node_ids < n
    # previous solution in POSITION space (delta_X is node-indexed)
    pos_act = jnp.arange(NCAP, dtype=jnp.int32) < n
    x_prev = jnp.where(pos_act[:, None],
                       ds.delta_X[jnp.clip(ds.order, 0, NCAP - 1)], 0.0)
    x_pos = panel_backsub_windowed(ds.R_blocks, ds.R_idx, ds.y, x_prev,
                                   panels, n, PANEL, PW)

    # window membership per node
    pan_slot = jnp.where(panels >= 0, panels, NPANMAX)
    pan_act = jnp.zeros((NPANMAX + 1,), jnp.bool_).at[pan_slot].set(
        panels >= 0, mode="drop")
    member = pan_act[jnp.clip(ds.pos // PANEL, 0, NPANMAX - 1)] & valid

    dx = jnp.where(member[:, None], x_pos[jnp.clip(ds.pos, 0, NCAP - 1)],
                   0.0)
    relin = ((jnp.abs(dx[:, 0]) > delta_xy) | (jnp.abs(dx[:, 1]) > delta_xy)
             | (jnp.abs(dx[:, 2]) > delta_theta)) & member
    newly = relin & ~ds.relinearized
    start_over = jnp.minimum(ds.start_over, jnp.int32(1 << 30)) \
        + jnp.sum(newly).astype(jnp.int32)
    relinearized = ds.relinearized | relin

    ok = member & ~jnp.any(jnp.isnan(dx), axis=1)
    new_state = jnp.where(ok[:, None], ds.l_point + dx, ds.state)
    new_state = new_state.at[:, 2].set(
        jnp.where(ok, mod2pi(new_state[:, 2]), new_state[:, 2]))
    delta_X = jnp.where(ok[:, None], dx, ds.delta_X)

    return ds._replace(state=new_state, delta_X=delta_X,
                       relinearized=relinearized, start_over=start_over)


def _full_body(ds: DeviceState, packed,
               MAXAFF: int, MAXFR: int, KNEW: int, PANEL: int, NPANB: int,
               delta_xy: float, delta_theta: float, log_chi2: bool,
               RCAP: Optional[int] = None, half: bool = False):
    NCAP = ds.state.shape[0]
    BCAP = ds.R_idx.shape[1]
    dtype = ds.R_blocks.dtype
    off_i, _ = ints_layout(MAXAFF, MAXFR, KNEW)
    off_f, _ = floats_layout(KNEW)
    ints, floats, ridx, _inv, _scat = _unpack_plan(
        packed, MAXAFF, MAXFR, KNEW, BCAP, dtype, RCAP, half)
    if ridx.shape[1] < BCAP:
        ridx = jnp.pad(ridx, ((0, 0), (0, BCAP - ridx.shape[1])),
                       constant_values=NCAP)

    ds, R_up, y_new, row_valid, scalar_valid, spd, _pos2f = _frontal_core(
        ds, ints, floats, ridx, off_i, off_f, MAXAFF, KNEW)

    ds = _global_sweep(ds, PANEL, NPANB, delta_xy, delta_theta)
    start_over = ds.start_over

    chi2 = state_chi2(ds) if log_chi2 else jnp.asarray(jnp.nan, dtype)
    live = _unpack(ints, off_i, "scalars")[0] > 0
    return _finish(ds, chi2, start_over, spd, live, log_chi2)


@partial(jax.jit,
         static_argnames=("MAXAFF", "MAXFR", "KNEW", "PANEL", "NPANB",
                          "delta_xy", "delta_theta", "log_chi2"),
         donate_argnames=("ds",))
def inc_step_full(ds: DeviceState, packed,
                  MAXAFF: int, MAXFR: int, KNEW: int, PANEL: int, NPANB: int,
                  delta_xy: float, delta_theta: float, log_chi2: bool):
    return _full_body(ds, packed,
                      MAXAFF, MAXFR, KNEW, PANEL, NPANB,
                      delta_xy, delta_theta, log_chi2,
                      None, _legacy_half(ds))


@partial(jax.jit,
         static_argnames=("MAXAFF", "MAXFR", "KNEW", "PANEL", "NPANB",
                          "delta_xy", "delta_theta", "log_chi2", "coalesce"),
         donate_argnames=("ds",))
def inc_bundle_full(ds: DeviceState, packed_b, n_live,
                    MAXAFF: int, MAXFR: int, KNEW: int, PANEL: int,
                    NPANB: int, delta_xy: float, delta_theta: float,
                    log_chi2: bool, coalesce: bool = False):
    """B consecutive full steps in one dispatch.  With `coalesce`, slots
    run frontal + exact affected-set solves and the whole-graph sweep runs
    once at bundle end (see inc_bundle_mixed) — this is the path for
    affected sets beyond the largest mixed bucket."""
    half = _legacy_half(ds)

    if coalesce:
        def body(ds, packed):
            ds, stats = _fast_body(ds, packed,
                                   MAXAFF, MAXFR, KNEW, delta_xy,
                                   delta_theta, log_chi2, None, half)
            return ds, stats

        ds, stats = jax.lax.scan(body, ds, packed_b)
        ds = _global_sweep(ds, PANEL, NPANB, delta_xy, delta_theta)
        # patch the last LIVE slot's row (see inc_bundle_mixed)
        stats = stats.at[jnp.maximum(n_live - 1, 0), 1].set(
            ds.start_over.astype(jnp.float32))
        return ds, stats

    def body(ds, packed):
        ds, stats = _full_body(ds, packed,
                               MAXAFF, MAXFR, KNEW, PANEL, NPANB,
                               delta_xy, delta_theta, log_chi2, None, half)
        return ds, stats

    return jax.lax.scan(body, ds, packed_b)


# ----------------------------------------------------------------------
# mixed bundles: fast AND full steps in ONE executable
# ----------------------------------------------------------------------
#
# The M3500 replay interleaves fast and full steps densely (census:
# 2225 fast / 1224 full), so signature-homogeneous bundles fragment — every
# path flip flushes the queue, multiplying dispatches and h2d round trips
# (the round-2 TPU bench lost most of its time exactly there, see
# profile_alternation).  A mixed bundle gives every slot the SAME packed
# length (1 + the largest branch layout) and branches per slot with
# lax.switch: slot word 0 selects fast@16 / full@16 / full@64 / full@256,
# and the remaining words are that branch's own packed layout (a prefix of
# the slot).  lax.switch on TPU lowers to a real conditional, so a fast
# slot never pays the panel sweep.
# (MIXED_BUCKETS / MIXED_FR are defined at the top of the module: plan_step
# packs every plan at the MIXED_FR fringe width.)


def mixed_branch_len(M: int, K: int, BCAP: int, dtype, RCAP: int,
                     half: bool) -> int:
    _, L = packed_layout(M, MIXED_FR, K, BCAP, dtype, RCAP, half)
    return L


def mixed_flat_bucket(total: int) -> Optional[int]:
    for b in MIXED_FLAT_BUCKETS:
        if total <= b:
            return b
    return None


@partial(jax.jit,
         static_argnames=("KNEW", "PANEL", "NPANB", "RCAP",
                          "delta_xy", "delta_theta", "log_chi2", "coalesce"),
         donate_argnames=("ds",))
def inc_bundle_mixed(ds: DeviceState, flat, offs, n_live,
                     KNEW: int, PANEL: int, NPANB: int, RCAP: int,
                     delta_xy: float, delta_theta: float, log_chi2: bool,
                     coalesce: bool = False):
    """B heterogeneous steps in one dispatch — RAGGED layout.

    `flat` is a bucketed-static int32 buffer holding each slot's payload
    contiguously at `offs[i]`: word 0 selects the branch (0 = fast@16,
    then full@MIXED_BUCKETS), the rest is that branch's own packed-plan
    layout.  Slots therefore pay only their own branch's length (a fast
    slot is ~1.4k words vs the 13.6k-word uniform slot the old layout
    reserved), which matters because relay h2d is bandwidth-priced
    (~60-80 MB/s effective) and upload volume was the largest remaining
    replay cost.  Padding slots share ONE dead fast slot.

    With `coalesce`, full-path slots run only their frontal update + the
    EXACT affected-set solve (F is ancestor-closed, so x_F depends on no
    other rows — the fast-path algebra at the larger bucket), and the
    whole-graph sweep that refreshes non-affected nodes runs ONCE at
    bundle end instead of per slot (the sweep is the dominant full-step
    cost: ~2.7 ms of serialized pattern gathers).  Per-step semantics
    (and the reference trajectory) are preserved with coalesce off.  The
    last slot's stats row is patched to the post-sweep counters so the
    batch-fallback policy sees the sweep's relinearizations."""
    BCAP = ds.R_idx.shape[1]
    dtype = ds.R_blocks.dtype
    NCAP = ds.state.shape[0]
    half = half_ridx(NCAP, RCAP)

    def slot(ds, off, per_slot_sweep: bool):
        sel = flat[off]

        def fastlike(M):
            def f(ds):
                L = mixed_branch_len(M, KNEW, BCAP, dtype, RCAP, half)
                seg = jax.lax.dynamic_slice(flat, (off + 1,), (L,))
                return _fast_body(ds, seg, M, MIXED_FR, KNEW,
                                  delta_xy, delta_theta, log_chi2, RCAP,
                                  half)
            return f

        def fulllike(M):
            def f(ds):
                L = mixed_branch_len(M, KNEW, BCAP, dtype, RCAP, half)
                seg = jax.lax.dynamic_slice(flat, (off + 1,), (L,))
                return _full_body(ds, seg, M, MIXED_FR, KNEW, PANEL, NPANB,
                                  delta_xy, delta_theta, log_chi2, RCAP,
                                  half)
            return f

        full_branch = fulllike if per_slot_sweep else fastlike
        branches = (fastlike(16),) + tuple(
            full_branch(M) for M in MIXED_BUCKETS)
        return jax.lax.switch(sel, branches, ds)

    if not coalesce:
        def body(ds, off):
            return slot(ds, off, per_slot_sweep=True)

        return jax.lax.scan(body, ds, offs)

    def body(carry, off):
        ds, any_full = carry
        sel = flat[off]
        ds, stats = slot(ds, off, per_slot_sweep=False)
        return (ds, any_full | (sel > 0)), stats

    (ds, any_full), stats = jax.lax.scan(body, (ds, jnp.asarray(False)),
                                         offs)
    ds = jax.lax.cond(
        any_full,
        lambda ds: _global_sweep(ds, PANEL, NPANB, delta_xy, delta_theta),
        lambda ds: ds,
        ds)
    # expose the post-sweep cumulative counters to the policy reader in the
    # last LIVE slot's row (row -1 is dead padding when the bundle/chunk is
    # partially filled, and _Pending rows only cover the live slots)
    stats = stats.at[jnp.maximum(n_live - 1, 0), 1].set(
        ds.start_over.astype(jnp.float32))
    return ds, stats


# ----------------------------------------------------------------------
# supersteps: a whole bundle of steps as ONE joint frontal update
# ----------------------------------------------------------------------
#
# B sequential frontal updates with fixed linearization points compose:
# after steps 1..B, R satisfies R^T R = R_0^T R_0 + sum_i J_i^T W_i J_i
# regardless of whether the QRs ran one-by-one or as ONE joint
# qr([R_Fu ; W^{1/2} J_all]) on the union affected set Fu (a union of
# ancestor-closed sets is ancestor-closed, so the joint front is
# self-contained exactly like the per-step one).  l_points are fixed
# within a bundle by construction (updates move `state`, not `l_point`;
# only batch epochs relinearize), so the equivalence is exact in exact
# arithmetic.  The one semantic drift vs per-step execution: a new node's
# odometry seed composes from the PRE-bundle state of its chain's base
# node instead of the post-previous-step state (the GN correction of the
# intervening steps, typically ~1e-3, moves only the linearization point
# of brand-new nodes).  Benchmarks accept this under the final-chi2 band
# guard, like coalesce_full_solves; parity tests run per-step mode.
#
# Why: a 32-slot mixed bundle costs 32 serialized slot bodies (~0.7 ms
# each, op-count-bound — measured profile_mixedcost) plus per-slot h2d;
# the joint update is ONE gather + ONE MXU-sized QR (~0.8 ms at m=256,
# measured profile_qr) + ONE sweep, and host planning runs once per
# bundle instead of per step.


def _sup_caps(cfg: SolverConfig) -> Tuple[int, int, int]:
    """Packed-layout capacities of a superstep plan: (knode, kseed, kfac).
    Static per config — they key the inc_superstep executables."""
    S = cfg.superstep_size
    return S + KNODE, S + KSEED, max(2 * S, cfg.new_factor_capacity)


@partial(jax.jit,
         static_argnames=("MAXAFF", "KNEW", "KNODE_S", "KSEED_S",
                          "PANEL", "NPANB",
                          "delta_xy", "delta_theta", "log_chi2"),
         donate_argnames=("ds",))
def inc_superstep(ds: DeviceState, packed,
                  MAXAFF: int, KNEW: int, KNODE_S: int, KSEED_S: int,
                  PANEL: int, NPANB: int,
                  delta_xy: float, delta_theta: float, log_chi2: bool):
    """One joint frontal update over the union affected set of a whole
    bundle of steps, then one whole-graph sweep (solve_node with pruning
    disabled, aprilsam.c:721-779) that refreshes every node's state and
    the relinearization counters."""
    half = _legacy_half(ds)
    ds, stats = _fast_body(ds, packed, MAXAFF, MIXED_FR, KNEW,
                           delta_xy, delta_theta, False, None, half,
                           KNODE_S, KSEED_S, with_tables=True)
    ds = _global_sweep(ds, PANEL, NPANB, delta_xy, delta_theta)
    stats = stats.at[1].set(ds.start_over.astype(jnp.float32))
    if log_chi2:
        off_i, _ = ints_layout(MAXAFF, MIXED_FR, KNEW, KNODE_S, KSEED_S)
        live = packed[off_i["scalars"][0]] > 0   # m > 0 (dead = precompile)
        chi2 = state_chi2(ds)
        LOG = ds.chi2_log.shape[0]
        ds = ds._replace(
            chi2_log=ds.chi2_log.at[
                jnp.where(live, ds.log_ptr, LOG)].set(chi2, mode="drop"),
            log_ptr=ds.log_ptr + live.astype(jnp.int32))
        stats = stats.at[0].set(chi2.astype(jnp.float32))
    return ds, stats


@partial(jax.jit,
         static_argnames=("MAXAFF", "KNEW", "KNODE_S", "KSEED_S",
                          "delta_xy", "delta_theta"),
         donate_argnames=("ds",))
def inc_superstep_nosweep(ds: DeviceState, packed,
                          MAXAFF: int, KNEW: int, KNODE_S: int,
                          KSEED_S: int,
                          delta_xy: float, delta_theta: float):
    """Superstep WITHOUT the trailing whole-graph sweep: the joint frontal
    update solves the union front + fringe exactly (states of F update
    in-kernel, so the next bundle's odometry seeds read post-front states),
    and non-front state refresh is deferred to the next swept superstep
    (cfg.sweep_every_supersteps).  Half the sweep cost of back-to-back
    supersteps at the accuracy of the per-bundle front math; staleness is
    bounded by the sweep cadence and cleared by epochs and flush()."""
    half = _legacy_half(ds)
    ds, stats = _fast_body(ds, packed, MAXAFF, MIXED_FR, KNEW,
                           delta_xy, delta_theta, False, None, half,
                           KNODE_S, KSEED_S, with_tables=True)
    return ds, stats


@partial(jax.jit, static_argnames=("PANEL", "NPANB", "delta_xy",
                                   "delta_theta"),
         donate_argnames=("ds",))
def sweep_only(ds: DeviceState, PANEL: int, NPANB: int,
               delta_xy: float, delta_theta: float):
    """Standalone whole-graph sweep (flush-time staleness clear for the
    nosweep / windowed superstep modes)."""
    return _global_sweep(ds, PANEL, NPANB, delta_xy, delta_theta)


@partial(jax.jit,
         static_argnames=("MAXAFF", "KNEW", "KNODE_S", "KSEED_S",
                          "PANEL", "PW",
                          "delta_xy", "delta_theta", "log_chi2"),
         donate_argnames=("ds",))
def inc_superstep_win(ds: DeviceState, packed, panels,
                      MAXAFF: int, KNEW: int, KNODE_S: int, KSEED_S: int,
                      PANEL: int, PW: int,
                      delta_xy: float, delta_theta: float, log_chi2: bool):
    """Superstep variant with a WINDOWED sweep (panels [PW], descending,
    pad -1): the joint frontal update is identical to inc_superstep, but
    the back-substitution refreshes only the window — O(PW) per superstep
    instead of O(N/PANEL).  The large-N throughput mode."""
    half = _legacy_half(ds)
    ds, stats = _fast_body(ds, packed, MAXAFF, MIXED_FR, KNEW,
                           delta_xy, delta_theta, False, None, half,
                           KNODE_S, KSEED_S, with_tables=True)
    ds = _windowed_sweep(ds, panels, PANEL, PW, delta_xy, delta_theta)
    stats = stats.at[1].set(ds.start_over.astype(jnp.float32))
    if log_chi2:
        off_i, _ = ints_layout(MAXAFF, MIXED_FR, KNEW, KNODE_S, KSEED_S)
        live = packed[off_i["scalars"][0]] > 0
        chi2 = state_chi2(ds)
        LOG = ds.chi2_log.shape[0]
        ds = ds._replace(
            chi2_log=ds.chi2_log.at[
                jnp.where(live, ds.log_ptr, LOG)].set(chi2, mode="drop"),
            log_ptr=ds.log_ptr + live.astype(jnp.int32))
        stats = stats.at[0].set(chi2.astype(jnp.float32))
    return ds, stats


# ======================================================================
# orchestration
# ======================================================================

@dataclass
class _Pending:
    step: int
    stats: jax.Array             # [3] or a whole bundle's [B, 3]
    dispatched_after_batch: int  # batch-epoch serial at dispatch time
    row: int = -1                # row within a bundle stats array (-1: 1-D)
    step_ms: float = 0.0         # wall-clock estimate for the deferred gate
                                 # (dispatch-to-dispatch interval / bundle
                                 # size; 0.0 = unknown, gate inactive)


class IncrementalSolver:
    """Counterpart of the reference's incremental API: solve() runs a batch
    epoch, update() an AprilSAM incremental step with automatic batch
    fallback.  With cfg.policy_lag > 0 the policy counters are read back
    asynchronously (decisions may lag a few steps) so the device pipeline
    never stalls on the host round-trip."""

    def __init__(self, cfg: Optional[SolverConfig] = None):
        from ..utils import setup_precision

        setup_precision()
        self.cfg = cfg or SolverConfig()
        self.ds = init_device_state(self.cfg)
        self.sym: Optional[SymbolicState] = None
        self.factor_num = 0
        self.node_num = 0
        self.batch_time_ms = 0.0
        self._ingested_nodes = 0
        self._ingested_factors = 0
        self.last_path = "none"
        self.last_naffected = 0
        self.steps_done = 0
        # structured step metrics (SURVEY §5 observability): dispatch/path
        # counts plus the union-front size histogram in superstep mode
        self.counters = {"superstep": 0, "sup_overflow": 0, "batch": 0,
                         "sup_m_max": 0, "sup_m_sum": 0}
        self._batch_serial = 0
        self._pending: deque = deque()
        self._due_since_poll = 0
        self._queue: list = []       # planned-but-undispatched bundle slots
        self._queue_sig = None
        self._sbuf: list = []        # buffered raw steps (superstep mode):
                                     # (f0, f1, n_old, n1, seeds, graph)
        self._sbuf_counts = [0, 0, 0, 0]   # nodes, seeds, xyt, pos
        # wall-clock of the previous dispatch: the dispatch-to-dispatch
        # interval divided by bundle size is the deferred-mode estimate of
        # per-step time feeding the batch_time/3 gate (aprilsam.c:557-559)
        self._last_dispatch_t: Optional[float] = None
        from ..utils.timeprofile import TimeProfile

        self.tp = TimeProfile() if self.cfg.show_timing else None

    # ---------------------------------------------------------------

    def _ingest(self, g: FactorGraph, to_node: int = None,
                to_factor: int = None):
        self.ds = ingest_graph(
            self.ds, g, self.cfg, self._ingested_nodes,
            self._ingested_factors, to_node, to_factor)
        self._ingested_nodes = g.nnodes if to_node is None else to_node
        self._ingested_factors = g.nfactors if to_factor is None else to_factor

    def _apply_seeds(self, seeds: Sequence[SeedSpec]):
        """Device-side odometry seeding outside the step kernel (used on the
        plan-overflow batch-fallback path): dst = src (+) z, matching the
        in-kernel seeding of _frontal_core and aprilsam_demo.c:180-191."""
        if not seeds:
            return
        state, l_point = self.ds.state, self.ds.l_point
        for s in seeds:
            z = jnp.asarray(np.asarray(s.z), dtype=state.dtype)
            if s.invert:
                z = xyt_inv(z)
            seeded = xyt_mul(state[s.src], z)
            state = state.at[s.dst].set(seeded)
            l_point = l_point.at[s.dst].set(seeded)
        self.ds = self.ds._replace(state=state, l_point=l_point)

    def _ingest_tail_fast(self, g: FactorGraph,
                          seeds: Sequence[SeedSpec],
                          caps: Optional[Tuple[int, int, int]] = None,
                          limits: Optional[Tuple[int, int]] = None) -> bool:
        """Jitted tail ingestion + seeding for the plan-overflow batch path.
        Returns False when the tail exceeds the packing capacities (caller
        then uses the generic eager ingest).  `caps` = (knode, kseed, kfac);
        None = the per-step layout.  Seed srcs must not themselves be seed
        dsts (superstep fallbacks pass pre-composed chains; srcs that are
        new-but-unseeded nodes are fine — ingestion precedes seeding)."""
        if caps is None:
            knode, kseed, K = KNODE, KSEED, self.cfg.new_factor_capacity
        else:
            knode, kseed, K = caps
        n0, f0 = self._ingested_nodes, self._ingested_factors
        n_end, f_end = limits if limits is not None else (g.nnodes,
                                                         g.nfactors)
        new_ids = list(range(n0, n_end))
        by_dst = {}
        for s in seeds:
            by_dst[s.dst] = s
        seeds = list(by_dst.values())
        dsts = {s.dst for s in seeds}
        if (len(new_ids) > knode or len(seeds) > kseed
                or any(s.src in dsts for s in seeds)):
            return False
        nf_a, nf_b, nf_z, nf_W = [], [], [], []
        np_n, np_z, np_W = [], [], []
        for f in range(f0, f_end):
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
        if len(nf_a) > K or len(np_n) > K:
            return False

        off_i, len_i = ints_layout(0, 0, K, knode, kseed)
        off_f, len_f = floats_layout(K, knode, kseed)
        ints = np.zeros(len_i, dtype=np.int32)
        flts = np.zeros(len_f, dtype=np.float64)

        def seti(name, arr, fill=0):
            lo, hi = off_i[name]
            seg = np.full(hi - lo, fill, dtype=np.int32)
            seg[: len(arr)] = arr
            ints[lo:hi] = seg

        def setf(name, arr):
            lo, hi = off_f[name]
            a = np.asarray(arr, dtype=np.float64).reshape(-1)
            flts[lo: lo + a.shape[0]] = a

        NCAP = self.cfg.node_capacity
        seti("nf_a", nf_a)
        seti("nf_b", nf_b)
        seti("np_node", np_n)
        seti("node_ids", new_ids, NCAP)
        seti("seed_src", [s.src for s in seeds])
        seti("seed_dst", [s.dst for s in seeds], NCAP)
        seti("seed_inv", [1 if s.invert else 0 for s in seeds])
        seti("scalars", [0, len(nf_a), len(np_n), 0, len(new_ids),
                         len(seeds), 0, 0])
        if nf_z:
            setf("nf_z", nf_z)
            setf("nf_W", nf_W)
        if np_z:
            setf("np_z", np_z)
            setf("np_W", np_W)
        if new_ids:
            setf("node_states", g.state[new_ids])
        if seeds:
            setf("seed_z", [s.z for s in seeds])

        fbits = np.ascontiguousarray(
            flts.astype(self._device_dtype)).view(np.int32)
        packed = jnp.asarray(np.concatenate([ints, fbits]))
        self.ds = inc_ingest_tail(self.ds, packed, KNEW=K,
                                  knode=knode, kseed=kseed)
        self._ingested_nodes = n_end
        self._ingested_factors = f_end
        return True

    def _grow_row_capacity(self):
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

    def _maybe_grow_capacity(self, g: FactorGraph) -> None:
        """Double node/factor capacities before the incoming step could
        overflow them — the TPU-native counterpart of the reference's
        reallocs (aprilsam.c:411-450).  A growth is a full device-state
        rebuild (new static shapes => the step executables recompile at the
        new capacity), so it happens once per doubling, not per step."""
        import dataclasses

        cfg = self.cfg
        need_nodes = g.nnodes + KNODE + 1
        n_xyt = g.nf_xyt
        n_pos = g.nfactors - n_xyt
        FPOS = max(256, cfg.factor_capacity // 8)
        need_f = n_xyt + cfg.new_factor_capacity + 1
        need_p = n_pos + cfg.new_factor_capacity + 1
        if (need_nodes <= cfg.node_capacity and need_f <= cfg.factor_capacity
                and need_p <= FPOS):
            return

        ncap = cfg.node_capacity
        while need_nodes > ncap:
            ncap *= 2
        fcap = cfg.factor_capacity
        while need_f > fcap or need_p > max(256, fcap // 8):
            fcap *= 2

        # everything queued must land in the old-shape state first
        self._dispatch_queue()
        old = jax.device_get(self.ds)
        old_ncap = cfg.node_capacity
        new_cfg = dataclasses.replace(
            cfg, node_capacity=ncap, factor_capacity=fcap)
        self.cfg = new_cfg
        ds2 = init_device_state(new_cfg)
        h = {}
        for name in DeviceState._fields:
            dst = np.asarray(jax.device_get(getattr(ds2, name)))
            src = np.asarray(getattr(old, name))
            if dst.ndim == 0:
                h[name] = src
                continue
            dst = dst.copy()
            sl = tuple(slice(0, s) for s in src.shape)
            dst[sl] = src
            h[name] = dst
        # old-sentinel rewrite: pattern padding used the OLD capacity
        h["R_idx"][h["R_idx"] >= old_ncap] = ncap
        # identity position map beyond the old capacity
        h["pos"][old_ncap:] = np.arange(old_ncap, ncap, dtype=np.int32)
        h["order"][old_ncap:] = np.arange(old_ncap, ncap, dtype=np.int32)
        self.ds = DeviceState(**{
            name: jnp.asarray(h[name]) for name in DeviceState._fields})

        # rebuild the native planner mirror at the new capacity (sentinels
        # and array sizes are capacity-dependent)
        sym = self.sym
        if sym is not None and getattr(sym, "pad_idx", None) is not None:
            sym.patterns = sym_patterns_list(sym)
            sym.patterns_stale = False
            sym.pad_idx = None
            sym.pad_nnz = None

    def _use_host_batch(self) -> bool:
        if self.cfg.batch_backend == "host":
            return True
        if self.cfg.batch_backend in ("device", "panel"):
            return False
        from .. import native

        return native.available()

    def _run_batch(self, g: FactorGraph, record_time: bool = False,
                   log_mode: int = 0, nnodes: int = None,
                   nfactors: int = None) -> BatchInfo:
        # queued incremental steps logically precede this batch epoch.
        # nnodes/nfactors bound the epoch to an already-ingested span (the
        # superstep overflow fallback; device tables may not yet hold the
        # caller's pending tail).
        self._dispatch_queue()
        nn = g.nnodes if nnodes is None else nnodes
        nf = g.nfactors if nfactors is None else nfactors
        t0 = time.perf_counter()
        while True:
            try:
                if self._use_host_batch():
                    from .host_batch import host_batch_epoch

                    self.ds, self.sym, info = host_batch_epoch(
                        self.ds, self.cfg, nn,
                        g.ftype[:nf], g.fnodes[:nf],
                        g.fz[:nf], g.fW[:nf],
                        log_mode=log_mode)
                else:
                    try:
                        self.ds, self.sym, info = run_batch_epoch(
                            self.ds, self.cfg, nn,
                            g.ftype[:nf], g.fnodes[:nf],
                            log_mode=log_mode,
                            lazy=self.cfg.policy_lag > 0)
                    except PanelFallbackError:
                        # panel caps exceeded at a scale where the dense
                        # bucketed epoch cannot fit: float64 host epoch
                        from .host_batch import host_batch_epoch

                        self.ds, self.sym, info = host_batch_epoch(
                            self.ds, self.cfg, nn,
                            g.ftype[:nf], g.fnodes[:nf],
                            g.fz[:nf], g.fW[:nf], log_mode=log_mode)
                break
            except OverflowError:
                self._grow_row_capacity()
        if record_time and self.cfg.wallclock_gate:
            # param->batch_time is recorded only when a batch is triggered
            # from the incremental path (aprilsam.c:568-572); blocking makes
            # the recorded time honest, but is pure pipeline stall when the
            # wall-clock gate (its only consumer) is disabled
            jax.block_until_ready(self.ds.state)
        if self.tp is not None:
            self.tp.stamp("batch_epoch")
        if record_time:
            self.batch_time_ms = (time.perf_counter() - t0) * 1e3
        # the next dispatch interval would include this epoch's time;
        # restart the deferred-gate clock
        self._last_dispatch_t = None
        self.factor_num = max(self.factor_num, nf)
        self.node_num = max(self.node_num, nn)
        self.last_path = "batch"
        self._sweep_stale = False
        self._batch_serial += 1
        self.counters["batch"] += 1
        return info

    def solve(self, g: FactorGraph) -> BatchInfo:
        """Full batch solve (april_graph_cholesky)."""
        if g.nnodes == 0 or g.nfactors == 0:
            return BatchInfo(chi2=0.0, spd=True, n=0)
        self._maybe_grow_capacity(g)
        self._ingest(g)
        info = self._run_batch(g)
        self.steps_done += 1
        return info

    # ---------------------------------------------------------------

    def _apply_policy(self, stats: np.ndarray, serial: int, step_ms: float,
                      g: FactorGraph) -> Optional[BatchInfo]:
        start_over = int(stats[1])
        spd = bool(stats[2] > 0.5)
        if serial != self._batch_serial:
            return None  # stats predate the last batch epoch; counters reset
        if (self.cfg.wallclock_gate and step_ms > 0.0
                and self.batch_time_ms > 0.0
                and step_ms > self.batch_time_ms * self.cfg.batch_time_fraction):
            # aprilsam.c:557-559.  In synchronous mode step_ms is the true
            # step wall-clock; in deferred/bundled mode it is the
            # dispatch-to-dispatch interval averaged over the bundle (the
            # steady-state pipeline throughput), so the real-time contract
            # survives async dispatch.
            start_over = INT_MAX
        if self.cfg.check_spd and not spd:
            start_over = INT_MAX
        if start_over > self.cfg.nthreshold:  # aprilsam.c:566-575
            mode = 1 if self.cfg.policy_lag == 0 else 2
            return self._run_batch(g, record_time=True, log_mode=mode)
        return None

    def _drain_pending(self, g: FactorGraph, block_all: bool = False):
        """Pop due pending entries and apply the batch-fallback policy.

        Device counters are cumulative (start_over monotone since last batch,
        spd AND-folded into stats[2]), so only the NEWEST due entry is ever
        materialized — one d2h round trip per poll instead of one per bundle,
        and cfg.policy_poll rations even those.  The wall-clock gate
        (aprilsam.c:557-559) needs no readback at all: it runs on the
        host-recorded dispatch intervals of every due entry."""
        lag = self.cfg.policy_lag
        due = []
        while self._pending and (block_all or len(self._pending) > lag):
            due.append(self._pending.popleft())
        if not due:
            return
        self._due_since_poll += len(due)
        fresh = [p for p in due
                 if p.dispatched_after_batch == self._batch_serial]
        if not fresh:
            return
        if (self.cfg.wallclock_gate and self.batch_time_ms > 0.0 and
                any(p.step_ms > 0.0 and p.step_ms >
                    self.batch_time_ms * self.cfg.batch_time_fraction
                    for p in fresh)):
            self._due_since_poll = 0
            mode = 1 if self.cfg.policy_lag == 0 else 2
            self._run_batch(g, record_time=True, log_mode=mode)
            return
        if block_all or self._due_since_poll >= self.cfg.policy_poll:
            # Same poll cadence as a blocking drain (deferring decisions
            # lets start_over run long past nthreshold, which grows the
            # affected sets until steps overflow the largest frontal bucket
            # — measured as a net regression), but pick the entry that
            # costs the least wall-clock: the NEWEST entry whose stats are
            # already computed (np.asarray is then free — counters are
            # cumulative, so any fresh entry is exact), falling back to the
            # OLDEST due entry (shortest pipeline wait) when none is ready.
            if block_all:
                p = fresh[-1]
            else:
                ready = [q for q in fresh if q.stats.is_ready()]
                p = ready[-1] if ready else fresh[0]
            self._due_since_poll = 0
            stats = np.asarray(p.stats)
            if p.row >= 0:
                stats = stats[p.row]
            self._apply_policy(stats, p.dispatched_after_batch, 0.0, g)

    def update(self, g: FactorGraph,
               seeds: Sequence[SeedSpec] = ()) -> Optional[BatchInfo]:
        """Incremental update (april_graph_cholesky_inc).

        With policy_lag == 0 this is fully synchronous and returns the step's
        BatchInfo; with lag > 0 it returns None and policy decisions are
        applied as stats arrive (use flush() at the end of a replay)."""
        if g.nnodes == 0 or g.nfactors == 0:
            return BatchInfo(chi2=0.0, spd=True, n=0)
        if self.sym is None or self.factor_num == g.nfactors:
            # guards (aprilsam.c:380-385); reflect any queued steps first
            self._dispatch_queue()
            return BatchInfo(chi2=float(state_chi2(self.ds)), spd=True, n=0)
        self._maybe_grow_capacity(g)

        if self.cfg.superstep_size > 1:
            return self._update_superstep(g, seeds)

        if self.tp is not None:
            self.tp.reset()
        t0 = time.perf_counter()
        try:
            plan = plan_step(self.sym, self.cfg, g, self.factor_num,
                             g.nfactors, self.node_num, seeds)
        except OverflowError:
            plan = None
        self.factor_num = g.nfactors
        self.node_num = g.nnodes
        if self.tp is not None:
            self.tp.stamp("plan")

        if plan is None:
            # Plan overflow -> batch fallback.  This step's new nodes/factors
            # were never ingested in-kernel: flush any queued bundle first
            # (its in-kernel appends must land before ours), then ingest the
            # tail + apply odometry seeds via the jitted ingest kernel
            # (aprilsam_demo.c:180-191) — the eager fallback remains for
            # oversized tails only (its first run costs a burst of ~0.4 s
            # relay op-compiles and a pipeline-stalling table-count read).
            self._dispatch_queue()
            if not self._ingest_tail_fast(g, seeds):
                self._ingest(g)
                self._apply_seeds(seeds)
            self.steps_done += 1
            return self._run_batch(g, record_time=True)

        self._ingested_nodes = g.nnodes
        self._ingested_factors = g.nfactors

        self.last_naffected = plan.naffected
        fast = (plan.naffected <= self.cfg.small_path_max
                and not plan.fringe_overflow)
        if fast:
            self.last_path = "fast"
            sig = ("fast", plan.MAXAFF, plan.MAXFR)
        else:
            self.last_path = "full"
            sig = ("full", plan.MAXAFF, plan.MAXFR, self._npanb(g.nnodes))

        B = max(1, self.cfg.bundle_size)
        if B > 1:
            sel = self._mixed_sel(plan, fast)
            if sel is not None:
                sig = ("mixed", self._npanb(g.nnodes))
                cap = B
            else:
                cap = B if fast else max(1, min(B, self.cfg.bundle_size_full))
            if self._queue and self._queue_sig != sig:
                self._dispatch_queue()
            self._queue_sig = sig
            self._queue.append((plan, sel))
            self.steps_done += 1
            if len(self._queue) >= cap:
                self._dispatch_queue()
                if self.tp is not None:
                    self.tp.stamp("dispatch_bundle")
            self._drain_pending(g)
            if self.tp is not None:
                self.tp.stamp("drain_policy")
            return None

        stats = self._dispatch_one(plan, sig)
        self.steps_done += 1
        if self.tp is not None:
            self.tp.stamp("dispatch")

        if self.cfg.policy_lag == 0:
            s = np.asarray(stats)
            step_ms = (time.perf_counter() - t0) * 1e3
            info = self._apply_policy(s, self._batch_serial, step_ms, g)
            if info is not None:
                return info
            return BatchInfo(chi2=float(s[0]), spd=bool(s[2] > 0.5),
                             n=g.nnodes)
        else:
            self._pending.append(
                _Pending(self.steps_done - 1, stats, self._batch_serial,
                         step_ms=self._mark_dispatch(1)))
            self._drain_pending(g)
            return None

    # ------------------------------------------------------- supersteps

    def _update_superstep(self, g: FactorGraph,
                          seeds: Sequence[SeedSpec]) -> None:
        """Buffer one raw step; dispatch the buffer as ONE joint frontal
        update when it reaches superstep_size (or would overflow a packed
        capacity).  See the superstep section above for the algebra."""
        knode, kseed, kfac = _sup_caps(self.cfg)
        f0, f1 = self.factor_num, g.nfactors
        n_old = self.node_num
        n_new = g.nnodes - n_old
        nx = int(np.sum(g.ftype[f0:f1] == FACTOR_XYT))
        npz = (f1 - f0) - nx
        if n_new > knode or len(seeds) > kseed or nx > kfac or npz > kfac:
            raise OverflowError("single step exceeds superstep capacities")
        c = self._sbuf_counts
        if self._sbuf and (c[0] + n_new > knode or c[1] + len(seeds) > kseed
                           or c[2] + nx > kfac or c[3] + npz > kfac):
            self._dispatch_superstep()
        self._sbuf.append((f0, f1, n_old, g.nnodes, list(seeds), g))
        c = self._sbuf_counts
        c[0] += n_new
        c[1] += len(seeds)
        c[2] += nx
        c[3] += npz
        self.factor_num = f1
        self.node_num = g.nnodes
        self.steps_done += 1
        self.last_path = "super"
        if len(self._sbuf) >= self.cfg.superstep_size:
            self._dispatch_superstep()
            if self.tp is not None:
                self.tp.stamp("dispatch_super")
        self._drain_pending(g)
        return None

    def _dispatch_superstep(self):
        """Plan + dispatch the buffered steps as one joint frontal update on
        the union affected set; union overflow falls back to a batch epoch
        (the reference's full-batch branch)."""
        if not self._sbuf:
            return
        entries, self._sbuf = self._sbuf, []
        self._sbuf_counts = [0, 0, 0, 0]
        g = entries[-1][5]
        f0, n_old = entries[0][0], entries[0][2]
        f1, n1 = entries[-1][1], entries[-1][3]
        k = len(entries)

        # Pre-compose within-bundle seed chains host-side so every seed is
        # a single hop from a node whose device state is current at kernel
        # entry (pre-bundle node, or a new node ingested un-seeded this
        # bundle): state[dst] = state[base] o (z_1 o ... o z_j) — exact,
        # xyt composition is associative.  Last-wins per dst preserved.
        # scalar float64 arithmetic (identical formulas to np_xyt_mul /
        # np_xyt_inv in geometry.py; python floats skip ~10 us of numpy
        # call overhead per seed, ~70 ms per M3500 replay)
        cur = {}
        for (_a, _b, _c2, _n1, ss, _g2) in entries:
            for s in ss:
                zx, zy, zt = (float(s.z[0]), float(s.z[1]), float(s.z[2]))
                if s.invert:
                    si, ci = math.sin(zt), math.cos(zt)
                    zx, zy, zt = (-si * zy - ci * zx,
                                  -ci * zy + si * zx, -zt)
                if s.src in cur:
                    base, (ax, ay, at) = cur[s.src]
                    s2, c2 = math.sin(at), math.cos(at)
                    cur[s.dst] = (base, (c2 * zx - s2 * zy + ax,
                                         s2 * zx + c2 * zy + ay, at + zt))
                else:
                    cur[s.dst] = (int(s.src), (zx, zy, zt))
        seeds_u = [SeedSpec(src=b, dst=int(d),
                            z=np.asarray(zc, dtype=np.float64), invert=False)
                   for d, (b, zc) in cur.items()]

        knode, kseed, kfac = _sup_caps(self.cfg)
        if self.tp is not None:
            self.tp.reset()
        try:
            plan = plan_step(self.sym, self.cfg, g, f0, f1, n_old, seeds_u,
                             knode=knode, kseed=kseed, kfac=kfac,
                             buckets=self.cfg.effective_superstep_buckets,
                             with_tables=True, n_end=n1)
        except OverflowError:
            plan = None
        if self.tp is not None:
            self.tp.stamp("plan_super")
        if plan is None:
            # union exceeds the largest bucket -> batch fallback, bounded
            # to the buffered span (a capacity-flush dispatches while the
            # caller's current step is still pending outside the buffer)
            self.counters["sup_overflow"] += 1
            if not self._ingest_tail_fast(g, seeds_u,
                                          caps=(knode, kseed, kfac),
                                          limits=(n1, f1)):
                self._ingest(g, to_node=n1, to_factor=f1)
                self._apply_seeds(seeds_u)
            self._run_batch(g, record_time=True, nnodes=n1, nfactors=f1)
            return
        self._ingested_nodes = n1
        self._ingested_factors = f1
        self.last_naffected = plan.naffected
        self.counters["superstep"] += 1
        self.counters["sup_m_sum"] += plan.m
        self.counters["sup_m_max"] = max(self.counters["sup_m_max"], plan.m)

        packed = jnp.asarray(pack_plan(plan, self._device_dtype, None,
                                       self._legacy_half))
        npanb = self._npanb(g.nnodes)

        # Windowed sweep (cfg.sweep_window_panels > 0): refresh only the
        # panels the union front + fringe touch — O(PW) instead of
        # O(nnodes/PANEL) — unless the window overflows or a periodic full
        # re-sync is due.
        cadence = max(1, self.cfg.sweep_every_supersteps)
        self._sup_since_sweep = getattr(self, "_sup_since_sweep", 0)
        if cadence > 1 and self._sup_since_sweep + 1 < cadence:
            self._sup_since_sweep += 1
            self._sweep_stale = True
            self.counters["sup_nosweep"] = \
                self.counters.get("sup_nosweep", 0) + 1
            self.ds, stats = inc_superstep_nosweep(
                self.ds, packed,
                MAXAFF=plan.MAXAFF, KNEW=kfac, KNODE_S=knode,
                KSEED_S=kseed,
                delta_xy=float(self.cfg.delta_xy),
                delta_theta=float(self.cfg.delta_theta))
            self._pending.append(
                _Pending(self.steps_done - 1, stats, self._batch_serial,
                         step_ms=self._mark_dispatch(k)))
            return
        self._sup_since_sweep = 0

        PW = self.cfg.sweep_window_panels
        win = None
        if PW > 0 and plan.F_pos is not None:
            self._sweep_serial = getattr(self, "_sweep_serial", 0) + 1
            periodic = (self.cfg.sweep_full_every > 0 and
                        self._sweep_serial % self.cfg.sweep_full_every == 0)
            pans = np.unique(np.concatenate(
                [plan.F_pos, plan.fringe_pos]) // self.cfg.panel_nodes)
            if not periodic and len(pans) <= PW:
                win = np.full(PW, -1, dtype=np.int32)
                win[: len(pans)] = pans[::-1].astype(np.int32)  # descending
        if win is not None:
            self._sweep_stale = True
            self.counters["sweep_win"] = \
                self.counters.get("sweep_win", 0) + 1
            self.ds, stats = inc_superstep_win(
                self.ds, packed, jnp.asarray(win),
                MAXAFF=plan.MAXAFF, KNEW=kfac, KNODE_S=knode,
                KSEED_S=kseed, PANEL=self.cfg.panel_nodes, PW=PW,
                delta_xy=float(self.cfg.delta_xy),
                delta_theta=float(self.cfg.delta_theta),
                log_chi2=self.cfg.log_chi2)
        else:
            self._sweep_stale = False
            self.ds, stats = inc_superstep(
                self.ds, packed,
                MAXAFF=plan.MAXAFF, KNEW=kfac, KNODE_S=knode, KSEED_S=kseed,
                PANEL=self.cfg.panel_nodes, NPANB=npanb,
                delta_xy=float(self.cfg.delta_xy),
                delta_theta=float(self.cfg.delta_theta),
                log_chi2=self.cfg.log_chi2)
        self._pending.append(
            _Pending(self.steps_done - 1, stats, self._batch_serial,
                     step_ms=self._mark_dispatch(k)))

    # ------------------------------------------------------- dispatching

    def _npanb(self, nnodes: int) -> int:
        """Static number of active sweep panels: next power of two covering
        ceil(nnodes / PANEL), so early-trajectory full solves never sweep
        padding panels (one specialization per doubling)."""
        PANEL = self.cfg.panel_nodes
        NPAN = self.cfg.node_capacity // PANEL
        b = 1
        while b * PANEL < nnodes and b < NPAN:
            b *= 2
        return min(b, NPAN)

    def _mark_dispatch(self, k: int) -> float:
        """Advance the dispatch clock; return the per-step wall-clock estimate
        (previous dispatch-to-dispatch interval / k) for the deferred gate."""
        now = time.perf_counter()
        step_ms = 0.0
        if self._last_dispatch_t is not None and k > 0:
            step_ms = (now - self._last_dispatch_t) * 1e3 / k
        self._last_dispatch_t = now
        return step_ms

    @property
    def _device_dtype(self):
        """The dtype device arrays ACTUALLY carry: cfg.dtype float64 with
        jax x64 disabled silently truncates to float32, and the packed-plan
        float-bit encoding must match the kernel's unpacking width."""
        return np.dtype(self.ds.R_blocks.dtype)

    @property
    def _legacy_half(self) -> bool:
        return half_ridx(self.cfg.node_capacity, self.cfg.row_block_capacity)

    def _dispatch_one(self, plan: StepPlan, sig):
        K = self.cfg.new_factor_capacity
        packed = jnp.asarray(
            pack_plan(plan, self._device_dtype, None, self._legacy_half))
        if sig[0] == "fast":
            self.ds, stats = inc_step_fast(
                self.ds, packed,
                MAXAFF=plan.MAXAFF, MAXFR=plan.MAXFR, KNEW=K,
                delta_xy=float(self.cfg.delta_xy),
                delta_theta=float(self.cfg.delta_theta),
                log_chi2=self.cfg.log_chi2)
        else:
            self.ds, stats = inc_step_full(
                self.ds, packed,
                MAXAFF=plan.MAXAFF, MAXFR=plan.MAXFR, KNEW=K,
                PANEL=self.cfg.panel_nodes, NPANB=sig[3],
                delta_xy=float(self.cfg.delta_xy),
                delta_theta=float(self.cfg.delta_theta),
                log_chi2=self.cfg.log_chi2)
        return stats

    def _mixed_sel(self, plan: StepPlan, fast: bool) -> Optional[int]:
        """Branch selector of a plan inside a mixed bundle, or None when the
        plan does not fit the mixed layout (legacy per-signature dispatch)."""
        cfg = self.cfg
        if not cfg.mixed_bundles:
            return None
        if plan.max_rnnz > cfg.effective_ridx_pack:
            return None
        if cfg.effective_ridx_pack > cfg.row_block_capacity:
            return None
        if fast:
            return 0 if (plan.MAXAFF <= 16 and plan.MAXFR == MIXED_FR) \
                else None
        if plan.MAXFR != MIXED_FR:
            return None
        try:
            return 1 + MIXED_BUCKETS.index(plan.MAXAFF)
        except ValueError:
            return None

    @property
    def _half_ridx(self) -> bool:
        return half_ridx(self.cfg.node_capacity, self.cfg.effective_ridx_pack)

    def _dead_mixed_slot(self) -> np.ndarray:
        """A no-op mixed slot payload ([sel=0 | fast@16 plan with m = 0]);
        every padding slot of a ragged bundle points at ONE copy of it."""
        K = self.cfg.new_factor_capacity
        BCAP = self.cfg.row_block_capacity
        RCAP = self.cfg.effective_ridx_pack
        half = self._half_ridx
        seg, L = packed_layout(16, MIXED_FR, K, BCAP,
                               self._device_dtype, RCAP, half)
        row = np.zeros(1 + L, dtype=np.int32)
        sent = self.cfg.node_capacity
        if half:
            sent = np.array([sent, sent], dtype=np.int16).view(np.int32)[0]
        row[1 + seg["ridx"][0]: 1 + seg["ridx"][1]] = sent
        return row

    def _dispatch_mixed(self, entries, npanb: int, flatcap: int = None):
        """Dispatch queued (plan, sel) entries through the ragged
        mixed-bundle executable.  Returns a list of (stats, nrows) chunks —
        normally one; more when the packed payloads overflow the largest
        flat bucket (the caller maps pending rows chunk by chunk)."""
        K = self.cfg.new_factor_capacity
        RCAP = self.cfg.effective_ridx_pack
        half = self._half_ridx
        B = max(1, self.cfg.bundle_size)
        dtype = self._device_dtype
        dead = self._dead_mixed_slot()

        bodies = [(sel, pack_plan(plan, dtype, RCAP, half))
                  for plan, sel in entries]

        # greedy chunking: each chunk's payloads + one dead slot must fit
        # the largest flat bucket
        chunks = []
        cur, cur_words = [], 0
        for sel, body in bodies:
            w = 1 + body.shape[0]
            if cur and cur_words + w + dead.shape[0] > MIXED_FLAT_BUCKETS[-1]:
                chunks.append(cur)
                cur, cur_words = [], 0
            cur.append((sel, body))
            cur_words += w
        chunks.append(cur)   # possibly empty (precompile)

        out = []
        for chunk in chunks:
            offs = np.zeros(B, dtype=np.int32)
            total = sum(1 + b.shape[0] for _s, b in chunk)
            dead_off = total
            total += dead.shape[0]
            FLATCAP = flatcap or mixed_flat_bucket(total)
            flat = np.zeros(FLATCAP, dtype=np.int32)
            p = 0
            for i, (sel, body) in enumerate(chunk):
                offs[i] = p
                flat[p] = sel
                flat[p + 1: p + 1 + body.shape[0]] = body
                p += 1 + body.shape[0]
            flat[dead_off: dead_off + dead.shape[0]] = dead
            offs[len(chunk):] = dead_off
            self.ds, stats = inc_bundle_mixed(
                self.ds, jnp.asarray(flat), jnp.asarray(offs),
                jnp.asarray(len(chunk), dtype=jnp.int32),
                KNEW=K, PANEL=self.cfg.panel_nodes, NPANB=npanb, RCAP=RCAP,
                delta_xy=float(self.cfg.delta_xy),
                delta_theta=float(self.cfg.delta_theta),
                log_chi2=self.cfg.log_chi2,
                coalesce=bool(self.cfg.coalesce_full_solves))
            out.append((stats, len(chunk)))
        return out

    def _dispatch_queue(self):
        """Dispatch the queued plans as one bundled scan (padding dead
        slots); push per-step stats into the pending policy queue.  Also
        flushes the superstep buffer (callers use this as "make device
        state reflect every logical step")."""
        if self._sbuf:
            self._dispatch_superstep()
        if not self._queue:
            return
        sig = self._queue_sig
        k = len(self._queue)
        B = max(1, self.cfg.bundle_size)
        if sig[0] == "mixed":
            chunks = self._dispatch_mixed(self._queue, sig[1])
            base = self.steps_done - k
            step_ms = self._mark_dispatch(k)
            for stats, nrows in chunks:
                for i in range(nrows):
                    self._pending.append(
                        _Pending(base + i, stats, self._batch_serial, row=i,
                                 step_ms=step_ms))
                base += nrows
            self._queue.clear()
            self._queue_sig = None
            return
        if sig[0] == "full":
            B = max(1, min(B, self.cfg.bundle_size_full))
        if k == 1:
            # single-slot bundles use the cheaper single-step jit
            stats = self._dispatch_one(self._queue[0][0], sig)
            self._pending.append(
                _Pending(self.steps_done - 1, stats, self._batch_serial,
                         step_ms=self._mark_dispatch(1)))
            self._queue.clear()
            self._queue_sig = None
            return
        K = self.cfg.new_factor_capacity
        plans = [p for p, _sel in self._queue]

        half = self._legacy_half
        rows = [pack_plan(p, self._device_dtype, None, half) for p in plans]
        if k < B:
            dead = np.zeros_like(rows[0])
            seg, _ = packed_layout(sig[1], sig[2], K,
                                   self.cfg.row_block_capacity,
                                   self._device_dtype, None, half)
            sent = self.cfg.node_capacity
            if half:
                sent = np.array([sent, sent], dtype=np.int16).view(
                    np.int32)[0]
            dead[seg["ridx"][0]:seg["ridx"][1]] = sent
            rows = rows + [dead] * (B - k)
        packed_b = jnp.asarray(np.stack(rows))

        if sig[0] == "fast":
            self.ds, stats = inc_bundle_fast(
                self.ds, packed_b,
                MAXAFF=sig[1], MAXFR=sig[2], KNEW=K,
                delta_xy=float(self.cfg.delta_xy),
                delta_theta=float(self.cfg.delta_theta),
                log_chi2=self.cfg.log_chi2)
        else:
            self.ds, stats = inc_bundle_full(
                self.ds, packed_b, jnp.asarray(k, dtype=jnp.int32),
                MAXAFF=sig[1], MAXFR=sig[2], KNEW=K,
                PANEL=self.cfg.panel_nodes, NPANB=sig[3],
                delta_xy=float(self.cfg.delta_xy),
                delta_theta=float(self.cfg.delta_theta),
                log_chi2=self.cfg.log_chi2,
                coalesce=bool(self.cfg.coalesce_full_solves))

        base = self.steps_done - k
        step_ms = self._mark_dispatch(k)
        for i in range(k):
            # keep the whole bundle stats array; row-slice on the host after
            # the (single, cached) transfer instead of per-row device slices
            self._pending.append(
                _Pending(base + i, stats, self._batch_serial, row=i,
                         step_ms=step_ms))
        self._queue.clear()
        self._queue_sig = None

    def flush(self, g: FactorGraph):
        """Dispatch any queued bundle and consume all pending policy stats
        (end of replay)."""
        self._dispatch_queue()
        if getattr(self, "_sweep_stale", False):
            self.ds = sweep_only(
                self.ds, PANEL=self.cfg.panel_nodes,
                NPANB=self._npanb(g.nnodes),
                delta_xy=float(self.cfg.delta_xy),
                delta_theta=float(self.cfg.delta_theta))
            self._sweep_stale = False
        self._drain_pending(g, block_all=True)

    def default_signatures(self, nnodes: Optional[int] = None):
        """Derive the step-shape signatures from the config and (optionally)
        the expected trajectory length.  EVERY active-panel count the replay
        passes through is included (1, 2, 4, ... then npanb_max itself, which
        need not be a power of two): a growing trajectory crosses each
        doubling exactly once, and a single mid-run compile (10-60 s) costs
        more than the entire optimized replay — the r01->r02 TPU bench was
        dominated by exactly these compiles.  All entries persist in the
        on-disk compilation cache, so warmup is cheap after the first run on
        a machine.  MIXED_FR is the ONLY fringe layout (plan_step demotes
        larger-fringe fast steps to the full path), so this list covers every
        shape a replay can dispatch."""
        fr = MIXED_FR
        npanb_max = self._npanb(nnodes if nnodes
                                else self.cfg.node_capacity)
        npanbs = []
        b = 1
        while b < npanb_max:
            npanbs.append(b)
            b *= 2
        # _npanb clamps to NPAN = node_capacity // panel_nodes, which need
        # not be a power of two: append the terminal steady-state count
        # explicitly so the doubling loop can never miss it
        npanbs.append(npanb_max)
        if self.cfg.superstep_size > 1:
            # superstep mode: one executable per (union bucket, panel
            # count); a bucket is reachable at a panel count only if some
            # m <= npanb*PANEL lands in it (m never exceeds the active
            # node count the panels cover)
            sigs = []
            buckets = self.cfg.effective_superstep_buckets
            for npanb in npanbs:
                lim = npanb * self.cfg.panel_nodes
                for j, b in enumerate(buckets):
                    prev = buckets[j - 1] if j else 0
                    if prev < lim:
                        sigs.append(("sup", b, npanb))
            return tuple(sigs)
        sigs = [("fast", self.cfg.frontal_buckets[0], fr)]
        if self.cfg.mixed_bundles and self.cfg.bundle_size > 1:
            # mixed mode: one ragged executable per active-panel count
            # covers EVERY fast/full bucket (incl. 1024) — no legacy
            # signatures remain reachable
            sigs += [("mixed", npanb) for npanb in npanbs]
            return tuple(sigs)
        for b in self.cfg.frontal_buckets[:3]:
            for npanb in npanbs:
                sigs.append(("full", b, fr, npanb))
        # the biggest bucket is rare (plan overflow headroom): compile only
        # the late-trajectory panel counts it could realistically hit
        big = self.cfg.frontal_buckets[3] if len(self.cfg.frontal_buckets) > 3 else None
        if big is not None:
            sigs.append(("full", big, fr, npanb_max))
            second = npanbs[-2] if len(npanbs) > 1 else None
            if second is not None:
                sigs.append(("full", big, fr, second))
        return tuple(sigs)

    def precompile(self, signatures=None, nnodes: Optional[int] = None) -> int:
        """Compile the step/bundle specializations ahead of time by running
        no-op (dead-slot) plans through each signature.  Dead slots leave all
        solver state untouched (live=False skips the chi2 ring; empty
        affected sets update nothing)."""
        from . import incremental as I

        signatures = signatures or self.default_signatures(nnodes)
        K = self.cfg.new_factor_capacity
        BCAP = self.cfg.row_block_capacity
        NCAP = self.cfg.node_capacity
        B = max(1, self.cfg.bundle_size)
        count = 0
        for sig in signatures:
            if sig[0] == "sup":
                knode, kseed, kfac = _sup_caps(self.cfg)
                MAXAFF, npanb = sig[1], sig[2]
                _, LI = I.ints_layout(MAXAFF, MIXED_FR, kfac, knode, kseed)
                _, LF = I.floats_layout(kfac, knode, kseed)
                plan = StepPlan(
                    m=0, naffected=0, MAXAFF=MAXAFF, MAXFR=MIXED_FR,
                    fringe_overflow=False,
                    ints=np.zeros(LI, dtype=np.int32),
                    floats=np.zeros(LF, dtype=np.float64),
                    ridx=np.full((MAXAFF, BCAP), NCAP, dtype=np.int32),
                    inv=np.full((MAXAFF, MAXAFF), BCAP, dtype=np.int8),
                    scat=np.full((MAXAFF, BCAP), MAXAFF, dtype=np.int16))
                packed = jnp.asarray(pack_plan(
                    plan, self._device_dtype, None, self._legacy_half))
                self.ds, _stats = inc_superstep(
                    self.ds, packed,
                    MAXAFF=MAXAFF, KNEW=kfac, KNODE_S=knode, KSEED_S=kseed,
                    PANEL=self.cfg.panel_nodes, NPANB=npanb,
                    delta_xy=float(self.cfg.delta_xy),
                    delta_theta=float(self.cfg.delta_theta),
                    log_chi2=self.cfg.log_chi2)
                count += 1
                continue
            if sig[0] == "mixed":
                # compile BOTH flat buckets for this panel count (the big
                # one otherwise compiles lazily mid-run on the first
                # oversized bundle)
                for fc in MIXED_FLAT_BUCKETS:
                    self._dispatch_mixed([], sig[1], flatcap=fc)
                self._pending.clear()
                count += 1
                continue
            kind, MAXAFF, MAXFR = sig[0], sig[1], sig[2]
            _, LI = I.ints_layout(MAXAFF, MAXFR, K)
            _, LF = I.floats_layout(K)
            ints = np.zeros(LI, dtype=np.int32)
            flts = np.zeros(LF, dtype=np.float64)
            ridx = np.full((MAXAFF, BCAP), NCAP, dtype=np.int32)
            plan = StepPlan(m=0, naffected=0, MAXAFF=MAXAFF, MAXFR=MAXFR,
                            fringe_overflow=False, ints=ints, floats=flts,
                            ridx=ridx)
            # compile the single-step jit AND (when bundling) the bundle jit
            self._dispatch_one(plan, sig)
            if B > 1:
                self._queue_sig = sig
                self._queue = [(plan, None)] * 2
                self._dispatch_queue()
            self._pending.clear()  # dead stats carry nothing
            count += 1
        # overflow-path ingest kernel (one fixed shape; no-op payload)
        words = 2 if self._device_dtype == np.float64 else 1
        if self.cfg.superstep_size > 1:
            knode, kseed, kfac = _sup_caps(self.cfg)
            _, LI = I.ints_layout(0, 0, kfac, knode, kseed)
            _, LF = I.floats_layout(kfac, knode, kseed)
            self.ds = inc_ingest_tail(
                self.ds, jnp.zeros(LI + LF * words, dtype=jnp.int32),
                KNEW=kfac, knode=knode, kseed=kseed)
        else:
            _, LI = I.ints_layout(0, 0, K)
            _, LF = I.floats_layout(K)
            self.ds = inc_ingest_tail(
                self.ds, jnp.zeros(LI + LF * words, dtype=jnp.int32), KNEW=K)
        count += 1
        jax.block_until_ready(self.ds.state)
        self._last_dispatch_t = None  # precompile must not skew the gate clock
        return count

    # ---------------------------------------------------------------

    def chi2(self) -> float:
        self._dispatch_queue()
        return float(state_chi2(self.ds))

    def chi2_history(self) -> np.ndarray:
        """Per-optimize chi2 values from the device-side metric ring."""
        self._dispatch_queue()
        n = int(self.ds.log_ptr)
        LOG = self.ds.chi2_log.shape[0]
        if n > LOG:
            raise RuntimeError(
                f"chi2 metric ring overflowed ({n} entries, capacity {LOG}); "
                "writes past capacity were dropped — raise "
                "SolverConfig.metric_log_capacity for this replay length")
        return np.asarray(jax.device_get(self.ds.chi2_log))[:n]

    def describe_tree(self, max_nodes: int = 50) -> str:
        """Human-readable elimination-tree dump (search_tree_print parity,
        aprilsam.c:677-690): per node its position, parent, children."""
        if self.sym is None:
            return "<no tree: run solve() first>"
        sym = self.sym
        if getattr(sym, "patterns_stale", False):
            # native planner maintains parents + pads only
            sym.rebuild_children()
        patterns = sym_patterns_list(sym)
        lines = [f"root position: {sym.nnodes - 1} "
                 f"(node {int(sym.order[sym.nnodes - 1])}), "
                 f"nnodes: {sym.nnodes}"]
        for p in range(min(sym.nnodes, max_nodes)):
            kids = ",".join(str(c) for c in sym.children[p])
            lines.append(
                f" pos {p} (node {int(sym.order[p])}): "
                f"parent={int(sym.parents[p])} children=[{kids}] "
                f"nnz={len(patterns[p])}")
        if sym.nnodes > max_nodes:
            lines.append(f" ... ({sym.nnodes - max_nodes} more)")
        return "\n".join(lines)

    def sync_states(self, g: FactorGraph) -> None:
        self._dispatch_queue()
        st, lp, dx = jax.device_get(
            (self.ds.state, self.ds.l_point, self.ds.delta_X))
        g.state[: g.nnodes] = st[: g.nnodes].astype(np.float64)
        g.l_point[: g.nnodes] = lp[: g.nnodes].astype(np.float64)
        g.delta_X[: g.nnodes] = dx[: g.nnodes].astype(np.float64)
