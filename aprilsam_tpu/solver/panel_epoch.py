"""Scatter-free batch epoch: left-looking panel Cholesky on the R pattern.

The dense bucketed epoch (batch.py:_batch_step) spends ~300 ms at M3500
scale, ~75% of it in TPU scatters (normal-equation assembly 221 ms, factor
extract/scatter 81 ms measured chained on a v5e; scatters serialize per
index row at ~2.5-4.5 us).  This module re-derives the epoch as pure
gathers + MXU matmuls on the block-sparse R pattern itself (reference:
the CSparse up-looking factorization, csparse.c:462-513, recast as a
left-looking panel method — the multifrontal TPU mapping SURVEY §7
prescribes):

  host:   ordering + symbolic patterns + etree (native C, ~10 ms), then
          panel metadata: per 128-position panel the contributing rows
          (pattern hits the panel) and the union of tail columns, plus a
          sorted contribution->A-slot segment table.
  device: ONE jit: batched factor eval -> contribution blocks; A assembled
          COMPACT in pattern order by gathering each destination's
          (contiguous after the host sort) contributions; lax.scan over
          panels: dense S_PP = A_PP - W^T W via one-hot/equality einsums
          over the contributors' resident rows (gathers + MXU, no scatter),
          dense chol + triangular solves, rows written back with
          dynamic_update_slice; forward solve y rides the same scan;
          back-substitution reuses the panel-sweep machinery.

A values never exist in dense [3n, 3n] form, so the epoch scales to the
100k-pose workload (the dense path is O(MB^2) memory / O(MB^3) flops).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .config import SolverConfig
from .state import DeviceState, state_chi2
from .symbolic import SymbolicState


def _bucket_pow2(v: int, lo: int) -> int:
    b = lo
    while b < v:
        b *= 2
    return b


def panel_caps(npanb: int, panel: int,
               grade: int = 0) -> Tuple[int, int, int, int, int]:
    """Static capacities derived from the active panel count (one compile
    per npanb doubling) plus an escalation grade.  Grade 0 is sized tight
    to measured M3500 plans (mc max 879, nu max 474, contribution
    multiplicity max 9) — the strip/Gram/writeback work per panel scales
    with nu and the assembly gather with mult, so tight caps are a direct
    ~30% epoch saving.  A plan that overflows grade 0 retries at grade 1
    (the former roomy caps) before falling back to the host/dense epoch;
    the escalated executables compile lazily on first use."""
    mc = 64 * npanb if npanb <= 16 else (1024 if npanb <= 64 else 2048)
    if grade == 0:
        nu = 32 * npanb if npanb <= 16 else (512 if npanb <= 64 else 1024)
        mult = 16
    else:
        nu = 48 * npanb if npanb <= 16 else (768 if npanb <= 64 else 1536)
        mult = 32
    kexta = 8 * panel * npanb
    nfac3 = 8 * panel * npanb
    return mc, nu, mult, kexta, nfac3


def seg_ladder(mc_cap: int, nu_cap: int) -> Tuple[Tuple[int, int], ...]:
    """Contributor-count grade ladder inside one epoch.  The measured M3500
    plan has mc mean ~220 / max 879 against a 1024 cap (4x padded waste in
    the strip + Gram stages, which scale with MC*TT) and the per-panel mc
    is near-monotone in panel position, so the panel sequence splits into
    contiguous runs each factored at the smallest (MC, NU) grade that fits
    (grades are monotonized so runs stay in elimination order; one
    dynamic-bound fori_loop per grade inside the SAME executable)."""
    grades = []
    for mc, nu in ((64, 256), (256, 512)):
        if mc < mc_cap:
            grades.append((mc, min(nu, nu_cap)))
    grades.append((mc_cap, nu_cap))
    return tuple(grades)


class PanelEpochPlan(NamedTuple):
    """Host-built metadata for one panel epoch (all numpy)."""

    npanb: int          # active panel count (static)
    mc_cap: int         # contributors per panel (static bucket)
    nu_cap: int         # union tail columns per panel (static bucket)
    mult: int           # max contributions per A block / B row (static)
    kexta: int          # compact A block capacity (static bucket)
    nfac3: int          # contribution triple capacity (static bucket)
    crows: tuple        # per seg_ladder grade: [npanb, MC_g] contributing
                        # row positions (pad NCAP-1); only rows in the
                        # grade's gbounds range are live
    ucolss: tuple       # per grade: [npanb, NU_g] union tail cols (pad NCAP)
    gbounds: np.ndarray  # [G+1] panel range of each grade (monotone)
    perm: np.ndarray    # [nfac3] contribution index sorted by dest (pad -> zero)
    astart: np.ndarray  # [kexta] first perm slot of each A block
    acount: np.ndarray  # [kexta] contribution count of each A block
    bperm: np.ndarray   # [nfac3] B contribution index sorted by dest row
    bstart: np.ndarray  # [NCAP] first bperm slot per row
    bcount: np.ndarray  # [NCAP] B contribution count per row
    row_ptr: np.ndarray  # [NCAP] compact offset of each row's pattern
    R_idx: np.ndarray   # [NCAP, BCAP] new pattern (pad NCAP)
    R_nnz: np.ndarray   # [NCAP]
    pos: np.ndarray     # [NCAP]
    order: np.ndarray   # [NCAP]
    panel: int = 128    # cfg.panel_nodes (wire-compression row bucket)
    bpack: int = 0      # pattern columns actually shipped (64 unless a row
                        # overflows; 0 = legacy full-BCAP, set by builder)
    pmax16: bool = False  # perm/bperm/astart/bstart/row_ptr fit int16


def build_panel_plan(
    cfg: SolverConfig,
    nnodes: int,
    sym: SymbolicState,
    pad_idx: np.ndarray,
    pad_nnz: np.ndarray,
    ftypes: np.ndarray,
    fnodes: np.ndarray,
    grade: int = 0,
) -> PanelEpochPlan:
    """Panel metadata from the symbolic pattern + factor table (vectorized
    numpy; ~a few ms at M3500 scale)."""
    from ..graph import FACTOR_XYT

    NCAP = cfg.node_capacity
    BCAP = cfg.row_block_capacity
    PANEL = cfg.panel_nodes
    pos = np.arange(NCAP, dtype=np.int32)
    pos[: nnodes] = sym.pos
    order = np.arange(NCAP, dtype=np.int32)
    order[: nnodes] = sym.order

    npanb = max(1, -(-nnodes // PANEL))
    # one executable per power-of-two active panel count
    b = 1
    npan_max = NCAP // PANEL
    while b < npanb and b < npan_max:
        b *= 2
    npanb = min(b, npan_max)

    nnz = pad_nnz[:nnodes]
    row_ptr = np.zeros(NCAP, dtype=np.int32)
    row_ptr[1:nnodes] = np.cumsum(nnz[:-1], dtype=np.int64)[: nnodes - 1]
    kexta_live = int(nnz.sum())

    # ---- per-panel contributors + union tails ------------------------
    rows_i, slots_i = np.nonzero(
        np.arange(BCAP, dtype=np.int32)[None, :] < nnz[:, None])
    cols_i = pad_idx[rows_i, slots_i]                     # all pattern cols
    pan_of_col = cols_i // PANEL
    pan_of_row = rows_i // PANEL
    off_pan = pan_of_col > pan_of_row                     # strictly later
    # contributors: (target panel, row) pairs deduped via one sorted-key
    # unique; ragged-to-padded by segment offset arithmetic (the former
    # per-panel python loops cost ~15 ms per epoch at M3500 scale)
    pkey = pan_of_col[off_pan].astype(np.int64) * NCAP + rows_i[off_pan]
    pkey = np.unique(pkey)
    ppan = (pkey // NCAP).astype(np.int64)
    prow_c = (pkey % NCAP).astype(np.int32)
    mc = np.bincount(ppan, minlength=npanb).astype(np.int64)
    if len(mc) > npanb:
        return None
    pstart = np.concatenate([[0], np.cumsum(mc)])
    # union tails: columns beyond the row's own panel end, grouped by the
    # ROW's panel (these are the tail columns panel `pan_of_row` must fill)
    ukey = np.unique(
        pan_of_row[off_pan].astype(np.int64) * (NCAP + 1) + cols_i[off_pan])
    upan = (ukey // (NCAP + 1)).astype(np.int64)
    ucol_v = (ukey % (NCAP + 1)).astype(np.int32)
    nu = np.bincount(upan, minlength=npanb).astype(np.int64)
    if len(nu) > npanb:
        return None
    ustart = np.concatenate([[0], np.cumsum(nu)])

    mc_cap, nu_cap, mult_cap, kexta, nfac3 = panel_caps(npanb, PANEL, grade)
    if int(mc.max(initial=0)) > mc_cap or int(nu.max(initial=0)) > nu_cap \
            or kexta_live > kexta:
        return None

    # per-panel minimal grade, monotonized into contiguous in-order runs
    ladder = seg_ladder(mc_cap, nu_cap)
    G = len(ladder)
    n_act = -(-nnodes // PANEL)
    mcs = np.asarray([g[0] for g in ladder], dtype=np.int64)
    nus = np.asarray([g[1] for g in ladder], dtype=np.int64)
    fit = (mc[:, None] <= mcs[None, :]) & (nu[:, None] <= nus[None, :])
    g_min = fit.argmax(axis=1)          # top grade always fits (cap check)
    gm_full = np.full(npanb, G - 1, dtype=np.int64)
    if n_act:
        gm_full[:n_act] = np.maximum.accumulate(g_min[:n_act])
    gbounds = np.asarray([(gm_full[:n_act] < g).sum() for g in range(G + 1)],
                         dtype=np.int32)

    slot_p = np.arange(len(prow_c), dtype=np.int64) - pstart[ppan]
    slot_u = np.arange(len(ucol_v), dtype=np.int64) - ustart[upan]
    crows, ucolss = [], []
    for g, (MCg, NUg) in enumerate(ladder):
        cg = np.full((npanb, MCg), NCAP - 1, dtype=np.int32)
        sel = gm_full[ppan] == g
        cg[ppan[sel], slot_p[sel]] = prow_c[sel]
        ug = np.full((npanb, NUg), NCAP, dtype=np.int32)
        selu = gm_full[upan] == g
        ug[upan[selu], slot_u[selu]] = ucol_v[selu]
        crows.append(cg)
        ucolss.append(ug)

    # ---- contribution -> compact-A segment tables --------------------
    # Contribution SOURCE indices address the device-side concatenation
    #   blocks = [Haa(FCAP) | Hbb(FCAP) | Hoff(FCAP) | Wprior(FPOS) | zero]
    #   bvecs  = [ga(FCAP)  | gb(FCAP)  | gprior(FPOS) | zero]
    # where each factor's index within its type table is its ingestion
    # order (the device tables append per type in graph order).
    FCAP = cfg.factor_capacity
    FPOS = max(256, cfg.factor_capacity // 8)
    is_xyt = ftypes == FACTOR_XYT
    ix = np.cumsum(is_xyt) - 1                   # xyt-table index
    ip = np.cumsum(~is_xyt) - 1                  # pos-table index
    fa = fnodes[:, 0].astype(np.int64)
    fb = np.clip(fnodes[:, 1], 0, None).astype(np.int64)
    pa = pos[fa].astype(np.int64)
    pb = pos[fb].astype(np.int64)
    pmin = np.minimum(pa, pb)
    pmax = np.maximum(pa, pb)

    def slot_of(prow, pcol):
        # pattern rows are sorted ascending: slot = #cols < pcol
        pat = pad_idx[prow]                                # [k, BCAP]
        return (pat < pcol[:, None]).sum(axis=1).astype(np.int64)

    d_aa = row_ptr[pa] + 0
    d_bb = row_ptr[pb] + 0
    d_off = row_ptr[pmin] + slot_of(pmin, pmax)
    d_pp = row_ptr[pa] + 0
    dest = np.concatenate([
        np.where(is_xyt, d_aa, -1),
        np.where(is_xyt, d_bb, -1),
        np.where(is_xyt, d_off, -1),
        np.where(~is_xyt, d_pp, -1),
    ])
    src = np.concatenate([
        ix, FCAP + ix, 2 * FCAP + ix, 3 * FCAP + ip,
    ]).astype(np.int64)
    valid = dest >= 0
    if int(valid.sum()) > nfac3:
        return None
    vi = np.nonzero(valid)[0]
    sort = np.argsort(dest[vi], kind="stable")
    sorted_src = src[vi][sort].astype(np.int32)
    sorted_dest = dest[vi][sort]
    perm = np.full(nfac3, 3 * FCAP + FPOS, dtype=np.int32)  # pad -> zero
    perm[: len(sorted_src)] = sorted_src
    astart = np.zeros(kexta, dtype=np.int32)
    acount = np.zeros(kexta, dtype=np.int32)
    uq, first, counts = np.unique(sorted_dest, return_index=True,
                                  return_counts=True)
    astart[uq] = first
    acount[uq] = counts

    # B contributions: [ga @ pa] [gb @ pb] [gprior @ pa]
    bdest = np.concatenate([
        np.where(is_xyt, pa, -1),
        np.where(is_xyt, pb, -1),
        np.where(~is_xyt, pa, -1),
    ])
    bsrc = np.concatenate([ix, FCAP + ix, 2 * FCAP + ip]).astype(np.int64)
    bi = np.nonzero(bdest >= 0)[0]
    bsort = np.argsort(bdest[bi], kind="stable")
    bsorted = bsrc[bi][bsort].astype(np.int32)
    bperm = np.full(nfac3, 2 * FCAP + FPOS, dtype=np.int32)
    bperm[: len(bsorted)] = bsorted
    bstart = np.zeros(NCAP, dtype=np.int32)
    bcount = np.zeros(NCAP, dtype=np.int32)
    uqb, firstb, countsb = np.unique(bdest[bi][bsort], return_index=True,
                                     return_counts=True)
    bstart[uqb] = firstb
    bcount[uqb] = countsb

    mult = mult_cap
    if max(int(counts.max(initial=1)), int(countsb.max(initial=1))) > mult:
        return None

    R_idx = np.full((NCAP, BCAP), NCAP, dtype=np.int32)
    vmask = np.arange(BCAP, dtype=np.int32)[None, :] < nnz[:, None]
    R_idx[:nnodes][vmask] = pad_idx[:nnodes][vmask]
    R_nnz = np.zeros(NCAP, dtype=np.int32)
    R_nnz[:nnodes] = nnz

    # wire compression: ship the pattern at 64 columns when every row fits
    # (fresh symbolic nnz maxes ~48 on SLAM graphs; overflow escalates to
    # the full-BCAP executable), and route the segment tables through the
    # 16-bit section when their values fit int16 (always legal when the
    # 16-bit section is itself stored as int32, i.e. NCAP too big to halve)
    max_nnz = int(nnz.max(initial=0))
    bpack = BCAP if (max_nnz > 64 or BCAP <= 64) else 64
    # values in the segment tables: perm/bperm < 3*FCAP+FPOS+1, astart /
    # bstart < nfac3, row_ptr < kexta — all must fit int16 to ride the
    # 16-bit section when it is actually halved
    pmax16 = (not _half(NCAP)) or (
        (3 * FCAP + FPOS + 1) <= 32768 and nfac3 <= 32768
        and kexta <= 32768)

    return PanelEpochPlan(
        npanb=npanb, mc_cap=mc_cap, nu_cap=nu_cap, mult=mult,
        kexta=kexta, nfac3=nfac3,
        crows=tuple(crows), ucolss=tuple(ucolss), gbounds=gbounds,
        perm=perm, astart=astart, acount=acount,
        bperm=bperm, bstart=bstart, bcount=bcount,
        row_ptr=row_ptr, R_idx=R_idx, R_nnz=R_nnz,
        pos=pos, order=order,
        panel=PANEL, bpack=bpack, pmax16=pmax16,
    )


# ======================================================================
# packing (two merged h2d buffers: int16-packable metadata + int32 tables)
# ======================================================================

def _half(NCAP: int) -> bool:
    from .batch import symb_half

    return symb_half(NCAP)


def pep_layout(NCAP: int, BCAP: int, plan_dims):
    """(segment offsets, lengths) of the packed wire buffer.  plan_dims =
    (npanb, mc, nu, mult, kexta, nfac3, panel, bpack, pmax16).  The buffer
    is ONE int32 array: [32-bit section | 16-bit section] (relay h2d runs
    ~60 MB/s with ~2.5 ms per-transfer latency, so one merged, compressed
    transfer is a direct epoch saving).  Row-indexed tables ship only the
    NB = npanb*panel active rows; the device re-pads to NCAP."""
    npanb, mc, nu, mult, kexta, nfac3, panel, bpack, pmax16 = plan_dims
    ladder = seg_ladder(mc, nu)
    NB = min(NCAP, npanb * panel)
    w = 2 if _half(NCAP) else 1
    s16 = []
    for g, (MCg, NUg) in enumerate(ladder):
        s16.append((f"crow{g}", npanb * MCg))
        s16.append((f"ucols{g}", npanb * NUg))
    s16 += [("R_idx", NB * bpack), ("R_nnz", NB),
            ("pos", NB), ("order", NB),
            ("acount", kexta), ("bcount", NB)]
    segtabs = (("perm", nfac3), ("bperm", nfac3),
               ("astart", kexta), ("bstart", NB), ("row_ptr", NB))
    if pmax16:
        s16 += list(segtabs)
    off16 = {}
    o = 0
    for name, n in s16:
        off16[name] = (o, o + -(-n // w), n)
        o += -(-n // w)
    s32 = [] if pmax16 else list(segtabs)
    s32 += [("gbounds", len(ladder) + 1), ("scalars", 2)]
    off32 = {}
    o2 = 0
    for name, n in s32:
        off32[name] = (o2, o2 + n, n)
        o2 += n
    return off16, o, off32, o2


def plan_dims_of(plan: PanelEpochPlan):
    return (plan.npanb, plan.mc_cap, plan.nu_cap, plan.mult,
            plan.kexta, plan.nfac3, plan.panel, plan.bpack, plan.pmax16)


def pack_pep(plan: PanelEpochPlan, NCAP: int, BCAP: int, log_mode: int):
    """Pack one merged int32 wire buffer: [32-bit section | 16-bit
    section].  Row-indexed tables are clipped to the NB active rows and
    the pattern to bpack columns (the device re-pads)."""
    off16, L16, off32, L32 = pep_layout(NCAP, BCAP, plan_dims_of(plan))
    half = _half(NCAP)
    NB = min(NCAP, plan.npanb * plan.panel)
    bb = np.empty(L32 + L16, dtype=np.int32)
    b32 = bb[:L32]
    b16 = bb[L32:]

    def put16(name, arr):
        lo, hi, n = off16[name]
        a = np.ascontiguousarray(arr, dtype=np.int32).reshape(-1)
        if half:
            a16 = a.astype(np.int16)
            if n % 2:
                a16 = np.concatenate([a16, np.zeros(1, np.int16)])
            a = a16.view(np.int32)
        b16[lo:hi] = a

    def put32(name, arr):
        lo, hi, _n = off32[name]
        b32[lo:hi] = np.ascontiguousarray(arr, dtype=np.int32).reshape(-1)

    put_seg = put16 if plan.pmax16 else put32
    for g in range(len(plan.crows)):
        put16(f"crow{g}", plan.crows[g])
        put16(f"ucols{g}", plan.ucolss[g])
    put16("R_idx", plan.R_idx[:NB, :plan.bpack])
    put16("R_nnz", plan.R_nnz[:NB])
    put16("pos", plan.pos[:NB])
    put16("order", plan.order[:NB])
    put16("acount", plan.acount)
    put16("bcount", plan.bcount[:NB])
    put_seg("perm", plan.perm)
    put_seg("bperm", plan.bperm)
    put_seg("astart", plan.astart)
    put_seg("bstart", plan.bstart[:NB])
    put_seg("row_ptr", plan.row_ptr[:NB])
    put32("gbounds", plan.gbounds)
    put32("scalars", np.asarray([log_mode, 0], dtype=np.int32))
    return bb


# ======================================================================
# device kernel
# ======================================================================

@partial(jax.jit,
         static_argnames=("NPANB", "MC", "NU", "MULT", "KEXTA", "NFAC3",
                          "PANEL", "BPACK", "PMAX16"),
         donate_argnames=("ds",))
def panel_epoch_step(
    ds: DeviceState,
    bb, tikhonov,
    NPANB: int, MC: int, NU: int, MULT: int, KEXTA: int, NFAC3: int,
    PANEL: int, BPACK: int = 0, PMAX16: bool = False,
):
    from ..factors import eval_xyt, eval_xytpos, gn_blocks_xyt
    from ..geometry import mod2pi
    from ..kernels.sweep import panel_backsub

    NCAP = ds.state.shape[0]
    BCAP = ds.R_idx.shape[1]
    FCAP = ds.xyt_a.shape[0]
    FPOS = ds.pos_node.shape[0]
    dtype = ds.R_blocks.dtype
    if BPACK == 0:
        BPACK = BCAP
    dims = (NPANB, MC, NU, MULT, KEXTA, NFAC3, PANEL, BPACK, PMAX16)
    off16, _L16, off32, L32 = pep_layout(NCAP, BCAP, dims)
    half = _half(NCAP)
    NB = min(NCAP, NPANB * PANEL)

    def dec16(name, shape=None):
        lo, hi, n = off16[name]
        seg = bb[L32 + lo:L32 + hi]
        if half:
            seg = jax.lax.bitcast_convert_type(seg, jnp.int16).astype(
                jnp.int32).reshape(-1)[:n]
        return seg if shape is None else seg.reshape(shape)

    def dec32(name, shape=None):
        lo, hi, _n = off32[name]
        seg = bb[lo:hi]
        return seg if shape is None else seg.reshape(shape)

    dec_seg = dec16 if PMAX16 else dec32

    ladder = seg_ladder(MC, NU)
    crows = [dec16(f"crow{g}", (NPANB, MCg))
             for g, (MCg, _NUg) in enumerate(ladder)]
    ucolss = [dec16(f"ucols{g}", (NPANB, NUg))
              for g, (_MCg, NUg) in enumerate(ladder)]
    # row tables ship NB rows / BPACK pattern columns; re-pad on device
    arange_tail = jnp.arange(NB, NCAP, dtype=jnp.int32)
    R_idx_new = jnp.pad(dec16("R_idx", (NB, BPACK)),
                        ((0, NCAP - NB), (0, BCAP - BPACK)),
                        constant_values=NCAP)
    R_nnz_new = jnp.pad(dec16("R_nnz"), (0, NCAP - NB))
    pos_new = jnp.concatenate([dec16("pos"), arange_tail])
    order_new = jnp.concatenate([dec16("order"), arange_tail])
    acount = dec16("acount")
    bcount = jnp.pad(dec16("bcount"), (0, NCAP - NB))
    perm = dec_seg("perm")
    bperm = dec_seg("bperm")
    astart = dec_seg("astart")
    bstart = jnp.pad(dec_seg("bstart"), (0, NCAP - NB))
    row_ptr = jnp.pad(dec_seg("row_ptr"), (0, NCAP - NB))
    gbounds = dec32("gbounds")
    log_mode = dec32("scalars")[0]

    n = ds.nnodes

    # ---- relinearize all + batched factor eval (aprilsam.c:131-195) ----
    l_point = ds.state
    xyt_valid = jnp.arange(FCAP, dtype=jnp.int32) < ds.n_xyt
    pos_valid = jnp.arange(FPOS, dtype=jnp.int32) < ds.n_pos
    xa = jnp.where(xyt_valid, ds.xyt_a, 0)
    xb = jnp.where(xyt_valid, ds.xyt_b, 0)
    ev = eval_xyt(l_point, xa, xb, ds.xyt_z, ds.xyt_W)
    Haa, Hab, Hba, Hbb, ga, gb = gn_blocks_xyt(ev, ds.xyt_W)
    pn = jnp.where(pos_valid, ds.pos_node, 0)
    evp = eval_xytpos(ds.state, pn, ds.pos_z, ds.pos_W)
    gp = jnp.einsum("fij,fj->fi", ds.pos_W, evp.r)

    pa = pos_new[xa]
    pb = pos_new[xb]
    Hoff = jnp.where((pa < pb)[:, None, None], Hab, Hba)
    blocks = jnp.concatenate(
        [Haa, Hbb, Hoff, ds.pos_W,
         jnp.zeros((1, 3, 3), dtype=dtype)], axis=0)
    bvecs = jnp.concatenate(
        [ga, gb, gp, jnp.zeros((1, 3), dtype=dtype)], axis=0)

    # ---- gather-only assembly: compact A on the pattern + dense B ------
    Hs = blocks[jnp.clip(perm, 0, 3 * FCAP + FPOS)]        # [NFAC3, 3, 3]
    tab = astart[:, None] + jnp.arange(MULT, dtype=jnp.int32)[None, :]
    tmask = jnp.arange(MULT, dtype=jnp.int32)[None, :] < acount[:, None]
    G = Hs[jnp.clip(tab, 0, NFAC3 - 1)] * tmask[..., None, None]
    A_comp = G.sum(axis=1)                                 # [KEXTA, 3, 3]

    Bs = bvecs[jnp.clip(bperm, 0, 2 * FCAP + FPOS)]
    btab = bstart[:, None] + jnp.arange(MULT, dtype=jnp.int32)[None, :]
    bmask = jnp.arange(MULT, dtype=jnp.int32)[None, :] < bcount[:, None]
    Bq = Bs[jnp.clip(btab, 0, NFAC3 - 1)] * bmask[..., None]
    B_full = Bq.sum(axis=1)                                # [NCAP, 3]

    # ---- left-looking panel factorization + forward solve --------------
    # The whole factorization runs in Jacobi-equilibrated space (the same
    # D^-1/2 A D^-1/2 scaling the dense epoch uses for float32 robustness):
    # R~ = R D^-1/2 is carried through the scan (pure COLUMN scaling, so
    # contributor strips need no rescale) and the true R is recovered once
    # at the end; y~ equals the true y (R~^T y~ = D^-1/2 B <=> R^T y = B).
    P3 = 3 * PANEL
    tik = jnp.asarray(tikhonov, dtype=dtype)
    diag_blocks = A_comp[jnp.clip(row_ptr, 0, KEXTA - 1)]   # [NCAP, 3, 3]
    dscal = jnp.einsum("pii->pi", diag_blocks) + tik        # diag(A)+tik
    prow_act = jnp.arange(NCAP, dtype=jnp.int32) < n
    dvec_full = jnp.where(
        prow_act[:, None],
        jax.lax.rsqrt(jnp.maximum(dscal, 1e-30)), 1.0)      # [NCAP, 3]

    # Strip builds use the "flat9" form throughout: blocks flattened to
    # 9-vectors, one batched matmul against the target one-hot, and the
    # Gram contracted over the LEADING (row, i) axis of the [(3M), 3, T]
    # reshape.  The naive per-axis einsums ("mbij,mbp->mpij" + transpose +
    # [3M, P3]-major dots) lower to dilated convolutions whose outputs
    # need a physical relayout before the MXU Gram — measured 4.2 ms per
    # panel on the v5e vs 0.18 ms for this arrangement (23x).
    # One-hot contractions (strip builds, A relayout, writeback) run at
    # precision HIGH: the bf16x3 splitting of the float32 data side is
    # summed against exact 0/1 one-hots, so the result matches HIGHEST to
    # ~2^-22 relative at half the MXU passes.  Data x data Grams stay at
    # the global HIGHEST default.
    ONEHOT_PREC = jax.lax.Precision.HIGH
    import os as _os
    GRAM_PREC = (jax.lax.Precision.HIGH
                 if _os.environ.get("ASN_GRAM_HIGH") else None)

    # A-side hoist: the panel-diagonal assembly (Sd) and rhs (bP) depend
    # only on kernel inputs — never on the factorization carry — so they
    # batch over ALL panels outside the serial loops, shortening the
    # per-panel dependency chain (the epoch is latency-bound on that
    # chain, ~1.5-2 ms/panel).  Gated off for huge epochs: the batched
    # panel-local one-hot is [NPANB, PANEL, BCAP, PANEL] (~200 MB at
    # NPANB=32), so larger panel counts keep the in-body path.
    HOIST = NPANB <= 32
    if HOIST:
        idx_all = R_idx_new[:NB].reshape(NPANB, PANEL, BCAP)
        nnz_all = R_nnz_new[:NB].reshape(NPANB, PANEL)
        rptr_all = row_ptr[:NB].reshape(NPANB, PANEL)
        slotv_all = (jnp.arange(BCAP, dtype=jnp.int32)[None, None, :]
                     < nnz_all[..., None])
        a_rows_all = A_comp[jnp.clip(
            rptr_all[..., None] + jnp.arange(BCAP, dtype=jnp.int32), 0,
            KEXTA - 1)] * slotv_all[..., None, None]
        dvP_all = dvec_full[:NB].reshape(NPANB, PANEL, 3)
        dcol_a = dvec_full[jnp.clip(idx_all, 0, NCAP - 1)]
        a_rows_all = (a_rows_all * dvP_all[:, :, None, :, None]
                      * dcol_a[..., None, :])
        loc = idx_all - (jnp.arange(NPANB, dtype=jnp.int32)
                         * PANEL)[:, None, None]
        in_pan = (loc >= 0) & (loc < PANEL) & slotv_all
        ohd = (jax.nn.one_hot(jnp.clip(loc, 0, PANEL - 1), PANEL,
                              dtype=dtype)
               * in_pan[..., None].astype(dtype))
        A9d = jax.lax.dot_general(
            a_rows_all.reshape(NPANB, PANEL, BCAP, 9), ohd,
            (((2,), (2,)), ((0, 1), (0, 1))),
            precision=ONEHOT_PREC)                 # [NPANB, P, 9, PANEL]
        Xd = A9d.reshape(NPANB, PANEL, 3, 3, PANEL).transpose(
            0, 1, 2, 4, 3).reshape(NPANB, 3 * PANEL, 3 * PANEL)
        Sd_all = jnp.triu(Xd) + jnp.swapaxes(jnp.triu(Xd, 1), -1, -2)
        act_all = jnp.repeat(
            (jnp.arange(NB, dtype=jnp.int32) < n).reshape(NPANB, PANEL),
            3, axis=1)
        tik_d = jnp.asarray(tikhonov, dtype=dtype)
        wdiag = jnp.where(
            act_all, tik_d * (dvP_all.reshape(NPANB, 3 * PANEL) ** 2),
            jnp.asarray(1.0, dtype))
        Sd_all = (Sd_all
                  + jnp.eye(3 * PANEL, dtype=dtype)[None] * wdiag[:, None, :])
        bP_all = (B_full[:NB].reshape(NPANB, PANEL, 3)
                  * dvP_all).reshape(NPANB, 3 * PANEL)

    def make_body(MCg: int, NUg: int, crow_g, ucols_g):
      TT = PANEL + NUg
      MC = MCg

      def body(k, carry):
        Rb, y, spd = carry
        crow_k = jax.lax.dynamic_slice(
            crow_g, (k, jnp.int32(0)), (1, MCg)).reshape(MCg)
        ucols_k = jax.lax.dynamic_slice(
            ucols_g, (k, jnp.int32(0)), (1, NUg)).reshape(NUg)
        p0 = k * jnp.int32(PANEL)
        z0 = jnp.int32(0)
        prow = p0 + jnp.arange(PANEL, dtype=jnp.int32)
        idx_pan = jax.lax.dynamic_slice(R_idx_new, (p0, z0), (PANEL, BCAP))
        nnz_pan = jax.lax.dynamic_slice(R_nnz_new, (p0,), (PANEL,))
        rptr_pan = jax.lax.dynamic_slice(row_ptr, (p0,), (PANEL,))
        slotv = jnp.arange(BCAP, dtype=jnp.int32)[None, :] < nnz_pan[:, None]
        # combined target columns: the panel's own block columns followed by
        # its union tail (ucols pad = NCAP matches only pattern padding,
        # whose R/A values are zero by construction)
        tcols = jnp.concatenate(
            [p0 + jnp.arange(PANEL, dtype=jnp.int32), ucols_k])

        oh_a = ((idx_pan[:, :, None] == tcols[None, None, :])
                & slotv[..., None]).astype(dtype)          # [P, BCAP, T]
        active = jnp.repeat(prow < n, 3)
        if HOIST:
            # Sd/bP precomputed batched outside the loop; the body only
            # builds the union-tail columns of A
            a_rows = jax.lax.dynamic_slice(
                a_rows_all, (k, z0, z0, z0, z0),
                (1, PANEL, BCAP, 3, 3)).reshape(PANEL, BCAP, 3, 3)
            Sd = jax.lax.dynamic_slice(
                Sd_all, (k, z0, z0), (1, P3, P3)).reshape(P3, P3)
            bP = jax.lax.dynamic_slice(
                bP_all, (k, z0), (1, P3)).reshape(P3)
            A9u = jax.lax.dot_general(
                a_rows.reshape(PANEL, BCAP, 9), oh_a[:, :, PANEL:],
                (((1,), (1,)), ((0,), (0,))),
                precision=ONEHOT_PREC)                     # [P, 9, NU]
            Au = A9u.reshape(PANEL, 3, 3, NUg).transpose(
                0, 1, 3, 2).reshape(P3, 3 * NUg)
        else:
            a_rows = A_comp[jnp.clip(
                rptr_pan[:, None] + jnp.arange(BCAP, dtype=jnp.int32), 0,
                KEXTA - 1)] * slotv[..., None, None]       # [P, BCAP, 3, 3]
            # equilibrate A rows in place: row i scaled by dvec[panel row,
            # i], col j by dvec[column block, j]
            dvP = jax.lax.dynamic_slice(dvec_full, (p0, z0), (PANEL, 3))
            dcol = dvec_full[jnp.clip(idx_pan, 0, NCAP - 1)]
            a_rows = a_rows * dvP[:, None, :, None] * dcol[:, :, None, :]
            A9 = jax.lax.dot_general(
                a_rows.reshape(PANEL, BCAP, 9), oh_a,
                (((1,), (1,)), ((0,), (0,))),
                precision=ONEHOT_PREC)                     # [P, 9, T]
            Acomb = A9.reshape(PANEL, 3, 3, TT).transpose(
                0, 1, 3, 2).reshape(P3, 3 * TT)            # [3p+i, 3t+j]
            X = Acomb[:, :P3]
            # reference upper-triangle rule at SCALAR level
            # (aprilsam.c:216-225)
            Sd = jnp.triu(X) + jnp.triu(X, 1).T
            # tikhonov in equilibrated units (the dense path adds it
            # before computing dvec; here dvec already includes it, so the
            # scaled diagonal contribution is tik * dvec^2); padding rows
            # get 1.0
            Sd = Sd + jnp.eye(P3, dtype=dtype) * jnp.where(
                active, tik * (dvP.reshape(P3) ** 2), 1.0)
            Au = Acomb[:, P3:]
            bP = (jax.lax.dynamic_slice(B_full, (p0, z0), (PANEL, 3))
                  * dvP).reshape(P3)

        cr = jnp.clip(crow_k, 0, NCAP - 1)
        rows_c = Rb[cr]                                    # [MC, BCAP, 3, 3]
        idx_c = R_idx_new[cr]
        y_c = y[cr]                                        # [MC, 3]
        oh_c = (idx_c[:, :, None] == tcols[None, None, :]).astype(dtype)
        W9 = jax.lax.dot_general(
            rows_c.reshape(MC, BCAP, 9), oh_c,
            (((1,), (1,)), ((0,), (0,))),
            precision=ONEHOT_PREC)                         # [MC, 9, T]
        V2 = W9.reshape(MC * 3, 3, TT)                     # [(m,i), j, t]
        V2p = V2[:, :, :PANEL]
        G4 = jax.lax.dot_general(
            V2p, V2, (((0,), (0,)), ((), ())),
            precision=GRAM_PREC)                           # [j, P, k, T]
        G = G4.transpose(1, 0, 3, 2).reshape(P3, 3 * TT)
        gy4 = jax.lax.dot_general(
            y_c.reshape(3 * MC), V2p, (((0,), (0,)), ((), ())))  # [j, P]
        gy = gy4.T.reshape(P3)

        S = Sd - G[:, :P3]
        Su = Au - G[:, P3:]
        by = bP - gy

        Ls = jnp.linalg.cholesky(S)
        diag = jnp.diagonal(Ls)
        spd = spd & jnp.all(jnp.where(active, jnp.isfinite(diag)
                                      & (diag > 0), True))
        Rpp = jnp.triu(Ls.T)
        Rpu = jax.scipy.linalg.solve_triangular(Ls, Su, lower=True)
        yP = jax.scipy.linalg.solve_triangular(Ls, by, lower=True)

        # writeback: per row slot b the block at combined target tgt(p, b),
        # realized as one batched matmul against oh_a's transpose (gather
        # per slot == one-hot contraction over t)
        Rcomb = jnp.concatenate([Rpp, Rpu], axis=1)        # [P3, 3T]
        comb9 = Rcomb.reshape(PANEL, 3, TT, 3).transpose(0, 1, 3, 2).reshape(
            PANEL, 9, TT)
        N9 = jax.lax.dot_general(
            comb9, oh_a, (((2,), (2,)), ((0,), (0,))),
            precision=ONEHOT_PREC)                         # [P, 9, BCAP]
        newrows = N9.reshape(PANEL, 3, 3, BCAP).transpose(0, 3, 1, 2)
        Rb = jax.lax.dynamic_update_slice(Rb, newrows, (p0, z0, z0, z0))
        y = jax.lax.dynamic_update_slice(y, yP.reshape(PANEL, 3), (p0, z0))
        return (Rb, y, spd)

      return body

    Rb0 = jnp.zeros_like(ds.R_blocks)
    y0 = jnp.zeros((NCAP, 3), dtype=dtype)
    carry = (Rb0, y0, jnp.asarray(True))
    for g, (MCg, NUg) in enumerate(ladder):
        carry = jax.lax.fori_loop(
            gbounds[g], gbounds[g + 1],
            make_body(MCg, NUg, crows[g], ucolss[g]), carry)
    Rb, y_full, spd = carry

    # un-equilibrate the carried factor: R = R~ D^1/2 (column scaling);
    # y~ already equals the true y (see above)
    dcol_all = dvec_full[jnp.clip(R_idx_new, 0, NCAP - 1)]  # [NCAP, BCAP, 3]
    Rb = Rb / dcol_all[:, :, None, :]

    # ---- back-substitution + state update (aprilsam.c:298-315) ---------
    x_pos = panel_backsub(Rb, R_idx_new, y_full, n, PANEL, NPANB)
    node_ids = jnp.arange(NCAP, dtype=jnp.int32)
    valid = node_ids < n
    dx = jnp.where(valid[:, None],
                   x_pos[jnp.clip(pos_new, 0, NCAP - 1)], 0.0)
    ok = valid & ~jnp.any(jnp.isnan(dx), axis=1)
    new_state = jnp.where(ok[:, None], l_point + dx, ds.state)
    new_state = new_state.at[:, 2].set(
        jnp.where(ok, mod2pi(new_state[:, 2]), new_state[:, 2]))

    ds = ds._replace(
        R_blocks=Rb, R_idx=R_idx_new, R_nnz=R_nnz_new, y=y_full,
        state=new_state, l_point=l_point,
        delta_X=jnp.where(ok[:, None], dx, ds.delta_X),
        relinearized=jnp.zeros_like(ds.relinearized),
        pos=pos_new, order=order_new,
        start_over=jnp.int32(0), spd_ok=jnp.asarray(True),
    )
    # chi2 (a full factor re-eval) only when someone will read it: bench
    # replays run log_mode=2 and never materialize the lazy BatchInfo.chi2,
    # so the reduction is pure dead device time there (the reference also
    # computes chi2 outside its timed region, aprilsam_demo.c:229-232)
    do_log = log_mode < 2
    chi2 = jax.lax.cond(
        do_log, lambda: state_chi2(ds).astype(ds.state.dtype),
        lambda: jnp.zeros((), dtype=ds.state.dtype))
    LOG = ds.chi2_log.shape[0]
    ptr = jnp.maximum(ds.log_ptr - (log_mode == 1), 0)
    ds = ds._replace(
        chi2_log=ds.chi2_log.at[jnp.where(do_log, ptr, LOG)].set(
            chi2, mode="drop"),
        log_ptr=jnp.where(do_log, ptr + 1, ds.log_ptr),
    )
    return ds, chi2, spd


def precompile_panel_epoch(ds: DeviceState, cfg: SolverConfig,
                           nnodes_max: int) -> Tuple[DeviceState, int]:
    """Compile the panel-epoch ladder (one executable per power-of-two
    active panel count; all other capacities derive from it) with dead
    inputs on a throwaway state."""
    NCAP = cfg.node_capacity
    BCAP = cfg.row_block_capacity
    PANEL = cfg.panel_nodes
    npan_max = NCAP // PANEL
    target = min(_bucket_pow2(max(1, -(-nnodes_max // PANEL)), 1), npan_max)
    count = 0
    npanb = 1
    FCAP = cfg.factor_capacity
    FPOS = max(256, cfg.factor_capacity // 8)
    while True:
        mc, nu, mult, kexta, nfac3 = panel_caps(npanb, PANEL)
        ladder = seg_ladder(mc, nu)
        bpack = BCAP if BCAP <= 64 else 64
        pmax16 = (not _half(NCAP)) or (
            (3 * FCAP + FPOS + 1) <= 32768 and nfac3 <= 32768
            and kexta <= 32768)
        plan = PanelEpochPlan(
            npanb=npanb, mc_cap=mc, nu_cap=nu, mult=mult, kexta=kexta,
            nfac3=nfac3,
            crows=tuple(np.full((npanb, MCg), NCAP - 1, dtype=np.int32)
                        for MCg, _ in ladder),
            ucolss=tuple(np.full((npanb, NUg), NCAP, dtype=np.int32)
                         for _, NUg in ladder),
            gbounds=np.zeros(len(ladder) + 1, dtype=np.int32),
            perm=np.full(nfac3, 3 * cfg.factor_capacity
                         + max(256, cfg.factor_capacity // 8),
                         dtype=np.int32),
            astart=np.zeros(kexta, dtype=np.int32),
            acount=np.zeros(kexta, dtype=np.int32),
            bperm=np.full(nfac3, 2 * cfg.factor_capacity
                          + max(256, cfg.factor_capacity // 8),
                          dtype=np.int32),
            bstart=np.zeros(NCAP, dtype=np.int32),
            bcount=np.zeros(NCAP, dtype=np.int32),
            row_ptr=np.zeros(NCAP, dtype=np.int32),
            R_idx=np.full((NCAP, BCAP), NCAP, dtype=np.int32),
            R_nnz=np.zeros(NCAP, dtype=np.int32),
            pos=np.arange(NCAP, dtype=np.int32),
            order=np.arange(NCAP, dtype=np.int32),
            panel=PANEL, bpack=bpack, pmax16=pmax16,
        )
        bb = pack_pep(plan, NCAP, BCAP, 2)
        ds, _c, _s = panel_epoch_step(
            ds, jnp.asarray(bb),
            jnp.asarray(cfg.tikhonov, dtype=cfg.jnp_dtype),
            NPANB=npanb, MC=mc, NU=nu, MULT=mult, KEXTA=kexta,
            NFAC3=nfac3, PANEL=PANEL, BPACK=bpack, PMAX16=pmax16)
        count += 1
        if npanb >= target:
            break
        npanb *= 2
    jax.block_until_ready(ds.state)
    return ds, count
