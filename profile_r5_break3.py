"""Staged breakdown of the GRADED panel epoch body on TPU (r5).

Stage 0: factor eval + gather assembly (A_comp/B_full)
Stage 1: + per-panel A-side (gather, equilibrate, A9 one-hot, Sd/Au/bP)
Stage 2: + contributor gather + strip build (W9)
Stage 3: + Gram + corrections
Stage 4: + chol/solves + writeback (full graded loops)
Stage 5: + un-equilibrate + panel backsub (full kernel sans state update)
"""
import time
from functools import partial
import numpy as np
import jax
import jax.numpy as jnp

from aprilsam_tpu.utils import enable_compilation_cache, setup_precision
enable_compilation_cache()
setup_precision()
print("platform:", jax.devices()[0].platform, flush=True)

from aprilsam_tpu.io import load_g2o_text
from aprilsam_tpu.graph import FactorGraph
from aprilsam_tpu.replay import GEOPIN_W
from aprilsam_tpu.solver import SolverConfig
from aprilsam_tpu.solver import panel_epoch as PE
from aprilsam_tpu.solver.batch import BatchSolver

loaded = load_g2o_text("/root/reference/data/M3500.txt")
cfg = SolverConfig(dtype=np.float32, node_capacity=4096, factor_capacity=8192,
                   row_block_capacity=96, panel_nodes=128,
                   batch_backend="panel", log_chi2=False)
g = FactorGraph()
for i in range(loaded.nnodes):
    g.add_node(loaded.state[i])
g.add_factor_xytpos(0, np.zeros(3), GEOPIN_W)
for f in range(loaded.nfactors):
    a, b = loaded.fnodes[f]
    g.add_factor_xyt(int(a), int(b), loaded.fz[f], loaded.fW[f])

solver = BatchSolver(cfg)
info = solver.solve(g)
print(f"first epoch chi2={float(info.chi2):.3f}", flush=True)
ds = solver.ds
sym = solver.sym
nn = g.nnodes
plan = PE.build_panel_plan(cfg, nn, sym, sym.pad_idx, sym.pad_nnz,
                           g.ftype[:g.nfactors], g.fnodes[:g.nfactors])
bb = PE.pack_pep(plan, 4096, 96, 2)
bbj = jnp.asarray(bb)
tik = jnp.asarray(cfg.tikhonov, dtype=cfg.jnp_dtype)
dims = dict(NPANB=plan.npanb, MC=plan.mc_cap, NU=plan.nu_cap,
            MULT=plan.mult, KEXTA=plan.kexta, NFAC3=plan.nfac3, PANEL=128,
            BPACK=plan.bpack, PMAX16=plan.pmax16)


@partial(jax.jit, static_argnames=("NPANB", "MC", "NU", "MULT", "KEXTA",
                                   "NFAC3", "PANEL", "BPACK", "PMAX16", "STAGE", "REPS"))
def staged(ds, bb, tikhonov,
           NPANB, MC, NU, MULT, KEXTA, NFAC3, PANEL, BPACK, PMAX16,
           STAGE, REPS=1):
    def _rep(_i, acc):
        out = _once(ds._replace(state=ds.state + acc * 1e-30), bb,
                    tikhonov, NPANB, MC, NU, MULT, KEXTA, NFAC3, PANEL,
                    BPACK, PMAX16, STAGE)
        return out * 1e-30
    return jax.lax.fori_loop(0, REPS, _rep, jnp.float32(0))


def _once(ds, bb, tikhonov,
          NPANB, MC, NU, MULT, KEXTA, NFAC3, PANEL, BPACK, PMAX16, STAGE):
    from aprilsam_tpu.factors import eval_xyt, eval_xytpos, gn_blocks_xyt
    from aprilsam_tpu.kernels.sweep import panel_backsub
    NCAP = ds.state.shape[0]
    BCAP = ds.R_idx.shape[1]
    FCAP = ds.xyt_a.shape[0]
    FPOS = ds.pos_node.shape[0]
    dtype = ds.R_blocks.dtype
    dimsv = (NPANB, MC, NU, MULT, KEXTA, NFAC3, PANEL, BPACK, PMAX16)
    off16, _L16, off32, L32 = PE.pep_layout(NCAP, BCAP, dimsv)
    half = PE._half(NCAP)
    NB = min(NCAP, NPANB * PANEL)
    ONEHOT_PREC = jax.lax.Precision.HIGH

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
    ladder = PE.seg_ladder(MC, NU)
    crows = [dec16(f"crow{g}", (NPANB, MCg))
             for g, (MCg, _NUg) in enumerate(ladder)]
    ucolss = [dec16(f"ucols{g}", (NPANB, NUg))
              for g, (_MCg, NUg) in enumerate(ladder)]
    arange_tail = jnp.arange(NB, NCAP, dtype=jnp.int32)
    R_idx_new = jnp.pad(dec16("R_idx", (NB, BPACK)),
                        ((0, NCAP - NB), (0, BCAP - BPACK)),
                        constant_values=NCAP)
    R_nnz_new = jnp.pad(dec16("R_nnz"), (0, NCAP - NB))
    pos_new = jnp.concatenate([dec16("pos"), arange_tail])
    acount = dec16("acount")
    bcount = jnp.pad(dec16("bcount"), (0, NCAP - NB))
    perm = dec_seg("perm")
    bperm = dec_seg("bperm")
    astart = dec_seg("astart")
    bstart = jnp.pad(dec_seg("bstart"), (0, NCAP - NB))
    row_ptr = jnp.pad(dec_seg("row_ptr"), (0, NCAP - NB))
    gbounds = dec32("gbounds")
    n = ds.nnodes
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
    blocks = jnp.concatenate([Haa, Hbb, Hoff, ds.pos_W,
                              jnp.zeros((1, 3, 3), dtype=dtype)], axis=0)
    bvecs = jnp.concatenate([ga, gb, gp, jnp.zeros((1, 3), dtype=dtype)],
                            axis=0)
    Hs = blocks[jnp.clip(perm, 0, 3 * FCAP + FPOS)]
    tab = astart[:, None] + jnp.arange(MULT, dtype=jnp.int32)[None, :]
    tmask = jnp.arange(MULT, dtype=jnp.int32)[None, :] < acount[:, None]
    G = Hs[jnp.clip(tab, 0, NFAC3 - 1)] * tmask[..., None, None]
    A_comp = G.sum(axis=1)
    Bs = bvecs[jnp.clip(bperm, 0, 2 * FCAP + FPOS)]
    btab = bstart[:, None] + jnp.arange(MULT, dtype=jnp.int32)[None, :]
    bmask = jnp.arange(MULT, dtype=jnp.int32)[None, :] < bcount[:, None]
    Bq = Bs[jnp.clip(btab, 0, NFAC3 - 1)] * bmask[..., None]
    B_full = Bq.sum(axis=1)
    if STAGE == 0:
        return A_comp.sum() + B_full.sum()

    P3 = 3 * PANEL
    tik = jnp.asarray(tikhonov, dtype=dtype)
    diag_blocks = A_comp[jnp.clip(row_ptr, 0, KEXTA - 1)]
    dscal = jnp.einsum("pii->pi", diag_blocks) + tik
    prow_act = jnp.arange(NCAP, dtype=jnp.int32) < n
    dvec_full = jnp.where(prow_act[:, None],
                          jax.lax.rsqrt(jnp.maximum(dscal, 1e-30)), 1.0)

    def make_body(MCg, NUg, crow_g, ucols_g):
      TT = PANEL + NUg
      MC_ = MCg

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
        tcols = jnp.concatenate(
            [p0 + jnp.arange(PANEL, dtype=jnp.int32), ucols_k])
        a_rows = A_comp[jnp.clip(
            rptr_pan[:, None] + jnp.arange(BCAP, dtype=jnp.int32), 0,
            KEXTA - 1)] * slotv[..., None, None]
        dvP = jax.lax.dynamic_slice(dvec_full, (p0, z0), (PANEL, 3))
        dcol = dvec_full[jnp.clip(idx_pan, 0, NCAP - 1)]
        a_rows = a_rows * dvP[:, None, :, None] * dcol[:, :, None, :]
        oh_a = ((idx_pan[:, :, None] == tcols[None, None, :])
                & slotv[..., None]).astype(dtype)
        A9 = jax.lax.dot_general(
            a_rows.reshape(PANEL, BCAP, 9), oh_a,
            (((1,), (1,)), ((0,), (0,))), precision=ONEHOT_PREC)
        Acomb = A9.reshape(PANEL, 3, 3, TT).transpose(0, 1, 3, 2).reshape(
            P3, 3 * TT)
        X = Acomb[:, :P3]
        Sd = jnp.triu(X) + jnp.triu(X, 1).T
        active = jnp.repeat(prow < n, 3)
        Sd = Sd + jnp.eye(P3, dtype=dtype) * jnp.where(
            active, tik * (dvP.reshape(P3) ** 2), 1.0)
        Au = Acomb[:, P3:]
        bP = (jax.lax.dynamic_slice(B_full, (p0, z0), (PANEL, 3))
              * dvP).reshape(P3)
        if STAGE == 1:
            newrows = a_rows + (Sd.sum() + Au.sum() + bP.sum()) * 0
            Rb = jax.lax.dynamic_update_slice(Rb, newrows, (p0, z0, z0, z0))
            y = jax.lax.dynamic_update_slice(y, bP.reshape(PANEL, 3)[:, :3],
                                             (p0, z0))
            return (Rb, y, spd)

        cr = jnp.clip(crow_k, 0, NCAP - 1)
        rows_c = Rb[cr]
        idx_c = R_idx_new[cr]
        y_c = y[cr]
        oh_c = (idx_c[:, :, None] == tcols[None, None, :]).astype(dtype)
        W9 = jax.lax.dot_general(
            rows_c.reshape(MC_, BCAP, 9), oh_c,
            (((1,), (1,)), ((0,), (0,))), precision=ONEHOT_PREC)
        V2 = W9.reshape(MC_ * 3, 3, TT)
        V2p = V2[:, :, :PANEL]
        if STAGE == 2:
            newrows = a_rows + (V2.sum() + y_c.sum()) * 0
            Rb = jax.lax.dynamic_update_slice(Rb, newrows, (p0, z0, z0, z0))
            y = jax.lax.dynamic_update_slice(y, bP.reshape(PANEL, 3)[:, :3],
                                             (p0, z0))
            return (Rb, y, spd)
        G4 = jax.lax.dot_general(V2p, V2, (((0,), (0,)), ((), ())))
        Gm = G4.transpose(1, 0, 3, 2).reshape(P3, 3 * TT)
        gy4 = jax.lax.dot_general(
            y_c.reshape(3 * MC_), V2p, (((0,), (0,)), ((), ())))
        gy = gy4.T.reshape(P3)
        S = Sd - Gm[:, :P3]
        Su = Au - Gm[:, P3:]
        by = bP - gy
        if STAGE == 3:
            newrows = a_rows + (S.sum() + Su.sum() + by.sum()) * 0
            Rb = jax.lax.dynamic_update_slice(Rb, newrows, (p0, z0, z0, z0))
            y = jax.lax.dynamic_update_slice(y, bP.reshape(PANEL, 3)[:, :3],
                                             (p0, z0))
            return (Rb, y, spd)
        Ls = jnp.linalg.cholesky(S)
        diag = jnp.diagonal(Ls)
        spd = spd & jnp.all(jnp.where(active, jnp.isfinite(diag)
                                      & (diag > 0), True))
        Rpp = jnp.triu(Ls.T)
        Rpu = jax.scipy.linalg.solve_triangular(Ls, Su, lower=True)
        yP = jax.scipy.linalg.solve_triangular(Ls, by, lower=True)
        Rcomb = jnp.concatenate([Rpp, Rpu], axis=1)
        comb9 = Rcomb.reshape(PANEL, 3, TT, 3).transpose(0, 1, 3, 2).reshape(
            PANEL, 9, TT)
        N9 = jax.lax.dot_general(
            comb9, oh_a, (((2,), (2,)), ((0,), (0,))), precision=ONEHOT_PREC)
        newrows = N9.reshape(PANEL, 3, 3, BCAP).transpose(0, 3, 1, 2)
        Rb = jax.lax.dynamic_update_slice(Rb, newrows, (p0, z0, z0, z0))
        y = jax.lax.dynamic_update_slice(y, yP.reshape(PANEL, 3), (p0, z0))
        return (Rb, y, spd)

      return body

    Rb0 = jnp.zeros_like(ds.R_blocks)
    y0 = jnp.zeros((NCAP, 3), dtype=dtype)
    carry = (Rb0, y0, jnp.asarray(True))
    for gi, (MCg, NUg) in enumerate(ladder):
        carry = jax.lax.fori_loop(
            gbounds[gi], gbounds[gi + 1],
            make_body(MCg, NUg, crows[gi], ucolss[gi]), carry)
    Rb, y_full, spd = carry
    if STAGE < 5:
        return Rb.sum() + y_full.sum()
    dcol_all = dvec_full[jnp.clip(R_idx_new, 0, NCAP - 1)]
    Rb = Rb / dcol_all[:, :, None, :]
    x_pos = panel_backsub(Rb, R_idx_new, y_full, n, PANEL, NPANB)
    return Rb.sum() + y_full.sum() + x_pos.sum()


for stage in (0, 1, 2, 3, 4, 5):
    v = float(staged(ds, bbj, tik, STAGE=stage, REPS=1, **dims))
    v = float(staged(ds, bbj, tik, STAGE=stage, REPS=9, **dims))
    t0 = time.perf_counter()
    v = float(staged(ds, bbj, tik, STAGE=stage, REPS=1, **dims))
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    v = float(staged(ds, bbj, tik, STAGE=stage, REPS=9, **dims))
    t9 = time.perf_counter() - t0
    print(f"stage {stage}: {(t9-t1)/8*1e3:.1f} ms/iter", flush=True)
