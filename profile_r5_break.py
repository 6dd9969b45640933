"""Stage-ablated panel epoch breakdown on TPU (no replay needed).

Stages: 0 assembly only; 1 +panel A strips; 2 +contributor strips;
3 +Gram matmuls; 4 +chol/tri-solves (no backsub); 5 full kernel.
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
from aprilsam_tpu.solver.state import DeviceState

loaded = load_g2o_text("/root/reference/data/M3500.txt")
cfg = SolverConfig(dtype=np.float32, node_capacity=4096, factor_capacity=8192,
                   row_block_capacity=96, panel_nodes=128,
                   batch_backend="panel", log_chi2=False)
# build the replay-equivalent graph: all nodes + geopin + all factors
g = FactorGraph()
for i in range(loaded.nnodes):
    g.add_node(loaded.state[i])
g.add_factor_xytpos(0, loaded.state[0], GEOPIN_W)
for f in range(loaded.nfactors):
    a, b = loaded.fnodes[f]
    g.add_factor_xyt(int(a), int(b), loaded.fz[f], loaded.fW[f])

solver = BatchSolver(cfg)
info = solver.solve(g)
jax.block_until_ready(solver.ds.state)
print(f"first epoch chi2={float(info.chi2):.3f} spd={bool(info.spd)}", flush=True)

ds = solver.ds
sym = solver.sym
nn = g.nnodes
plan = PE.build_panel_plan(cfg, nn, sym, sym.pad_idx, sym.pad_nnz,
                           g.ftype[:g.nfactors], g.fnodes[:g.nfactors])
b16, b32 = PE.pack_pep(plan, 4096, 96, 2)
b16j, b32j = jnp.asarray(b16), jnp.asarray(b32)
tik = jnp.asarray(cfg.tikhonov, dtype=cfg.jnp_dtype)
dims = dict(NPANB=plan.npanb, MC=plan.mc_cap, NU=plan.nu_cap,
            MULT=plan.mult, KEXTA=plan.kexta, NFAC3=plan.nfac3, PANEL=128)
jax.block_until_ready(b16j)


@partial(jax.jit, static_argnames=("NPANB", "MC", "NU", "MULT", "KEXTA",
                                   "NFAC3", "PANEL", "STAGE", "REPS"))
def staged(ds: DeviceState, b16, b32, tikhonov,
           NPANB, MC, NU, MULT, KEXTA, NFAC3, PANEL, STAGE, REPS=1):
    def _rep(_i, acc):
        out = _staged_once(ds._replace(state=ds.state + acc * 1e-30),
                           b16, b32, tikhonov,
                           NPANB, MC, NU, MULT, KEXTA, NFAC3, PANEL, STAGE)
        return out * 1e-30 + acc * 0
    return jax.lax.fori_loop(0, REPS, _rep, jnp.float32(0))


def _staged_once(ds: DeviceState, b16, b32, tikhonov,
           NPANB, MC, NU, MULT, KEXTA, NFAC3, PANEL, STAGE):
    from aprilsam_tpu.factors import eval_xyt, eval_xytpos, gn_blocks_xyt
    from aprilsam_tpu.kernels.sweep import panel_backsub

    NCAP = ds.state.shape[0]
    BCAP = ds.R_idx.shape[1]
    FCAP = ds.xyt_a.shape[0]
    FPOS = ds.pos_node.shape[0]
    dtype = ds.R_blocks.dtype
    dimsv = (NPANB, MC, NU, MULT, KEXTA, NFAC3)
    off16, _L16, off32, _L32 = PE.pep_layout(NCAP, BCAP, dimsv)
    half = PE._half(NCAP)

    def dec16(name, shape=None):
        lo, hi, n = off16[name]
        seg = b16[lo:hi]
        if half:
            seg = jax.lax.bitcast_convert_type(seg, jnp.int16).astype(
                jnp.int32).reshape(n)
        return seg if shape is None else seg.reshape(shape)

    def dec32(name, shape=None):
        lo, hi, _n = off32[name]
        seg = b32[lo:hi]
        return seg if shape is None else seg.reshape(shape)

    crow = dec16("crow", (NPANB, MC))
    ucols = dec16("ucols", (NPANB, NU))
    R_idx_new = dec16("R_idx", (NCAP, BCAP))
    R_nnz_new = dec16("R_nnz")
    pos_new = dec16("pos")
    acount = dec16("acount")
    bcount = dec16("bcount")
    perm = dec32("perm")
    bperm = dec32("bperm")
    astart = dec32("astart")
    bstart = dec32("bstart")
    row_ptr = dec32("row_ptr")

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
    tikv = jnp.asarray(tikhonov, dtype=dtype)
    diag_blocks = A_comp[jnp.clip(row_ptr, 0, KEXTA - 1)]
    dscal = jnp.einsum("pii->pi", diag_blocks) + tikv
    prow_act = jnp.arange(NCAP, dtype=jnp.int32) < n
    dvec_full = jnp.where(prow_act[:, None],
                          jax.lax.rsqrt(jnp.maximum(dscal, 1e-30)), 1.0)

    def body(carry, xs):
        Rb, y, spd = carry
        k, crow_k, ucols_k = xs
        p0 = k * jnp.int32(PANEL)
        z0 = jnp.int32(0)
        prow = p0 + jnp.arange(PANEL, dtype=jnp.int32)
        idx_pan = jax.lax.dynamic_slice(R_idx_new, (p0, z0), (PANEL, BCAP))
        nnz_pan = jax.lax.dynamic_slice(R_nnz_new, (p0,), (PANEL,))
        rptr_pan = jax.lax.dynamic_slice(row_ptr, (p0,), (PANEL,))
        slotv = jnp.arange(BCAP, dtype=jnp.int32)[None, :] < nnz_pan[:, None]

        a_rows = A_comp[jnp.clip(
            rptr_pan[:, None] + jnp.arange(BCAP, dtype=jnp.int32), 0,
            KEXTA - 1)] * slotv[..., None, None]
        dvP = jax.lax.dynamic_slice(dvec_full, (p0, z0), (PANEL, 3))
        dcol = dvec_full[jnp.clip(idx_pan, 0, NCAP - 1)]
        a_rows = a_rows * dvP[:, None, :, None] * dcol[:, :, None, :]
        loc = idx_pan - p0
        inpan = (loc >= 0) & (loc < PANEL) & slotv
        oh_in = jax.nn.one_hot(jnp.where(inpan, loc, 0), PANEL,
                               dtype=dtype) * inpan[..., None]
        Apan = jnp.einsum("pbij,pbc->pcij", a_rows, oh_in)
        X = Apan.transpose(0, 2, 1, 3).reshape(P3, P3)
        Sd = jnp.triu(X) + jnp.triu(X, 1).T
        active = jnp.repeat(prow < n, 3)
        Sd = Sd + jnp.eye(P3, dtype=dtype) * jnp.where(
            active, tikv * (dvP.reshape(P3) ** 2), 1.0)
        oh_u = ((idx_pan[:, :, None] == ucols_k[None, None, :])
                & slotv[..., None]).astype(dtype)
        Atail = jnp.einsum("pbij,pbu->puij", a_rows, oh_u)
        Au = Atail.transpose(0, 2, 1, 3).reshape(P3, 3 * NU)
        bP = (jax.lax.dynamic_slice(B_full, (p0, z0), (PANEL, 3))
              * dvP).reshape(P3)

        if STAGE == 1:
            newrows = a_rows + (Apan.sum() + Au.sum()) * 0
            Rb = jax.lax.dynamic_update_slice(Rb, newrows, (p0, z0, z0, z0))
            y = jax.lax.dynamic_update_slice(y, bP.reshape(PANEL, 3),
                                             (p0, z0))
            return (Rb, y, spd), None

        cr = jnp.clip(crow_k, 0, NCAP - 1)
        rows_c = Rb[cr]
        idx_c = R_idx_new[cr]
        y_c = y[cr]
        locc = idx_c - p0
        cin = (locc >= 0) & (locc < PANEL)
        ohc = jax.nn.one_hot(jnp.where(cin, locc, 0), PANEL,
                             dtype=dtype) * cin[..., None]
        Wp = jnp.einsum("mbij,mbp->mpij", rows_c, ohc)
        Wps = Wp.transpose(0, 2, 1, 3).reshape(3 * MC, P3)
        ohu_c = (idx_c[:, :, None] == ucols_k[None, None, :]).astype(dtype)
        Wu = jnp.einsum("mbij,mbu->muij", rows_c, ohu_c)
        Wus = Wu.transpose(0, 2, 1, 3).reshape(3 * MC, 3 * NU)

        if STAGE == 2:
            newrows = a_rows + (Wps.sum() + Wus.sum() + y_c.sum()) * 0
            Rb = jax.lax.dynamic_update_slice(Rb, newrows, (p0, z0, z0, z0))
            y = jax.lax.dynamic_update_slice(y, bP.reshape(PANEL, 3),
                                             (p0, z0))
            return (Rb, y, spd), None

        if STAGE == 33:
            Wps, Wus = jax.lax.optimization_barrier((Wps, Wus))
        S = Sd - Wps.T @ Wps
        Su = Au - Wps.T @ Wus
        by = bP - Wps.T @ y_c.reshape(3 * MC)

        if STAGE in (3, 33):
            newrows = a_rows + (S.sum() + Su.sum() + by.sum()) * 0
            Rb = jax.lax.dynamic_update_slice(Rb, newrows, (p0, z0, z0, z0))
            y = jax.lax.dynamic_update_slice(y, bP.reshape(PANEL, 3),
                                             (p0, z0))
            return (Rb, y, spd), None

        Ls = jnp.linalg.cholesky(S)
        diag = jnp.diagonal(Ls)
        spd = spd & jnp.all(jnp.where(active, jnp.isfinite(diag)
                                      & (diag > 0), True))
        Rpp = jnp.triu(Ls.T)
        Rpu = jax.scipy.linalg.solve_triangular(Ls, Su, lower=True)
        yP = jax.scipy.linalg.solve_triangular(Ls, by, lower=True)

        Rpp_b = Rpp.reshape(PANEL, 3, PANEL, 3).transpose(0, 2, 1, 3)
        npart = jnp.einsum("pcij,pbc->pbij", Rpp_b, oh_in)
        Rpu_b = Rpu.reshape(PANEL, 3, NU, 3).transpose(0, 2, 1, 3)
        upart = jnp.einsum("puij,pbu->pbij", Rpu_b, oh_u)
        newrows = npart + upart
        Rb = jax.lax.dynamic_update_slice(Rb, newrows, (p0, z0, z0, z0))
        y = jax.lax.dynamic_update_slice(y, yP.reshape(PANEL, 3), (p0, z0))
        return (Rb, y, spd), None

    Rb0 = jnp.zeros_like(ds.R_blocks)
    y0 = jnp.zeros((NCAP, 3), dtype=dtype)
    (Rb, y_full, spd), _ = jax.lax.scan(
        body, (Rb0, y0, jnp.asarray(True)),
        (jnp.arange(NPANB, dtype=jnp.int32), crow, ucols))

    if STAGE < 5:
        return Rb.sum() + y_full.sum()

    dcol_all = dvec_full[jnp.clip(R_idx_new, 0, NCAP - 1)]
    Rb = Rb / dcol_all[:, :, None, :]
    x_pos = panel_backsub(Rb, R_idx_new, y_full, n, PANEL, NPANB)
    return Rb.sum() + y_full.sum() + x_pos.sum()


for stage in (0, 1, 2, 3, 4, 5):
    v = float(staged(ds, b16j, b32j, tik, STAGE=stage, REPS=1, **dims))
    v = float(staged(ds, b16j, b32j, tik, STAGE=stage, REPS=9, **dims))
    t0 = time.perf_counter()
    v = float(staged(ds, b16j, b32j, tik, STAGE=stage, REPS=1, **dims))
    t1 = (time.perf_counter() - t0)
    t0 = time.perf_counter()
    v = float(staged(ds, b16j, b32j, tik, STAGE=stage, REPS=9, **dims))
    t9 = (time.perf_counter() - t0)
    print(f"stage {stage}: {(t9-t1)/8*1e3:.1f} ms/iter  (r1={t1*1e3:.0f} r9={t9*1e3:.0f})", flush=True)

# real kernel for reference (donating; run chained)
ds2, c2, spd2 = PE.panel_epoch_step(ds, b16j, b32j, tik, **dims)
jax.block_until_ready(ds2.state)
t0 = time.perf_counter()
N = 6
for _ in range(N):
    ds2, c2, spd2 = PE.panel_epoch_step(ds2, b16j, b32j, tik, **dims)
jax.block_until_ready(ds2.state)
print(f"real kernel: {(time.perf_counter()-t0)/N*1e3:.1f} ms "
      f"chi2={float(c2):.3f}", flush=True)
