"""Component-level TPU profiler: times each sub-block of the incremental
step kernel in isolation (ingestion, frontal gather, QR, scatter-back,
fringe, chi2) plus h2d upload bandwidth, to locate the 100x gap between
linalg microbenches (~0.05 ms) and the measured step (~11 ms fast path).
"""

from __future__ import annotations

import time

import numpy as np


def t_it(fn, *args, n=20, warmup=2, **kw):
    import jax

    for _ in range(warmup):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3  # ms


def main():
    import jax
    import jax.numpy as jnp

    from aprilsam_tpu.utils import enable_compilation_cache, setup_precision

    enable_compilation_cache()
    setup_precision()
    print(f"platform: {jax.devices()[0].platform}", flush=True)

    # ---------------- h2d upload bandwidth
    for kb in (4, 64, 512, 4096):
        a = np.zeros(kb * 256, dtype=np.int32)  # kb KiB

        def up(x):
            return jax.device_put(x)

        ms = t_it(up, a, n=10)
        print(f"h2d {kb:5d} KiB: {ms:8.3f} ms  "
              f"({kb / 1024 / (ms / 1e3 + 1e-12):7.1f} MiB/s)", flush=True)

    # ---------------- build a real mid-trajectory device state
    from aprilsam_tpu.io import load_g2o_text
    from aprilsam_tpu.replay import Replay
    from aprilsam_tpu.solver import SolverConfig
    from aprilsam_tpu.solver.state import state_chi2
    from aprilsam_tpu.factors import eval_xyt

    cfg = SolverConfig(
        dtype=np.float32, node_capacity=4096, factor_capacity=8192,
        row_block_capacity=96, panel_nodes=128, wallclock_gate=False,
        policy_lag=8, bundle_size=8)
    loaded = load_g2o_text("/root/reference/data/M3500.txt")
    rep = Replay(loaded, cfg, batch_update_only=False, deferred=True)
    for _ in range(900):
        rep.step()
    rep.solver._dispatch_queue()
    ds = rep.solver.ds
    jax.block_until_ready(ds.state)
    print("state built (900 steps)", flush=True)

    NCAP = cfg.node_capacity
    BCAP = cfg.row_block_capacity
    FCAP = cfg.factor_capacity
    dtype = jnp.float32

    # ---------------- state_chi2 decomposition
    print(f"state_chi2 full:          {t_it(jax.jit(state_chi2), ds):8.3f} ms",
          flush=True)

    @jax.jit
    def chi2_gather_only(ds):
        sa = ds.state[jnp.clip(ds.xyt_a, 0, NCAP - 1)]
        sb = ds.state[jnp.clip(ds.xyt_b, 0, NCAP - 1)]
        return sa.sum() + sb.sum()

    print(f"chi2 gathers only:        {t_it(chi2_gather_only, ds):8.3f} ms",
          flush=True)

    @jax.jit
    def chi2_eval_only(ds):
        ev = eval_xyt(ds.state, jnp.clip(ds.xyt_a, 0, NCAP - 1),
                      jnp.clip(ds.xyt_b, 0, NCAP - 1), ds.xyt_z, ds.xyt_W)
        return ev.chi2.sum()

    print(f"chi2 eval_xyt sum:        {t_it(chi2_eval_only, ds):8.3f} ms",
          flush=True)

    # ---------------- fast-path pieces at M=16
    M = 16
    K3 = 3 * M
    KNEW = cfg.new_factor_capacity
    F_pos = jnp.arange(M, dtype=jnp.int32) + 800

    @jax.jit
    def frontal_gather(ds, F_pos):
        rows = ds.R_blocks[jnp.clip(F_pos, 0, NCAP - 1)]
        gfc = jnp.where(ds.R_idx[F_pos] < NCAP, 1, -1)
        oh = jax.nn.one_hot(jnp.clip(gfc, 0, M), M, dtype=dtype)
        RF = jnp.einsum("rbij,rbc->rcij", rows, oh)
        return RF.transpose(0, 2, 1, 3).reshape(K3, K3)

    print(f"frontal gather M=16:      {t_it(frontal_gather, ds, F_pos):8.3f} ms",
          flush=True)

    C = jnp.asarray(np.random.randn(K3 + 3 * KNEW, K3), dtype=dtype)

    @jax.jit
    def qr_only(C):
        Q, R = jnp.linalg.qr(C, mode="reduced")
        return Q, R

    print(f"qr [{K3+3*KNEW}x{K3}]:            {t_it(qr_only, C):8.3f} ms",
          flush=True)

    # scatter-back: one row-level scatter of [M, BCAP, 3, 3] into [NCAP,...]
    blocks = jnp.zeros((M, BCAP, 3, 3), dtype=dtype)

    @jax.jit
    def scatter_back(ds, F_pos, blocks):
        Rb = ds.R_blocks.at[F_pos].set(blocks, mode="drop")
        return Rb[0, 0, 0, 0]

    print(f"R scatter-back M=16:      {t_it(scatter_back, ds, F_pos, blocks):8.3f} ms",
          flush=True)

    # factor-table append scatters
    widx = jnp.arange(KNEW, dtype=jnp.int32) + 5000

    @jax.jit
    def table_append(ds, widx):
        za = ds.xyt_z.at[widx].set(0.0, mode="drop")
        Wa = ds.xyt_W.at[widx].set(0.0, mode="drop")
        aa = ds.xyt_a.at[widx].set(0, mode="drop")
        return za[0, 0] + Wa[0, 0, 0] + aa[0]

    print(f"factor-table appends:     {t_it(table_append, ds, widx):8.3f} ms",
          flush=True)

    # state scatters (node ingestion)
    nid = jnp.arange(4, dtype=jnp.int32) + 3000
    st4 = jnp.zeros((4, 3), dtype=dtype)

    @jax.jit
    def node_ingest(ds, nid, st4):
        s = ds.state.at[nid].set(st4, mode="drop")
        l = ds.l_point.at[nid].set(st4, mode="drop")
        d = ds.delta_X.at[nid].set(0.0, mode="drop")
        return s[0, 0] + l[0, 0] + d[0, 0]

    print(f"node ingest scatters:     {t_it(node_ingest, ds, nid, st4):8.3f} ms",
          flush=True)

    # the full fast body via the real jit, steady state (warm, fixed plan)
    from aprilsam_tpu.solver.incremental import (
        inc_step_fast, plan_step, StepPlan, ints_layout, floats_layout)

    # reuse a dead plan (m=0) to time pure kernel overhead
    _, LI = ints_layout(16, 32, KNEW)
    _, LF = floats_layout(KNEW)
    ints = jnp.asarray(np.zeros(LI, dtype=np.int32))
    flts = jnp.asarray(np.zeros(LF, dtype=np.float32))
    maps = jnp.asarray(np.full((3, 16, BCAP), -1, dtype=np.int32))
    ffc = jnp.asarray(np.full((32, BCAP), -1, dtype=np.int32))

    ds2 = ds
    import aprilsam_tpu.solver.incremental as inc

    def run_fast(ds2):
        out, stats = inc_step_fast(
            ds2, ints, flts, maps, ffc, MAXAFF=16, MAXFR=32, KNEW=KNEW,
            delta_xy=0.1, delta_theta=0.1)
        return out, stats

    # donation: must rebuild ds2 each call; time a chain instead
    n = 20
    out, stats = run_fast(ds2)
    jax.block_until_ready(out.state)
    t0 = time.perf_counter()
    for _ in range(n):
        out, stats = run_fast(out)
    jax.block_until_ready(out.state)
    ms = (time.perf_counter() - t0) / n * 1e3
    print(f"inc_step_fast (dead, device-resident args): {ms:8.3f} ms",
          flush=True)

    # with fresh numpy uploads each call (the real dispatch path)
    ints_np = np.zeros(LI, dtype=np.int32)
    flts_np = np.zeros(LF, dtype=np.float32)
    maps_np = np.full((3, 16, BCAP), -1, dtype=np.int32)
    ffc_np = np.full((32, BCAP), -1, dtype=np.int32)
    t0 = time.perf_counter()
    for _ in range(n):
        out, stats = inc_step_fast(
            out, jnp.asarray(ints_np), jnp.asarray(flts_np),
            jnp.asarray(maps_np), jnp.asarray(ffc_np),
            MAXAFF=16, MAXFR=32, KNEW=KNEW, delta_xy=0.1, delta_theta=0.1)
    jax.block_until_ready(out.state)
    ms = (time.perf_counter() - t0) / n * 1e3
    print(f"inc_step_fast (dead, numpy uploads):        {ms:8.3f} ms",
          flush=True)


if __name__ == "__main__":
    main()
