"""Decisive step-cost attribution on TPU: times donated ds->ds passthrough
(buffer-count overhead), the real step jits with dead device-resident plans,
and truncated sub-bodies of _frontal_core, at the signatures the M3500
replay actually dispatches (MAXAFF in {16, 64, 256}).

The warm 400-step profile (profile_step.py) shows full-path steps at
30-320 ms while every linalg microbench is < 0.1 ms — this locates the gap.
"""

from __future__ import annotations

import time

import numpy as np


def chain(fn, ds, *args, n=10, warmup=2):
    """Time a donated ds->ds chain (block only at the ends)."""
    import jax

    out = ds
    for _ in range(warmup):
        out = fn(out, *args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(out, *args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3, out


def main():
    import jax
    import jax.numpy as jnp

    from aprilsam_tpu.utils import enable_compilation_cache, setup_precision

    enable_compilation_cache()
    setup_precision()
    print(f"platform: {jax.devices()[0].platform}", flush=True)

    # ---- 0a. per-argument dispatch overhead (relay theory probe)
    for nargs in (1, 4, 16, 32):
        arrs = tuple(jnp.zeros((128,), jnp.float32) + i for i in range(nargs))

        @jax.jit
        def use_all(*xs):
            return sum(x[0] for x in xs)

        o = use_all(*arrs)
        jax.block_until_ready(o)
        t0 = time.perf_counter()
        for _ in range(30):
            o = use_all(*arrs)
        jax.block_until_ready(o)
        ms_in = (time.perf_counter() - t0) / 30 * 1e3

        f2 = jax.jit(lambda *xs: tuple(x + 1.0 for x in xs),
                     donate_argnums=tuple(range(nargs)))
        out = f2(*arrs)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(30):
            out = f2(*out)
        jax.block_until_ready(out)
        ms_io = (time.perf_counter() - t0) / 30 * 1e3
        print(f"args={nargs:3d}: in-only {ms_in:7.3f} ms, "
              f"donated in+out {ms_io:7.3f} ms", flush=True)

    # ---- 0b. h2d upload latency
    for kb in (4, 64, 1024):
        a = np.zeros(kb * 256, dtype=np.float32)
        o = jnp.asarray(a)
        jax.block_until_ready(o)
        t0 = time.perf_counter()
        for _ in range(20):
            o = jnp.asarray(a)
            jax.block_until_ready(o)
        print(f"h2d {kb:5d} KiB (blocking): "
              f"{(time.perf_counter()-t0)/20*1e3:8.3f} ms", flush=True)

    from aprilsam_tpu.io import load_g2o_text
    from aprilsam_tpu.replay import Replay
    from aprilsam_tpu.solver import SolverConfig
    from aprilsam_tpu.solver.state import state_chi2
    import aprilsam_tpu.solver.incremental as inc

    cfg = SolverConfig(
        dtype=np.float32, node_capacity=4096, factor_capacity=8192,
        row_block_capacity=96, panel_nodes=128, wallclock_gate=False,
        policy_lag=8, bundle_size=8)
    loaded = load_g2o_text("/root/reference/data/M3500.txt")
    rep = Replay(loaded, cfg, batch_update_only=False, deferred=True)
    t0 = time.perf_counter()
    for _ in range(300):
        rep.step()
    rep.solver._dispatch_queue()
    solver = rep.solver
    ds = solver.ds
    jax.block_until_ready(ds.state)
    print(f"state built (400 steps, {time.perf_counter()-t0:.1f}s)",
          flush=True)

    NCAP = cfg.node_capacity
    BCAP = cfg.row_block_capacity
    K = cfg.new_factor_capacity
    dtype = jnp.float32

    # ---- 1. donated passthrough: pure buffer/dispatch overhead
    @jax.jit
    def passthrough(ds):
        return ds._replace(state=ds.state + 0.0)

    # donation not set: measures plain pytree in/out dispatch
    ms, _ = chain(lambda d: passthrough(d), ds)
    print(f"ds passthrough (no donate):   {ms:8.3f} ms", flush=True)

    from functools import partial

    @partial(jax.jit, donate_argnames=("ds",))
    def passthrough_don(ds):
        return ds._replace(state=ds.state + 0.0)

    ms, out = chain(lambda d: passthrough_don(d), ds)
    print(f"ds passthrough (donated):     {ms:8.3f} ms", flush=True)
    ds = out

    # ---- 2. real step jits with dead plans (device-resident packed)
    def dead_packed(MAXAFF, MAXFR):
        seg, L = inc.packed_layout(MAXAFF, MAXFR, K, BCAP, np.float32)
        dead = np.zeros(L, dtype=np.int32)
        dead[seg["ridx"][0]:seg["ridx"][1]] = NCAP
        return jnp.asarray(dead)

    pk16 = dead_packed(16, 32)

    ms, out = chain(
        lambda d: inc.inc_step_fast(
            d, pk16, MAXAFF=16, MAXFR=32, KNEW=K,
            delta_xy=0.1, delta_theta=0.1, log_chi2=True)[0], ds)
    print(f"inc_step_fast 16/32 logchi2:  {ms:8.3f} ms", flush=True)
    ds = out

    ms, out = chain(
        lambda d: inc.inc_step_fast(
            d, pk16, MAXAFF=16, MAXFR=32, KNEW=K,
            delta_xy=0.1, delta_theta=0.1, log_chi2=False)[0], ds)
    print(f"inc_step_fast 16/32 nochi2:   {ms:8.3f} ms", flush=True)
    ds = out

    pkb = jnp.stack([dead_packed(16, 32)] * 8)
    ms, out = chain(
        lambda d: inc.inc_bundle_fast(
            d, pkb, MAXAFF=16, MAXFR=32, KNEW=K,
            delta_xy=0.1, delta_theta=0.1, log_chi2=True)[0], ds)
    print(f"inc_bundle_fast x8 chi2 /step:   {ms/8:8.3f} ms", flush=True)
    ds = out

    ms, out = chain(
        lambda d: inc.inc_bundle_fast(
            d, pkb, MAXAFF=16, MAXFR=32, KNEW=K,
            delta_xy=0.1, delta_theta=0.1, log_chi2=False)[0], ds)
    print(f"inc_bundle_fast x8 nochi2 /step: {ms/8:8.3f} ms", flush=True)
    ds = out

    pkb32 = jnp.stack([dead_packed(16, 32)] * 32)
    ms, out = chain(
        lambda d: inc.inc_bundle_fast(
            d, pkb32, MAXAFF=16, MAXFR=32, KNEW=K,
            delta_xy=0.1, delta_theta=0.1, log_chi2=False)[0], ds, n=5)
    print(f"inc_bundle_fast x32 nochi2 /step:{ms/32:8.3f} ms", flush=True)
    ds = out

    # chi2 decomposition: gathers vs eval
    from aprilsam_tpu.factors import eval_xyt

    @jax.jit
    def chi2_gather_only(ds):
        sa = ds.state[jnp.clip(ds.xyt_a, 0, NCAP - 1)]
        sb = ds.state[jnp.clip(ds.xyt_b, 0, NCAP - 1)]
        return sa.sum() + sb.sum()

    for _ in range(3):
        o = chi2_gather_only(ds)
    jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(20):
        o = chi2_gather_only(ds)
    jax.block_until_ready(o)
    print(f"chi2 gathers only:            "
          f"{(time.perf_counter()-t0)/20*1e3:8.3f} ms", flush=True)

    for MAXAFF in (16, 64, 256):
        pk = dead_packed(MAXAFF, 32)
        ms, out = chain(
            lambda d, pk=pk, MA=MAXAFF: inc.inc_step_full(
                d, pk, MAXAFF=MA, MAXFR=32, KNEW=K, PANEL=128, NPANB=4,
                delta_xy=0.1, delta_theta=0.1, log_chi2=True)[0], ds, n=5)
        print(f"inc_step_full {MAXAFF:3d}/32/4:      {ms:8.3f} ms", flush=True)
        ds = out

    # ---- 3. truncated sub-bodies of the full path at MAXAFF=256
    MAXAFF, MAXFR = 256, 32
    off_i, _ = inc.ints_layout(MAXAFF, MAXFR, K)
    off_f, _ = inc.floats_layout(K)
    pk = dead_packed(MAXAFF, MAXFR)

    def trunc_frontal(ds, packed):
        ints, floats, ridx = inc._unpack_plan(
            packed, MAXAFF, MAXFR, K, BCAP, dtype)
        ds2, R_up, y_new, rv, sv, spd, _ = inc._frontal_core(
            ds, ints, floats, ridx, off_i, off_f, MAXAFF, K)
        return ds2

    from functools import partial as _p

    jf = jax.jit(trunc_frontal, donate_argnames=("ds",))
    ms, out = chain(lambda d: jf(d, pk), ds, n=5)
    print(f"frontal_core only 256:        {ms:8.3f} ms", flush=True)
    ds = out

    # panel sweep only (NPANB=4), reading resident R
    PANEL, NPANB = 128, 4
    eye_p = jnp.eye(3 * PANEL, dtype=dtype)

    @jax.jit
    def sweep_only(ds):
        n = ds.nnodes
        xb = jnp.zeros((NCAP + 1, 3), dtype=dtype)

        def panel_body(xb, j_rev):
            j = NPANB - 1 - j_rev
            p0 = j * PANEL
            rows = jax.lax.dynamic_slice_in_dim(ds.R_blocks, p0, PANEL, 0)
            idx = jax.lax.dynamic_slice_in_dim(ds.R_idx, p0, PANEL, 0)
            yp = jax.lax.dynamic_slice_in_dim(ds.y, p0, PANEL, 0)
            beyond = idx >= (p0 + PANEL)
            xg = xb[jnp.clip(idx, 0, NCAP)]
            acc = jnp.einsum("pbij,pbj->pi", rows,
                             jnp.where(beyond[..., None], xg, 0.0))
            rhs = (yp - acc).reshape(-1)
            prow = p0 + jnp.arange(PANEL, dtype=jnp.int32)
            active = jnp.repeat(prow < n, 3)
            inpan = (idx >= p0) & (idx < p0 + PANEL)
            oh = jax.nn.one_hot(jnp.where(inpan, idx - p0, 0), PANEL,
                                dtype=dtype) * inpan[..., None]
            T = jnp.einsum("pbij,pbc->pcij", rows, oh)
            Td = T.transpose(0, 2, 1, 3).reshape(3 * PANEL, 3 * PANEL)
            Td = Td + jnp.where(active, 0.0, 1.0) * eye_p
            xp = jax.scipy.linalg.solve_triangular(
                Td, jnp.where(active, rhs, 0.0), lower=False)
            xb = jax.lax.dynamic_update_slice_in_dim(
                xb, xp.reshape(PANEL, 3), p0, 0)
            return xb, None

        xb, _ = jax.lax.scan(panel_body, xb, jnp.arange(NPANB))
        return xb.sum()

    for _ in range(2):
        o = sweep_only(ds)
    jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(10):
        o = sweep_only(ds)
    jax.block_until_ready(o)
    print(f"panel sweep only (4 panels):  {(time.perf_counter()-t0)/10*1e3:8.3f} ms",
          flush=True)

    # chi2
    jc = jax.jit(state_chi2)
    for _ in range(2):
        o = jc(ds)
    jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(10):
        o = jc(ds)
    jax.block_until_ready(o)
    print(f"state_chi2:                   {(time.perf_counter()-t0)/10*1e3:8.3f} ms",
          flush=True)


if __name__ == "__main__":
    main()
