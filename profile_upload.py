"""Poisoned-mode upload strategies + full-body fixed-cost bisection."""

from __future__ import annotations

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from aprilsam_tpu.utils import enable_compilation_cache, setup_precision

    enable_compilation_cache()
    setup_precision()
    print(f"platform: {jax.devices()[0].platform}", flush=True)

    z = jnp.zeros(4)
    jax.block_until_ready(z)
    t0 = time.perf_counter()
    _ = np.asarray(z)
    print(f"first d2h: {(time.perf_counter()-t0):.1f} s", flush=True)

    # ---------------- upload strategies
    a1 = np.zeros(300, np.int32)
    a2 = np.zeros(200, np.float32)
    a3 = np.full((3, 16, 96), -1, np.int32)
    a4 = np.full((32, 96), -1, np.int32)

    def t(fn, n=20):
        for _ in range(2):
            out = fn()
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        outs = [fn() for _ in range(n)]
        jax.block_until_ready(outs[-1])
        return (time.perf_counter() - t0) / n * 1e3

    print(f"4 separate jnp.asarray:   {t(lambda: [jnp.asarray(a) for a in (a1, a2, a3, a4)][-1]):8.3f} ms", flush=True)
    print(f"device_put(tuple of 4):   {t(lambda: jax.device_put((a1, a2, a3, a4))[-1]):8.3f} ms", flush=True)
    merged = np.zeros(300 + 200 + 3 * 16 * 96 + 32 * 96, np.int32)
    print(f"1 merged jnp.asarray:     {t(lambda: jnp.asarray(merged)):8.3f} ms", flush=True)
    big = np.zeros((8, merged.size), np.int32)
    print(f"1 merged x8 (bundle):     {t(lambda: jnp.asarray(big)):8.3f} ms", flush=True)

    # does a jitted identity on an uploaded arg differ (committed vs not)?
    idf = jax.jit(lambda x: x)
    print(f"jit(identity)(np array):  {t(lambda: idf(merged)):8.3f} ms", flush=True)

    # ---------------- full-body bisection on a live state
    from aprilsam_tpu.io import load_g2o_text
    from aprilsam_tpu.replay import Replay
    from aprilsam_tpu.solver import SolverConfig

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
    print("state built", flush=True)

    NCAP = cfg.node_capacity
    BCAP = cfg.row_block_capacity
    dtype = jnp.float32
    PANEL = 128

    def chain_scalar(fn, n=30):
        s = jnp.float32(0.0)
        s = fn(s)
        jax.block_until_ready(s)
        t0 = time.perf_counter()
        for _ in range(n):
            s = fn(s)
        jax.block_until_ready(s)
        return (time.perf_counter() - t0) / n * 1e3

    # panel sweep alone (NPANB = 2 and 8)
    for NPANB in (2, 8):
        @jax.jit
        def sweep(s):
            n = ds.nnodes
            xb = jnp.zeros((NCAP + 1, 3), dtype=dtype) + s * 0
            eye_p = jnp.eye(3 * PANEL, dtype=dtype)

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
            return s + xb.sum()

        print(f"panel sweep NPANB={NPANB}:      {chain_scalar(sweep):8.3f} ms",
              flush=True)

    # sweep variant WITHOUT the triangular solve (Tinv matmul placeholder)
    NPANB = 8

    @jax.jit
    def sweep_nosolve(s):
        xb = jnp.zeros((NCAP + 1, 3), dtype=dtype) + s * 0

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
            xp = rhs * 0.5  # stand-in for Tinv @ rhs
            xb = jax.lax.dynamic_update_slice_in_dim(
                xb, xp.reshape(PANEL, 3), p0, 0)
            return xb, None

        xb, _ = jax.lax.scan(panel_body, xb, jnp.arange(NPANB))
        return s + xb.sum()

    print(f"sweep no-solve NPANB=8:   {chain_scalar(sweep_nosolve):8.3f} ms",
          flush=True)

    # single trisolve 384 inside a 8-iter scan
    T384 = jnp.asarray(
        np.triu(np.random.rand(384, 384) + 3 * np.eye(384)), dtype=dtype)

    @jax.jit
    def scan_trisolve(s):
        def body(c, _):
            c = jax.scipy.linalg.solve_triangular(T384, c, lower=False)
            return c, None

        c, _ = jax.lax.scan(body, jnp.ones(384, dtype) * s, jnp.arange(8))
        return c.sum()

    print(f"8x chained trisolve384:   {chain_scalar(scan_trisolve):8.3f} ms",
          flush=True)

    @jax.jit
    def scan_matmul(s):
        def body(c, _):
            c = T384 @ c
            return c * 1e-3, None

        c, _ = jax.lax.scan(body, jnp.ones(384, dtype) * s, jnp.arange(8))
        return c.sum()

    print(f"8x chained matvec384:     {chain_scalar(scan_matmul):8.3f} ms",
          flush=True)

    # NCAP-wide tail (relin + state update over all nodes)
    from aprilsam_tpu.geometry import mod2pi

    @jax.jit
    def tail(s):
        dx = ds.delta_X + s * 0
        valid = jnp.arange(NCAP, dtype=jnp.int32) < ds.nnodes
        relin = ((jnp.abs(dx[:, 0]) > 0.1) | (jnp.abs(dx[:, 1]) > 0.1)
                 | (jnp.abs(dx[:, 2]) > 0.1)) & valid
        newly = relin & ~ds.relinearized
        so = jnp.sum(newly).astype(jnp.int32)
        ok = valid & ~jnp.any(jnp.isnan(dx), axis=1)
        ns = jnp.where(ok[:, None], ds.l_point + dx, ds.state)
        ns = ns.at[:, 2].set(jnp.where(ok, mod2pi(ns[:, 2]), ns[:, 2]))
        return s + ns.sum() + so

    print(f"NCAP tail:                {chain_scalar(tail):8.3f} ms", flush=True)

    # frontal core alone at M=16 via fast path minus everything else is hard;
    # approximate: QR + gathers at M=16 on live data
    F_pos = jnp.arange(16, dtype=jnp.int32) + 800

    @jax.jit
    def frontal(s):
        rows = ds.R_blocks[jnp.clip(F_pos, 0, NCAP - 1)]
        gfc = jnp.where(ds.R_idx[F_pos] < NCAP, 1, -1)
        oh = jax.nn.one_hot(jnp.clip(gfc, 0, 16), 16, dtype=dtype)
        RF = jnp.einsum("rbij,rbc->rcij", rows, oh)
        Rd = RF.transpose(0, 2, 1, 3).reshape(48, 48) + jnp.eye(48, dtype)
        C = jnp.concatenate([Rd, jnp.ones((96, 48), dtype) * s], axis=0)
        Q, Rq = jnp.linalg.qr(C, mode="reduced")
        return s + Rq.sum() * 1e-6

    print(f"frontal gather+QR M=16:   {chain_scalar(frontal):8.3f} ms",
          flush=True)


if __name__ == "__main__":
    main()
