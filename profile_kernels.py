"""True kernel-execution times in the poisoned (post-first-d2h) regime:
per-kernel amortized timing via long async chains, separating round-trip
latency from device execution."""

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

    # ---- enter poisoned mode deliberately (one tiny readback)
    z = jnp.zeros(4)
    jax.block_until_ready(z)
    t0 = time.perf_counter()
    _ = np.asarray(z)
    print(f"first d2h: {(time.perf_counter()-t0):.1f} s", flush=True)

    @jax.jit
    def nop(x):
        return x + 1.0

    x = jnp.zeros(8)
    nop(x)

    def lat(n=50):
        nonlocal x
        jax.block_until_ready(x)
        t0 = time.perf_counter()
        for _ in range(n):
            x = nop(x)
        jax.block_until_ready(x)
        return (time.perf_counter() - t0) / n * 1e3

    L = lat()
    print(f"poisoned dispatch latency: {L:.3f} ms", flush=True)

    # ---- build a mid-trajectory state WITHOUT further readbacks
    from aprilsam_tpu.io import load_g2o_text
    from aprilsam_tpu.replay import Replay
    from aprilsam_tpu.solver import SolverConfig

    cfg = SolverConfig(
        dtype=np.float32, node_capacity=4096, factor_capacity=8192,
        row_block_capacity=96, panel_nodes=128, wallclock_gate=False,
        policy_lag=8, bundle_size=8)
    loaded = load_g2o_text("/root/reference/data/M3500.txt")
    rep = Replay(loaded, cfg, batch_update_only=False, deferred=True)
    t0 = time.perf_counter()
    for _ in range(900):
        rep.step()
    rep.solver._dispatch_queue()
    jax.block_until_ready(rep.solver.ds.state)
    print(f"900-step replay: {(time.perf_counter()-t0):.1f} s", flush=True)
    solver = rep.solver
    ds = solver.ds

    from aprilsam_tpu.solver.incremental import (
        inc_step_fast, inc_step_full, inc_bundle_fast, inc_bundle_full,
        ints_layout, floats_layout)
    from aprilsam_tpu.solver.state import state_chi2

    KNEW = cfg.new_factor_capacity
    BCAP = cfg.row_block_capacity

    def mk_args(MAXAFF, MAXFR, B=None):
        _, LI = ints_layout(MAXAFF, MAXFR, KNEW)
        _, LF = floats_layout(KNEW)
        if B is None:
            return (jnp.asarray(np.zeros(LI, np.int32)),
                    jnp.asarray(np.zeros(LF, np.float32)),
                    jnp.asarray(np.full((3, MAXAFF, BCAP), -1, np.int32)),
                    jnp.asarray(np.full((MAXFR, BCAP), -1, np.int32)))
        return (jnp.asarray(np.zeros((B, LI), np.int32)),
                jnp.asarray(np.zeros((B, LF), np.float32)),
                jnp.asarray(np.full((B, 3, MAXAFF, BCAP), -1, np.int32)),
                jnp.asarray(np.full((B, MAXFR, BCAP), -1, np.int32)))

    def chain(fn, ds0, n=30):
        """Amortized per-call time over an n-long donation chain."""
        out, stats = fn(ds0)
        jax.block_until_ready(out.state)
        t0 = time.perf_counter()
        for _ in range(n):
            out, stats = fn(out)
        jax.block_until_ready(out.state)
        return (time.perf_counter() - t0) / n * 1e3, out

    cur = ds
    # fast single
    a = mk_args(16, 32)
    f = lambda d: inc_step_fast(d, *a, MAXAFF=16, MAXFR=32, KNEW=KNEW,
                                delta_xy=0.1, delta_theta=0.1)
    ms, cur = chain(f, cur)
    print(f"fast single (dead):        {ms:8.3f} ms", flush=True)

    # fast bundle of 8
    ab = mk_args(16, 32, B=8)
    f = lambda d: inc_bundle_fast(d, *ab, MAXAFF=16, MAXFR=32, KNEW=KNEW,
                                  delta_xy=0.1, delta_theta=0.1)
    ms, cur = chain(f, cur, n=15)
    print(f"fast bundle8 (dead):       {ms:8.3f} ms  ({ms/8:.3f}/step)",
          flush=True)

    # full single at NPANB = 8
    for npanb in (2, 8):
        a = mk_args(16, 32)
        f = lambda d: inc_step_full(d, *a, MAXAFF=16, MAXFR=32, KNEW=KNEW,
                                    PANEL=128, NPANB=npanb,
                                    delta_xy=0.1, delta_theta=0.1)
        ms, cur = chain(f, cur, n=10)
        print(f"full single NPANB={npanb} (dead): {ms:8.3f} ms", flush=True)

    # full bundle of 8 at NPANB=8
    ab = mk_args(64, 32, B=8)
    f = lambda d: inc_bundle_full(d, *ab, MAXAFF=64, MAXFR=32, KNEW=KNEW,
                                  PANEL=128, NPANB=8,
                                  delta_xy=0.1, delta_theta=0.1)
    ms, cur = chain(f, cur, n=8)
    print(f"full bundle8 M=64 NPANB=8: {ms:8.3f} ms  ({ms/8:.3f}/step)",
          flush=True)

    # chi2 alone, amortized chain
    cj = jax.jit(lambda d, s: s + state_chi2(d))
    s = jnp.float32(0.0)
    s = cj(cur, s)
    jax.block_until_ready(s)
    t0 = time.perf_counter()
    for _ in range(50):
        s = cj(cur, s)
    jax.block_until_ready(s)
    print(f"state_chi2 chained:        {(time.perf_counter()-t0)/50*1e3:8.3f} ms",
          flush=True)

    # uploads in poisoned mode (plan-sized)
    for shape, name in [((278,), "ints"), ((3, 16, 96), "maps16"),
                        ((3, 64, 96), "maps64"), ((8, 3, 16, 96), "maps16x8")]:
        arr = np.zeros(shape, dtype=np.int32)
        t0 = time.perf_counter()
        for _ in range(20):
            h = jnp.asarray(arr)
        jax.block_until_ready(h)
        print(f"h2d {name:10s} ({arr.nbytes//1024:4d} KiB): "
              f"{(time.perf_counter()-t0)/20*1e3:8.3f} ms", flush=True)

    print(f"dispatch latency after all: {lat():.3f} ms", flush=True)


if __name__ == "__main__":
    main()
