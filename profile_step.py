"""TPU step-phase profiler: times each kernel specialization at its real
M3500 shapes, plus raw dispatch overhead, to rank optimization targets.

Usage: python profile_step.py [--steps N]
"""

from __future__ import annotations

import argparse
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
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=400)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from aprilsam_tpu.utils import enable_compilation_cache, setup_precision

    enable_compilation_cache()
    setup_precision()
    platform = jax.devices()[0].platform
    print(f"platform: {platform}")

    # ---------------- raw dispatch overhead
    @jax.jit
    def nop(x):
        return x + 1.0

    x = jnp.zeros(8)
    print(f"nop dispatch+sync:        {t_it(nop, x, n=50):8.3f} ms")

    @jax.jit
    def nop_chain(x):
        for _ in range(8):
            x = x + 1.0
        return x

    def chain8(x):
        for _ in range(8):
            x = nop(x)
        return x

    print(f"8 async dispatches+sync:  {t_it(chain8, x, n=50):8.3f} ms")

    # ---------------- QR / linalg at frontal shapes
    for M in (16, 64, 256):
        K3 = 3 * M
        rows = K3 + 48
        C = jnp.asarray(np.random.randn(rows, K3), dtype=jnp.float32)
        qr = jax.jit(lambda c: jnp.linalg.qr(c, mode="reduced"))
        ms = t_it(qr, C, n=10)
        print(f"qr[{rows}x{K3}]:            {ms:8.3f} ms")
        gram = jax.jit(lambda c: jnp.linalg.cholesky(c.T @ c + 1e-6 * jnp.eye(K3)))
        ms = t_it(gram, C, n=10)
        print(f"cholqr[{rows}x{K3}]:        {ms:8.3f} ms")

    # triangular solve at panel shape
    PANEL = 128
    T = jnp.asarray(np.triu(np.random.rand(3 * PANEL, 3 * PANEL) + 3 * np.eye(3 * PANEL)),
                    dtype=jnp.float32)
    st = jax.jit(lambda a: jax.scipy.linalg.solve_triangular(a, a[:, 0], lower=False))
    print(f"trisolve[{3*PANEL}]:          {t_it(st, T, n=10):8.3f} ms")
    ti = jax.jit(lambda a: jnp.linalg.inv(a))
    print(f"inv[{3*PANEL}]:               {t_it(ti, T, n=10):8.3f} ms")

    # ---------------- real solver kernels on a live M3500 prefix
    from aprilsam_tpu.io import load_g2o_text
    from aprilsam_tpu.replay import Replay
    from aprilsam_tpu.solver import SolverConfig
    from aprilsam_tpu.solver.state import state_chi2

    cfg = SolverConfig(
        dtype=np.float32, node_capacity=4096, factor_capacity=8192,
        row_block_capacity=96, panel_nodes=128, wallclock_gate=False,
        policy_lag=8, bundle_size=8)
    loaded = load_g2o_text("/root/reference/data/M3500.txt")

    # warmup exactly like bench.py: compile every specialization in-process
    warm = Replay(loaded, cfg, batch_update_only=False, deferred=True)
    warm.run(max_steps=60)
    warm.solver.precompile()
    del warm

    rep = Replay(loaded, cfg, batch_update_only=False, deferred=True)

    # instrument: wrap dispatches with sync timing
    solver = rep.solver
    orig_one = solver._dispatch_one
    orig_queue = solver._dispatch_queue
    times: dict = {}

    def rec(key, ms, k=1):
        c, s = times.get(key, (0, 0.0))
        times[key] = (c + k, s + ms)

    def timed_one(plan, sig):
        t0 = time.perf_counter()
        stats = orig_one(plan, sig)
        jax.block_until_ready(stats)
        rec(("one",) + sig, (time.perf_counter() - t0) * 1e3)
        return stats

    def timed_queue():
        k = len(solver._queue)
        sig = solver._queue_sig
        if not k:
            return orig_queue()
        t0 = time.perf_counter()
        out = orig_queue()
        jax.block_until_ready(solver.ds.state)
        rec(("bundle",) + (sig or ("?",)), (time.perf_counter() - t0) * 1e3, k)
        return out

    plan_time = [0.0, 0]
    import aprilsam_tpu.solver.incremental as inc
    orig_plan = inc.plan_step

    def timed_plan(*a, **kw):
        t0 = time.perf_counter()
        out = orig_plan(*a, **kw)
        plan_time[0] += (time.perf_counter() - t0) * 1e3
        plan_time[1] += 1
        return out

    solver._dispatch_one = timed_one
    solver._dispatch_queue = timed_queue
    inc.plan_step = timed_plan

    t0 = time.perf_counter()
    n = 0
    while n < args.steps:
        res = rep.step()
        if res is None:
            break
        n += 1
    rep.finish()
    total = (time.perf_counter() - t0) * 1e3
    print(f"\nreplay prefix: {n} steps in {total:.1f} ms "
          f"({total/max(n,1):.2f} ms/step)")
    if plan_time[1]:
        print(f"host plan_step: {plan_time[0]/plan_time[1]:.3f} ms/call "
              f"x {plan_time[1]} calls = {plan_time[0]:.1f} ms total")
    for key in sorted(times, key=lambda k: -times[k][1]):
        c, s = times[key]
        print(f"  {str(key):42s} {c:5d} steps  {s:9.1f} ms total  "
              f"{s/max(c,1):8.2f} ms/step")

    # chi2 kernel alone
    ms = t_it(jax.jit(state_chi2), solver.ds, n=20)
    print(f"\nstate_chi2 (full table):  {ms:8.3f} ms")


if __name__ == "__main__":
    main()
