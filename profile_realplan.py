"""Settle the dead-plan vs real-plan dispatch mystery: capture real plans and
solver state mid-replay, then tight-loop the same dispatches outside the
replay context."""

import copy
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from aprilsam_tpu.utils import enable_compilation_cache, setup_precision

    enable_compilation_cache()
    setup_precision()

    from aprilsam_tpu.io import load_g2o_text
    from aprilsam_tpu.replay import Replay
    from aprilsam_tpu.solver import SolverConfig
    from aprilsam_tpu.solver import incremental as I

    cfg = SolverConfig(dtype=np.float32, node_capacity=4096,
                       factor_capacity=8192, row_block_capacity=96,
                       panel_nodes=128, wallclock_gate=False,
                       policy_lag=8, bundle_size=8)
    loaded = load_g2o_text("/root/reference/data/M3500.txt")
    rep = Replay(loaded, cfg, batch_update_only=False, deferred=True)

    plans = {}
    orig_plan = I.plan_step

    def capture(*a, **kw):
        p = orig_plan(*a, **kw)
        if p is not None:
            plans.setdefault((p.MAXAFF, p.MAXFR), []).append(p)
        return p

    I.plan_step = capture
    n = 0
    t0 = time.perf_counter()
    while n < 400:
        if rep.step() is None:
            break
        n += 1
    rep.solver._dispatch_queue()
    jax.block_until_ready(rep.solver.ds.state)
    I.plan_step = orig_plan
    print(f"replay prefix wall: {(time.perf_counter()-t0):.1f} s")

    s = rep.solver
    K = cfg.new_factor_capacity

    # snapshot ds so donation doesn't eat the real state
    import jax.tree_util as jtu

    ds0 = jtu.tree_map(lambda x: jnp.copy(x), s.ds)

    def timeit(name, fn, n=20):
        fn()
        jax.block_until_ready(s.ds.state)
        t0 = time.perf_counter()
        for _ in range(n):
            fn()
        jax.block_until_ready(s.ds.state)
        print(f"{name:48s} {(time.perf_counter()-t0)/n*1e3:8.2f} ms")

    fast_plans = plans.get((16, 32), [])
    print(f"captured fast plans: {len(fast_plans)}")
    preal = fast_plans[len(fast_plans) // 2]
    sig_fast = ("fast", 16, 32)

    timeit("single fast dispatch (REAL plan, real ds)",
           lambda: s._dispatch_one(preal, sig_fast))

    def bundle8_real():
        s._queue_sig = sig_fast
        s._queue = fast_plans[:8]
        s._dispatch_queue()
        s._pending.clear()

    timeit("fast bundle of 8 (REAL plans, real ds)", bundle8_real)

    # dead plan on the REAL ds
    _, LI = I.ints_layout(16, 32, K)
    _, LF = I.floats_layout(K)
    pdead = I.StepPlan(
        m=0, naffected=0, MAXAFF=16, MAXFR=32, fringe_overflow=False,
        ints=np.zeros(LI, dtype=np.int32),
        floats=np.zeros(LF, dtype=np.float64),
        maps=np.full((3, 16, 96), -1, dtype=np.int32),
        fringe_fc=np.full((32, 96), -1, dtype=np.int32))
    timeit("single fast dispatch (dead plan, real ds)",
           lambda: s._dispatch_one(pdead, sig_fast))

    # full path with a real full plan
    for key in sorted(plans):
        if key == (16, 32):
            continue
        fp = plans[key][-1]
        sig = ("full", fp.MAXAFF, fp.MAXFR, s._npanb(int(s.ds.nnodes)))
        timeit(f"single full dispatch (REAL plan M={fp.MAXAFF})",
               lambda: s._dispatch_one(fp, sig))


def gil_test():
    """Does host-side pure-python work between dispatches stall the device?"""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import time as _t

    from aprilsam_tpu.utils import enable_compilation_cache, setup_precision

    enable_compilation_cache()
    setup_precision()
    from aprilsam_tpu.solver import SolverConfig
    from aprilsam_tpu.solver import incremental as I

    cfg = SolverConfig(dtype=np.float32, node_capacity=4096,
                       factor_capacity=8192, row_block_capacity=96,
                       panel_nodes=128, wallclock_gate=False,
                       policy_lag=8, bundle_size=8)
    s = I.IncrementalSolver(cfg)
    K = cfg.new_factor_capacity
    _, LI = I.ints_layout(16, 32, K)
    _, LF = I.floats_layout(K)
    pdead = I.StepPlan(
        m=0, naffected=0, MAXAFF=16, MAXFR=32, fringe_overflow=False,
        ints=np.zeros(LI, dtype=np.int32),
        floats=np.zeros(LF, dtype=np.float64),
        maps=np.full((3, 16, 96), -1, dtype=np.int32),
        fringe_fc=np.full((32, 96), -1, dtype=np.int32))
    sig = ("fast", 16, 32)
    s._dispatch_one(pdead, sig)
    jax.block_until_ready(s.ds.state)

    def burn(ms):
        t0 = _t.perf_counter()
        x = 0
        while (_t.perf_counter() - t0) * 1e3 < ms:
            x += 1
        return x

    for burn_ms in (0.0, 0.5, 1.0, 2.0):
        t0 = _t.perf_counter()
        n = 20
        for _ in range(n):
            if burn_ms:
                burn(burn_ms)
            s._dispatch_one(pdead, sig)
            jax.block_until_ready(s.ds.state)
        dt = (_t.perf_counter() - t0) / n * 1e3
        print(f"burn {burn_ms:4.1f} ms + dispatch+block: {dt:8.2f} ms")

    # d2h drain interleave
    t0 = _t.perf_counter()
    n = 20
    for _ in range(n):
        st = s._dispatch_one(pdead, sig)
        np.asarray(st)
    dt = (_t.perf_counter() - t0) / n * 1e3
    print(f"dispatch + np.asarray(stats):        {dt:8.2f} ms")


if __name__ == "__main__":
    import sys
    if "--gil" in sys.argv:
        gil_test()
    else:
        main()
