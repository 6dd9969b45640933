"""Isolate per-dispatch overhead of the real step executables: donation,
fresh h2d uploads, executable alternation, bundling."""

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from aprilsam_tpu.utils import enable_compilation_cache, setup_precision

    enable_compilation_cache()
    setup_precision()

    from aprilsam_tpu.solver import SolverConfig
    from aprilsam_tpu.solver import incremental as I
    from aprilsam_tpu.solver.state import init_device_state

    cfg = SolverConfig(dtype=np.float32, node_capacity=4096,
                       factor_capacity=8192, row_block_capacity=96,
                       panel_nodes=128, wallclock_gate=False,
                       policy_lag=8, bundle_size=8)
    K = cfg.new_factor_capacity
    BCAP = cfg.row_block_capacity

    def dead_plan(MAXAFF, MAXFR):
        _, LI = I.ints_layout(MAXAFF, MAXFR, K)
        _, LF = I.floats_layout(K)
        return I.StepPlan(
            m=0, naffected=0, MAXAFF=MAXAFF, MAXFR=MAXFR,
            fringe_overflow=False,
            ints=np.zeros(LI, dtype=np.int32),
            floats=np.zeros(LF, dtype=np.float64),
            maps=np.full((3, MAXAFF, BCAP), -1, dtype=np.int32),
            fringe_fc=np.full((MAXFR, BCAP), -1, dtype=np.int32))

    s = I.IncrementalSolver(cfg)
    pf = dead_plan(16, 32)
    sig_fast = ("fast", 16, 32)
    sig_full = ("full", 16, 32, 32)

    # warm compile both
    s._dispatch_one(pf, sig_fast)
    s._dispatch_one(pf, sig_full)
    s._queue_sig = sig_fast
    s._queue = [pf] * 8
    s._dispatch_queue()
    s._pending.clear()
    jax.block_until_ready(s.ds.state)

    def timeit(name, fn, n=20):
        fn()
        jax.block_until_ready(s.ds.state)
        t0 = time.perf_counter()
        for _ in range(n):
            fn()
        jax.block_until_ready(s.ds.state)
        print(f"{name:44s} {(time.perf_counter()-t0)/n*1e3:8.2f} ms")

    timeit("single fast dispatch (fresh uploads)",
           lambda: s._dispatch_one(pf, sig_fast))

    # pre-uploaded args, direct jit call
    ints_d = jnp.asarray(pf.ints)
    flts_d = jnp.asarray(pf.floats.astype(cfg.dtype))
    maps_d = jnp.asarray(pf.maps)
    ffc_d = jnp.asarray(pf.fringe_fc)

    def direct():
        s.ds, st = I.inc_step_fast(
            s.ds, ints_d, flts_d, maps_d, ffc_d,
            MAXAFF=16, MAXFR=32, KNEW=K, delta_xy=0.1, delta_theta=0.1)
        return st

    timeit("single fast dispatch (device-resident args)", direct)

    timeit("single full dispatch NPANB=32 (fresh uploads)",
           lambda: s._dispatch_one(pf, sig_full))

    def alt():
        s._dispatch_one(pf, sig_fast)
        s._dispatch_one(pf, sig_full)

    timeit("alternate fast/full (2 dispatches)", alt, n=10)

    def bundle8():
        s._queue_sig = sig_fast
        s._queue = [pf] * 8
        s._dispatch_queue()
        s._pending.clear()

    timeit("fast bundle of 8 (per bundle)", bundle8)

    # block-every-call vs block-at-end for the direct call
    def direct_block():
        st = direct()
        jax.block_until_ready(st)

    timeit("single fast, block on stats each call", direct_block)


if __name__ == "__main__":
    main()
