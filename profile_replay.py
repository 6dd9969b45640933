"""Host-side dissection of the real M3500 replay: where does dispatch-side
time go?  Wraps the incremental solver's plan/pack/dispatch/batch phases
with wall timers (no extra device syncs) and reports per-phase totals plus
bundle fragmentation stats.  Run on TPU (default) or CPU.
"""

from __future__ import annotations

import collections
import json
import time

import numpy as np


def main():
    import jax

    from aprilsam_tpu.utils import enable_compilation_cache, setup_precision

    enable_compilation_cache()
    setup_precision()
    platform = jax.devices()[0].platform
    print(f"platform: {platform}", flush=True)

    from aprilsam_tpu.io import load_g2o_text
    from aprilsam_tpu.replay import Replay
    from aprilsam_tpu.solver import SolverConfig
    from aprilsam_tpu.solver import incremental as I

    # surface any mid-run compile (each costs 10-25 s through the relay's
    # remote compile server) in the log
    jax.config.update("jax_log_compiles", True)

    loaded = load_g2o_text("/root/reference/data/M3500.txt")
    cfg = SolverConfig(
        dtype=np.float64 if platform == "cpu" else np.float32,
        node_capacity=4096, factor_capacity=8192, row_block_capacity=96,
        panel_nodes=128, wallclock_gate=False, policy_lag=16,
        bundle_size=32, policy_poll=64, log_chi2=False,
        batch_backend="auto" if platform == "cpu" else "device",
        coalesce_full_solves=True,
    )
    if platform == "cpu":
        jax.config.update("jax_enable_x64", True)

    T = collections.defaultdict(float)
    C = collections.defaultdict(int)

    orig_plan = I.plan_step

    def timed_plan(*a, **k):
        t0 = time.perf_counter()
        out = orig_plan(*a, **k)
        T["plan"] += time.perf_counter() - t0
        C["plan"] += 1
        return out

    I.plan_step = timed_plan

    warm = Replay(loaded, cfg, batch_update_only=False, deferred=True)
    warm.run(max_steps=60)
    warm.solver.precompile(nnodes=loaded.nnodes)
    # mirror bench.py's batch-epoch kernel warmup exactly
    from aprilsam_tpu.solver.state import init_device_state

    if cfg.batch_backend == "device":
        from aprilsam_tpu.solver.batch import precompile_device_batch

        precompile_device_batch(init_device_state(cfg), cfg, loaded.nnodes)
    else:
        from aprilsam_tpu.solver.host_batch import precompile_expand

        precompile_expand(init_device_state(cfg), cfg, loaded.nnodes,
                          log_modes=(0, 2))
    print("warmup done", flush=True)
    del warm
    for k in list(T):
        del T[k]
    for k in list(C):
        del C[k]

    rep = Replay(loaded, cfg, batch_update_only=False, deferred=True)
    s = rep.solver

    orig_dq = s._dispatch_queue
    orig_do = s._dispatch_one
    orig_rb = s._run_batch
    orig_drain = s._drain_pending

    def timed_dq():
        k = len(s._queue)
        sig = s._queue_sig
        t0 = time.perf_counter()
        out = orig_dq()
        dt = time.perf_counter() - t0
        if k:
            T["dispatch_queue"] += dt
            C[f"bundle_k{min(k, cfg.bundle_size)}"] += 1
            C["bundles"] += 1
            C["bundle_slots"] += k
            if sig:
                C[f"bundle_{sig[0]}_{sig[1]}"] += 1
        return out

    def timed_do(plan, sig):
        t0 = time.perf_counter()
        out = orig_do(plan, sig)
        T["dispatch_one"] += time.perf_counter() - t0
        C["singles"] += 1
        C[f"single_{'_'.join(map(str, sig))}"] += 1
        return out

    def timed_rb(g, **kw):
        t0 = time.perf_counter()
        out = orig_rb(g, **kw)
        T["batch"] += time.perf_counter() - t0
        C["batch"] += 1
        return out

    def timed_drain(g, block_all=False):
        t0 = time.perf_counter()
        out = orig_drain(g, block_all=block_all)
        T["drain"] += time.perf_counter() - t0
        return out

    s._dispatch_queue = timed_dq
    s._dispatch_one = timed_do
    s._run_batch = timed_rb
    s._drain_pending = timed_drain

    t0 = time.perf_counter()
    n = 0
    seg0 = t0
    prev = t0
    while True:
        res = rep.step()
        if res is None:
            break
        n += 1
        now = time.perf_counter()
        if now - prev > 1.0:
            print(f"OUTLIER step {n}: {(now - prev):.2f}s "
                  f"path={s.last_path} naff={s.last_naffected}", flush=True)
        prev = now
        if n % 500 == 0:
            print(f"steps {n}: seg {(now - seg0) / 500 * 1e3:6.2f} ms/step",
                  flush=True)
            seg0 = now
    rep.solver.flush(rep.graph)
    jax.block_until_ready(rep.solver.ds.state)
    total = time.perf_counter() - t0

    print(f"\ntotal: {total:.2f}s = {n / total:.1f} poses/s")
    acc = 0.0
    for k in sorted(T, key=lambda k: -T[k]):
        print(f"  {k:16s} {T[k]:8.2f}s  ({T[k] / total * 100:5.1f}%)")
        acc += T[k]
    print(f"  {'other (loop)':16s} {total - acc:8.2f}s")
    print("\ncounts:", json.dumps(dict(sorted(C.items())), indent=1))
    I.plan_step = orig_plan


if __name__ == "__main__":
    main()
