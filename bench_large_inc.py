"""Large-N incremental replay on a synthetic Manhattan world.

Demonstrates the unbounded-N contract of the reference (realloc growth,
aprilsam.c:411-450) on the TPU-native engine: node/factor capacities double
on demand, the native planner's windowed fringe scan keeps host planning
O(|F|) per step, and the replay reports a chi2 trace plus planning-time
stats.

Usage:
  python bench_large_inc.py [--poses 20000] [--cpu] [--log_chi2]
                            [--panel_nodes 256] [--checkpoints 10]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np


def _neutralize_cpu_env_and_reexec():
    if "--cpu" not in sys.argv or os.environ.get("_LARGE_INC_CHILD") == "1":
        return
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PALLAS_AXON_POOL_IPS", None)
    parts = [p for p in env.get("PYTHONPATH", "").split(os.pathsep)
             if p and ".axon_site" not in p]
    env["PYTHONPATH"] = os.pathsep.join(parts)
    env["_LARGE_INC_CHILD"] = "1"
    os.execve(sys.executable, [sys.executable] + sys.argv, env)


def main():
    _neutralize_cpu_env_and_reexec()
    ap = argparse.ArgumentParser()
    ap.add_argument("--poses", type=int, default=20000)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--log_chi2", action="store_true")
    ap.add_argument("--closure_prob", type=float, default=0.02)
    ap.add_argument("--panel_nodes", type=int, default=256)
    ap.add_argument("--checkpoints", type=int, default=10,
                    help="periodic off-clock chi2 readbacks")
    ap.add_argument("--start_capacity", type=int, default=4096,
                    help="initial node capacity (growth doubles on demand)")
    ap.add_argument("--sweep_window", type=int, default=16,
                    help="windowed-sweep panel capacity (0 = whole-graph "
                         "sweep per superstep; the pre-r5 behavior)")
    ap.add_argument("--sweep_full_every", type=int, default=16)
    ap.add_argument("--superstep", type=int, default=64)
    ap.add_argument("--policy_lag", type=int, default=3)
    args = ap.parse_args()

    import jax

    from aprilsam_tpu.utils import enable_compilation_cache, setup_precision

    enable_compilation_cache()
    setup_precision()
    platform = jax.devices()[0].platform
    print(f"platform: {platform}", flush=True)
    if platform == "cpu":
        jax.config.update("jax_enable_x64", True)

    from aprilsam_tpu.datasets import manhattan_world
    from aprilsam_tpu.replay import Replay
    from aprilsam_tpu.solver import SolverConfig
    from aprilsam_tpu.solver import incremental as I

    t0 = time.perf_counter()
    g = manhattan_world(args.poses, seed=0, closure_prob=args.closure_prob,
                        block=25, max_closures_per_pose=1)
    print(f"generated {g.nnodes} poses / {g.nfactors} factors "
          f"in {time.perf_counter() - t0:.1f}s", flush=True)

    cfg = SolverConfig(
        dtype=np.float64 if platform == "cpu" else np.float32,
        node_capacity=args.start_capacity,
        factor_capacity=2 * args.start_capacity,
        row_block_capacity=96,
        panel_nodes=args.panel_nodes,
        wallclock_gate=False,
        policy_lag=args.policy_lag, policy_poll=2,
        superstep_size=args.superstep,
        superstep_buckets=(64, 128, 256, 384, 640, 1024),
        sweep_window_panels=args.sweep_window,
        sweep_full_every=args.sweep_full_every,
        log_chi2=bool(args.log_chi2),
        batch_backend="auto" if platform == "cpu" else "panel",
    )

    plan_t = [0.0, 0]
    orig_plan = I.plan_step

    def timed_plan(*a, **k):
        tp = time.perf_counter()
        out = orig_plan(*a, **k)
        plan_t[0] += time.perf_counter() - tp
        plan_t[1] += 1
        return out

    I.plan_step = timed_plan

    rep = Replay(g, cfg, batch_update_only=False, deferred=True)
    ck = max(1, args.poses // max(1, args.checkpoints))
    t0 = time.perf_counter()
    n = 0
    while True:
        res = rep.step()
        if res is None:
            break
        n += 1
        if n % ck == 0:
            # off-clock sanity checkpoint (flushes the pipeline)
            c = rep.solver.chi2()
            el = time.perf_counter() - t0
            print(f"step {n}: chi2 {c:.2f}  {n / el:.1f} poses/s  "
                  f"ncap={rep.solver.cfg.node_capacity}", flush=True)
            assert np.isfinite(c), "chi2 diverged"
    rep.solver.flush(rep.graph)
    jax.block_until_ready(rep.solver.ds.state)
    total = time.perf_counter() - t0

    final_chi2 = rep.solver.chi2()
    mean_plan_ms = plan_t[0] / max(1, plan_t[1]) * 1e3
    if args.log_chi2:
        hist = rep.solver.chi2_history()
        assert len(hist) >= n, "metric ring lost entries"
        print(f"chi2 ring: {len(hist)} entries, last {hist[-1]:.2f}")
    print(json.dumps({
        "metric": "large_inc_replay_poses_per_sec",
        "value": round(n / total, 2),
        "unit": f"poses/s (poses={n}, final_chi2={final_chi2:.2f}, "
                f"platform={platform}, mean_plan_ms={mean_plan_ms:.3f}, "
                f"final_ncap={rep.solver.cfg.node_capacity})",
        "vs_baseline": 0.0,
    }))
    I.plan_step = orig_plan
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
