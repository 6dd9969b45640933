"""Wall decomposition of the bench-config M3500 replay (superstep mode).

Times host-side phases by wrapping plan_step, inc_superstep dispatch,
run_batch_epoch, and _drain_pending.  No extra device syncs.
"""
import collections
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
    from aprilsam_tpu.solver import batch as B

    loaded = load_g2o_text("/root/reference/data/M3500.txt")
    cfg = SolverConfig(
        dtype=np.float32, node_capacity=4096, factor_capacity=8192,
        row_block_capacity=96, panel_nodes=128, wallclock_gate=False,
        policy_lag=3, policy_poll=2, superstep_size=96, log_chi2=False,
        superstep_buckets=(64, 128, 256, 384, 640, 1024),
        batch_backend="panel",
    )
    T = collections.defaultdict(float)
    C = collections.defaultdict(int)

    def wrap(mod, name, key):
        orig = getattr(mod, name)

        def timed(*a, **k):
            t0 = time.perf_counter()
            out = orig(*a, **k)
            T[key] += time.perf_counter() - t0
            C[key] += 1
            return out
        setattr(mod, name, timed)

    wrap(I, "plan_step", "plan")
    wrap(I, "pack_plan", "pack")
    wrap(I, "inc_superstep", "superstep_dispatch")
    wrap(I, "run_batch_epoch", "batch_epoch")
    orig_drain = I.IncrementalSolver._drain_pending

    def timed_drain(self, *a, **k):
        t0 = time.perf_counter()
        out = orig_drain(self, *a, **k)
        T["drain"] += time.perf_counter() - t0
        C["drain"] += 1
        return out
    I.IncrementalSolver._drain_pending = timed_drain

    # warmup replay (compiles)
    rep = Replay(loaded, cfg, deferred=True)
    n = 0
    while rep.step() is not None:
        n += 1
    rep.solver.flush(rep.graph)
    print(f"warmup done ({n} steps) chi2={rep.solver.chi2():.3f}", flush=True)

    for k in list(T):
        T[k] = 0.0
        C[k] = 0
    t0 = time.perf_counter()
    rep = Replay(loaded, cfg, deferred=True)
    n = 0
    while rep.step() is not None:
        n += 1
    rep.solver.flush(rep.graph)
    chi2 = rep.solver.chi2()
    total = time.perf_counter() - t0
    print(f"timed replay: {total:.3f}s = {n/total:.1f} poses/s chi2={chi2:.4f}",
          flush=True)
    for k in sorted(T, key=lambda k: -T[k]):
        print(f"  {k:20s} {T[k]*1e3:8.1f} ms  x{C[k]}", flush=True)
    other = total - sum(T.values())
    print(f"  {'(untimed)':20s} {other*1e3:8.1f} ms", flush=True)
    print("counters:", rep.solver.counters, flush=True)


if __name__ == "__main__":
    main()
