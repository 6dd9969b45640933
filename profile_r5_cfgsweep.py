"""TPU validation sweep for round-5 bench-config candidates.

Sweeps sweep_every_supersteps (K) x policy_poll (P) on the full M3500
replay in ONE warm process; reports rate + final chi2 per config.  The
accuracy guard is the reference chi2 band [68.96, 69.91] (BASELINE.md).
"""
import itertools
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

    loaded = load_g2o_text("/root/reference/data/M3500.txt")

    def make_cfg(K, P):
        return SolverConfig(
            dtype=np.float32, node_capacity=4096, factor_capacity=8192,
            row_block_capacity=96, panel_nodes=128, wallclock_gate=False,
            policy_lag=2, policy_poll=P, superstep_size=64, log_chi2=False,
            batch_backend="panel", sweep_every_supersteps=K,
        )

    results = []
    for K, P in itertools.product((1, 2, 3), (1, 2)):
        cfg = make_cfg(K, P)
        # warmup run (compiles any new specialization for this config)
        rep = Replay(loaded, cfg, deferred=True)
        while rep.step() is not None:
            pass
        rep.solver.flush(rep.graph)
        warm_chi2 = rep.solver.chi2()
        del rep
        # timed runs (2, report best)
        rates = []
        chi2s = []
        for _ in range(2):
            rep = Replay(loaded, cfg, deferred=True)
            t0 = time.perf_counter()
            n = 0
            while rep.step() is not None:
                n += 1
            rep.solver.flush(rep.graph)
            jax.block_until_ready(rep.solver.ds.state)
            dt = time.perf_counter() - t0
            chi2s.append(rep.solver.chi2())
            rates.append(n / dt)
            del rep
        print(f"K={K} P={P}: rates={[round(r,1) for r in rates]} "
              f"chi2={[round(c,4) for c in chi2s]} (warm {warm_chi2:.4f})",
              flush=True)
        results.append((K, P, max(rates), chi2s))

    print("\nsummary (band 68.96-69.91):", flush=True)
    for K, P, r, cs in results:
        ok = all(68.96 <= c <= 69.91 for c in cs)
        print(f"  K={K} P={P}: {r:7.1f} poses/s  chi2_ok={ok}", flush=True)


if __name__ == "__main__":
    main()
