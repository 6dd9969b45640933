"""Second TPU config sweep: policy_lag, superstep_size, and a 640 union
bucket (sup_m_max=514 currently overflows 384 -> the 42 ms 1024 bucket).
Guard: full-replay final chi2 in [68.96, 69.91]."""
import time
import numpy as np


def main():
    import jax
    from aprilsam_tpu.utils import enable_compilation_cache, setup_precision
    enable_compilation_cache()
    setup_precision()
    print("platform:", jax.devices()[0].platform, flush=True)

    from aprilsam_tpu.io import load_g2o_text
    from aprilsam_tpu.replay import Replay
    from aprilsam_tpu.solver import SolverConfig

    loaded = load_g2o_text("/root/reference/data/M3500.txt")

    B640 = (64, 128, 256, 384, 640, 1024)
    cfgs = [
        ("lag3 S96 b640", dict(policy_lag=3, superstep_size=96,
                               superstep_buckets=B640)),
        ("lag4 S96 b640", dict(policy_lag=4, superstep_size=96,
                               superstep_buckets=B640)),
        ("lag4 S64 b640 P3", dict(policy_lag=4, superstep_size=64,
                                  policy_poll=3, superstep_buckets=B640)),
    ]

    for name, kw in cfgs:
        kw.setdefault("policy_poll", 2)
        cfg = SolverConfig(
            dtype=np.float32, node_capacity=4096, factor_capacity=8192,
            row_block_capacity=96, panel_nodes=128, wallclock_gate=False,
            log_chi2=False, batch_backend="panel", **kw)
        rep = Replay(loaded, cfg, deferred=True)
        while rep.step() is not None:
            pass
        rep.solver.flush(rep.graph)
        warm_chi2 = rep.solver.chi2()
        del rep
        rates, chi2s = [], []
        for _ in range(3):
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
        ok = all(68.96 <= c <= 69.91 for c in chi2s)
        print(f"{name}: rates={[round(r,1) for r in rates]} "
              f"chi2={[round(c,4) for c in chi2s]} warm={warm_chi2:.4f} "
              f"ok={ok}", flush=True)


if __name__ == "__main__":
    main()
