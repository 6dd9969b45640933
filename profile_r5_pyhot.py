"""cProfile the warm bench-config replay: where does host python time go?"""
import cProfile
import pstats
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
    cfg = SolverConfig(
        dtype=np.float32, node_capacity=4096, factor_capacity=8192,
        row_block_capacity=96, panel_nodes=128, wallclock_gate=False,
        policy_lag=2, policy_poll=2, superstep_size=64, log_chi2=False,
        batch_backend="panel",
    )
    rep = Replay(loaded, cfg, deferred=True)
    while rep.step() is not None:
        pass
    rep.solver.flush(rep.graph)
    print(f"warm chi2={rep.solver.chi2():.4f}", flush=True)

    rep = Replay(loaded, cfg, deferred=True)
    pr = cProfile.Profile()
    pr.enable()
    while rep.step() is not None:
        pass
    rep.solver.flush(rep.graph)
    pr.disable()
    print(f"timed chi2={rep.solver.chi2():.4f}", flush=True)
    st = pstats.Stats(pr)
    st.sort_stats("tottime").print_stats(35)


if __name__ == "__main__":
    main()
