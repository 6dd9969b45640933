import numpy as np

from aprilsam_tpu.checkpoint import load_solver, save_solver
from aprilsam_tpu.datasets import manhattan_world
from aprilsam_tpu.replay import Replay
from aprilsam_tpu.solver import SolverConfig
from aprilsam_tpu.utils.timeprofile import TimeProfile


def test_solver_checkpoint_roundtrip(tmp_path):
    """Save mid-replay, resume, continue: identical trajectory."""
    g = manhattan_world(80, seed=2, closure_prob=0.3)
    cfg = SolverConfig(node_capacity=256, factor_capacity=1024,
                       row_block_capacity=48, panel_nodes=32,
                       wallclock_gate=False)

    def drive(rep, lo, hi):
        for _ in range(lo, hi):
            rep.step()

    import copy

    rep = Replay(g, cfg, batch_update_only=False)
    drive(rep, 0, 50)
    p = str(tmp_path / "solver.npz")
    save_solver(rep.solver, p)
    live_snapshot = copy.deepcopy(rep.graph)
    chi_mid = rep.solver.chi2()

    resumed = load_solver(p)
    assert abs(resumed.chi2() - chi_mid) < 1e-9

    # continue both to the end; trajectories must match
    rep2 = Replay(g, cfg, batch_update_only=False)
    rep2.solver = resumed
    rep2.graph = live_snapshot
    rep2.event_idx = rep.event_idx
    drive(rep, 50, 80)
    drive(rep2, 50, 80)
    np.testing.assert_allclose(
        np.asarray(rep.solver.ds.state[:80]),
        np.asarray(rep2.solver.ds.state[:80]),
        atol=1e-10,
    )


def test_timeprofile():
    tp = TimeProfile()
    tp.stamp("a")
    tp.stamp("b")
    s = tp.display()
    assert "a" in s and "b" in s
    assert tp.total_ms() >= 0
