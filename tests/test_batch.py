import numpy as np
import pytest

from aprilsam_tpu.graph import FactorGraph
from aprilsam_tpu.solver import BatchSolver, SolverConfig
from aprilsam_tpu.replay import Replay

from conftest import M3500_TXT


def small_cfg(**kw):
    kw.setdefault("node_capacity", 512)
    kw.setdefault("factor_capacity", 1024)
    kw.setdefault("row_block_capacity", 64)
    return SolverConfig(**kw)


def build_dogleg(nposes=6):
    """The tutorial graph: poses at (i, 0, 0), geopin on node 0, chained
    odometry, and a final loop closure claiming node 5 sits at (5, 1, 0)
    (examples/aprilsam_tutorial.c:80-266)."""
    from aprilsam_tpu.geometry import np_xyt_inv_mul

    g = FactorGraph()
    W_odo = np.diag([1.0 / 0.1**2, 1.0 / 0.1**2, 1.0 / np.radians(1.0) ** 2])
    g.add_node([0, 0, 0], init=[0, 0, 0], truth=[0, 0, 0])
    g.add_factor_xytpos(0, [0, 0, 0], np.diag([1e4, 1e4, 1e3]))
    for i in range(1, nposes):
        g.add_node([i, 0, 0], init=[i, 0, 0], truth=[i, 0, 0])
        z = np_xyt_inv_mul(g.init[i - 1], g.init[i])
        g.add_factor_xyt(i - 1, i, z, W_odo)
    return g, W_odo


def test_batch_single_node():
    """Step 1 of the tutorial: one node + geopin, chi2 -> 0."""
    g, _ = build_dogleg(nposes=1)
    s = BatchSolver(small_cfg())
    info = s.solve(g)
    assert info.spd
    assert info.chi2 < 1e-9
    s.sync_states(g)
    np.testing.assert_allclose(g.states[0], 0.0, atol=1e-8)


def test_batch_dogleg_chain():
    """Steps 1-5: consistent chain, chi2 stays ~0, states at (i,0,0)."""
    g, _ = build_dogleg(nposes=5)
    s = BatchSolver(small_cfg())
    info = s.solve(g)
    assert info.chi2 < 1e-9
    s.sync_states(g)
    for i in range(5):
        np.testing.assert_allclose(g.states[i], [i, 0, 0], atol=1e-6)


def test_batch_dogleg_loop_closure():
    """Step 6 golden: after the (5,1,0) loop closure one batch GN step gives
    chi2 ~ 7.805041 and the y-ramp 0.16/0.32/0.50/0.67/0.84
    (tests/golden/tutorial.txt, BASELINE.md)."""
    from aprilsam_tpu.geometry import np_xyt_inv_mul

    g, W_odo = build_dogleg(nposes=6)
    z = np_xyt_inv_mul(np.array([0.0, 0, 0]), np.array([5.0, 1, 0]))
    g.add_factor_xyt(0, 5, z, W_odo)
    s = BatchSolver(small_cfg())
    info = s.solve(g)
    # chi2 matches the C tutorial print to all 6 decimals; states match its
    # 2-decimal print (0.16/0.32/0.50/0.67/0.84)
    assert abs(info.chi2 - 7.805041) < 1e-5
    s.sync_states(g)
    ys = g.states[:6, 1]
    np.testing.assert_allclose(
        ys, [0.0, 0.156098, 0.323291, 0.496825, 0.671944, 0.843894], atol=1e-5
    )


@pytest.mark.slow
def test_m3500_batch_replay_prefix(m3500):
    """Per-step chi2 of batch-only replay matches the C reference golden for
    the first K poses (the C prefix depends only on these poses' factors)."""
    golden = np.loadtxt("tests/golden/m3500_batch_chi2.txt")
    K = 60
    cfg = small_cfg()
    rep = Replay(m3500, cfg, batch_update_only=True)
    res = rep.run(max_steps=K)
    ours = np.array([r.chi2 for r in res])
    np.testing.assert_allclose(ours, golden[:K], rtol=1e-4, atol=1e-5)


def test_panel_epoch_matches_host_epoch(m3500):
    """The scatter-free panel epoch (panel_epoch.py) must reproduce the
    float64 host epoch exactly: same ordering (both use the native
    symbolic phase), same R blocks, y, states, chi2."""
    import numpy as np
    from aprilsam_tpu.graph import FactorGraph
    from aprilsam_tpu.solver import SolverConfig
    from aprilsam_tpu.solver.state import init_device_state
    from aprilsam_tpu.solver.ingest import ingest_graph
    from aprilsam_tpu.solver.batch import run_batch_epoch
    from aprilsam_tpu.solver.host_batch import host_batch_epoch
    from aprilsam_tpu import native

    if not native.available():
        import pytest

        pytest.skip("native module unavailable")

    loaded = m3500
    n = 700
    sel = np.nonzero(loaded.fnodes[:loaded.nfactors].max(axis=1) < n)[0]
    g = FactorGraph()
    for i in range(n):
        g.add_node(loaded.init[i], init=loaded.init[i])
    g.add_factor_xytpos(0, np.zeros(3), np.diag([1e4, 1e4, 1e3]))
    for f in sel:
        a, b = (int(v) for v in loaded.fnodes[f])
        g.add_factor_xyt(a, b, loaded.fz[f], loaded.fW[f])

    def fresh(backend):
        cfg = SolverConfig(dtype=np.float64, node_capacity=1024,
                           factor_capacity=2048, row_block_capacity=96,
                           panel_nodes=128, batch_backend=backend)
        ds = init_device_state(cfg)
        return cfg, ingest_graph(ds, g, cfg, 0, 0)

    cfg, ds = fresh("panel")
    ds_p, sym_p, info_p = run_batch_epoch(
        ds, cfg, g.nnodes, g.ftype[:g.nfactors], g.fnodes[:g.nfactors])
    cfg2, ds2 = fresh("host")
    ds_h, sym_h, info_h = host_batch_epoch(
        ds2, cfg2, g.nnodes, g.ftype[:g.nfactors], g.fnodes[:g.nfactors],
        g.fz[:g.nfactors], g.fW[:g.nfactors])

    np.testing.assert_array_equal(np.asarray(sym_p.order),
                                  np.asarray(sym_h.order))
    assert abs(info_p.chi2 - info_h.chi2) < 1e-6
    np.testing.assert_allclose(np.asarray(ds_p.R_blocks),
                               np.asarray(ds_h.R_blocks), atol=1e-7)
    np.testing.assert_allclose(np.asarray(ds_p.y), np.asarray(ds_h.y),
                               atol=1e-7)
    np.testing.assert_allclose(np.asarray(ds_p.state[:n]),
                               np.asarray(ds_h.state[:n]), atol=1e-8)


def test_panel_caps_grade_escalation(m3500, monkeypatch):
    """A plan that overflows the tight grade-0 capacities must retry at
    grade 1 instead of falling back to the dense epoch (round 5: grade-0
    caps are sized to measured M3500 plans; larger graphs escalate)."""
    import numpy as np
    from aprilsam_tpu.solver import panel_epoch as PE
    from aprilsam_tpu.solver import batch as B

    orig = PE.panel_caps
    calls = []

    def tight_then_real(npanb, panel, grade=0):
        calls.append(grade)
        if grade == 0:
            # absurdly tight: everything overflows
            return 8, 8, 1, 64, 64
        return orig(npanb, panel, grade=1)

    monkeypatch.setattr(PE, "panel_caps", tight_then_real)

    from aprilsam_tpu.graph import FactorGraph
    from aprilsam_tpu.replay import GEOPIN_W
    from aprilsam_tpu.solver import SolverConfig
    from aprilsam_tpu.solver.batch import BatchSolver

    loaded = m3500
    g = FactorGraph()
    n = 600
    for i in range(n):
        g.add_node(loaded.state[i])
    g.add_factor_xytpos(0, loaded.state[0], GEOPIN_W)
    for f in range(loaded.nfactors):
        a, b = loaded.fnodes[f]
        if max(a, b) < n:
            g.add_factor_xyt(int(a), int(b), loaded.fz[f], loaded.fW[f])

    cfg = SolverConfig(dtype=np.float64, node_capacity=1024,
                       factor_capacity=4096, row_block_capacity=96,
                       panel_nodes=128, batch_backend="panel")
    s = BatchSolver(cfg)
    info = s.solve(g)
    assert np.isfinite(info.chi2)
    assert 1 in calls, calls  # the escalation actually happened
