"""Native (C) incremental planner vs the pure-python planner: identical
plans => bit-identical device trajectories.  (VERDICT r1 next-step #2: the
python set/dict symbolic update was the host-side bottleneck.)"""

import dataclasses

import numpy as np
import pytest

from aprilsam_tpu import native
from aprilsam_tpu.graph import FactorGraph
from aprilsam_tpu.solver import IncrementalSolver, SolverConfig
from aprilsam_tpu.solver.incremental import SeedSpec
import aprilsam_tpu.solver.incremental as inc

from aprilsam_tpu.geometry import np_xyt_inv_mul
from test_incremental import chain_graph, W_ODO, small_cfg


def _replay(g, n, force_python: bool, monkeypatch=None):
    cfg = dataclasses.replace(small_cfg(nthreshold=50), bundle_size=1)
    s = IncrementalSolver(cfg)
    if force_python:
        s._force_python_planner = True
    live = FactorGraph()
    by_max = [[] for _ in range(n)]
    for f in range(g.nfactors):
        a, b = g.fnodes[f]
        by_max[int(max(a, b))].append(f)
    for k in range(n):
        live.add_node(g.init[k], init=g.init[k])
        seeds = []
        for f in by_max[k]:
            a, b = (int(v) for v in g.fnodes[f])
            if b >= 0:
                if abs(a - b) == 1:
                    lo, hi = (a, b) if a < b else (b, a)
                    seeds.append(SeedSpec(lo, hi, g.fz[f], a > b))
                live.add_factor_xyt(a, b, g.fz[f], g.fW[f])
            else:
                live.add_factor_xytpos(a, g.fz[f], g.fW[f])
        if k == 0:
            s.solve(live)
        else:
            s.update(live, seeds=seeds)
    s.flush(live)
    return s


@pytest.mark.skipif(not native.available(), reason="native runtime missing")
def test_native_planner_matches_python(monkeypatch):
    n = 60
    g = chain_graph(n, y_noise=0.25, seed=9)
    for (a, b) in [(2, 30), (5, 45), (1, 25), (12, 58), (3, 50), (20, 55)]:
        z = np_xyt_inv_mul(g.init[a], g.init[b]) + np.array([0.2, -0.1, 0.04])
        g.add_factor_xyt(a, b, z, W_ODO)

    orig = inc._ensure_native_sym

    # python-planner run
    monkeypatch.setattr(inc, "_ensure_native_sym", lambda *a, **k: False)
    s_py = _replay(g, n, force_python=True)
    ref_state = np.asarray(s_py.ds.state)
    ref_Ridx = np.asarray(s_py.ds.R_idx)
    ref_Rnnz = np.asarray(s_py.ds.R_nnz)
    chi_py = s_py.chi2()

    # native-planner run
    monkeypatch.setattr(inc, "_ensure_native_sym", orig)
    s_nat = _replay(g, n, force_python=False)
    assert getattr(s_nat.sym, "patterns_stale", False), \
        "native planner did not engage"

    np.testing.assert_array_equal(np.asarray(s_nat.ds.R_nnz), ref_Rnnz)
    np.testing.assert_array_equal(np.asarray(s_nat.ds.R_idx), ref_Ridx)
    np.testing.assert_array_equal(np.asarray(s_nat.ds.state), ref_state)
    assert s_nat.chi2() == chi_py

    # symbolic mirrors agree exactly
    pats_nat = inc.sym_patterns_list(s_nat.sym)
    pats_py = inc.sym_patterns_list(s_py.sym)
    assert len(pats_nat) == len(pats_py)
    for a, b in zip(pats_nat, pats_py):
        np.testing.assert_array_equal(a, b)
    np.testing.assert_array_equal(s_nat.sym.parents, s_py.sym.parents)
