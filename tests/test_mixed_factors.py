"""BASELINE.json config 3: mixed xyt + xytpos factor graphs."""

import numpy as np
import pytest

from aprilsam_tpu.datasets import manhattan_world
from aprilsam_tpu.graph import FACTOR_XYTPOS
from aprilsam_tpu.replay import Replay
from aprilsam_tpu.solver import BatchSolver, IncrementalSolver, SolverConfig
from aprilsam_tpu.solver.incremental import SeedSpec
from aprilsam_tpu.geometry import np_xyt_inv_mul


def cfg(**kw):
    kw.setdefault("node_capacity", 512)
    kw.setdefault("factor_capacity", 2048)
    kw.setdefault("row_block_capacity", 64)
    kw.setdefault("panel_nodes", 32)
    kw.setdefault("wallclock_gate", False)
    return SolverConfig(**kw)


def test_mixed_graph_batch_reduces_chi2():
    g = manhattan_world(200, seed=5, geopin_every=25, closure_prob=0.3)
    assert np.sum(g.ftype[: g.nfactors] == FACTOR_XYTPOS) >= 8
    c0 = g.chi2()
    s = BatchSolver(cfg(gn_iters=3))
    info = s.solve(g)
    assert info.spd
    assert info.chi2 < c0 * 0.5


def test_mixed_graph_incremental_replay():
    """Incremental replay over a graph that keeps adding xytpos priors:
    exercises prior factors through the frontal QR path."""
    n = 60
    g = manhattan_world(n, seed=9, geopin_every=10, closure_prob=0.2)

    s = IncrementalSolver(cfg(nthreshold=100))
    from aprilsam_tpu.graph import FactorGraph

    live = FactorGraph()
    # replay factors grouped by max endpoint
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
                    if a < b:
                        seeds.append(SeedSpec(src=a, dst=b, z=g.fz[f], invert=False))
                    else:
                        seeds.append(SeedSpec(src=b, dst=a, z=g.fz[f], invert=True))
                live.add_factor_xyt(a, b, g.fz[f], g.fW[f])
            else:
                live.add_factor_xytpos(a, g.fz[f], g.fW[f])
        if k == 0:
            info = s.solve(live)
        else:
            info = s.update(live, seeds=seeds)
        assert info is not None and np.isfinite(info.chi2)

    # the optimized trajectory should be much closer to truth than the
    # dead-reckoned initialization
    opt = np.asarray(s.ds.state[:n], dtype=np.float64)
    err_opt = np.linalg.norm(opt[:, :2] - g.truth[:n, :2])
    err_init = np.linalg.norm(g.init[:n, :2] - g.truth[:n, :2])
    assert err_opt < err_init * 0.8
