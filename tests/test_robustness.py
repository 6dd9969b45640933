"""Capacity growth, fallback escalation, and loader robustness."""

import dataclasses

import numpy as np
import pytest

from aprilsam_tpu.graph import FactorGraph
from aprilsam_tpu.geometry import np_xyt_inv_mul
from aprilsam_tpu.solver import IncrementalSolver, SolverConfig
from aprilsam_tpu.solver.incremental import SeedSpec


def cfg(**kw):
    kw.setdefault("node_capacity", 256)
    kw.setdefault("factor_capacity", 1024)
    kw.setdefault("panel_nodes", 32)
    kw.setdefault("wallclock_gate", False)
    return SolverConfig(**kw)


W = np.diag([100.0, 100.0, 400.0])


def test_row_capacity_growth_recovers():
    """A dense-ish graph that overflows a tiny row_block_capacity must
    trigger capacity growth + batch fallback, not crash."""
    rng = np.random.default_rng(0)
    g = FactorGraph()
    n = 40
    for i in range(n):
        g.add_node([i, 0, 0], init=[i, 0, 0])
    g.add_factor_xytpos(0, [0, 0, 0], np.diag([1e4, 1e4, 1e3]))
    for i in range(n - 1):
        g.add_factor_xyt(i, i + 1, [1, 0, 0], W)
    # dense random closures force heavy fill
    for _ in range(80):
        a, b = sorted(rng.choice(n, 2, replace=False))
        g.add_factor_xyt(int(a), int(b), [float(b - a), 0, 0], W)

    s = IncrementalSolver(cfg(row_block_capacity=8, nthreshold=10**9))
    info = s.solve(g)  # must grow capacity internally
    assert np.isfinite(info.chi2)
    assert s.cfg.row_block_capacity > 8


def test_frontal_bucket_overflow_falls_back_to_batch():
    """An affected set larger than the biggest frontal bucket escalates to a
    batch epoch (documented policy)."""
    n = 60
    g = FactorGraph()
    for i in range(n):
        g.add_node([i, 0, 0], init=[i, 0, 0])
    g.add_factor_xytpos(0, [0, 0, 0], np.diag([1e4, 1e4, 1e3]))
    for i in range(n - 1):
        g.add_factor_xyt(i, i + 1, [1, 0, 0], W)
    c = dataclasses.replace(cfg(nthreshold=10**9), frontal_buckets=(4,))
    s = IncrementalSolver(c)
    s.solve(g)
    # long-range closure -> affected path > 4
    g.add_factor_xyt(0, n - 1, [n - 1.0, 0.5, 0], W)
    s.update(g)
    assert s.last_path == "batch"
    assert np.isfinite(s.chi2())


def test_update_without_new_factors_is_noop():
    g = FactorGraph()
    g.add_node([0, 0, 0], init=[0, 0, 0])
    g.add_factor_xytpos(0, [0, 0, 0], np.diag([1e4, 1e4, 1e3]))
    s = IncrementalSolver(cfg())
    s.solve(g)
    c1 = s.chi2()
    info = s.update(g)  # factor_num unchanged -> guard path
    assert abs(info.chi2 - c1) < 1e-12


def test_g2o_loader_rejects_garbage(tmp_path):
    p = tmp_path / "bad.g2o"
    p.write_text("VERTEX2 0 0 0 0\nBOGUS 1 2 3\n")
    from aprilsam_tpu.io import load_g2o_text

    with pytest.raises(ValueError):
        load_g2o_text(str(p))


def test_spd_failure_triggers_batch():
    """A rank-breaking update should flip is_spd and the policy must
    escalate to a batch epoch (the reference computes is_spd but ignores
    it; we act on it — PARITY.md deviation list)."""
    n = 10
    g = FactorGraph()
    for i in range(n):
        g.add_node([i, 0, 0], init=[i, 0, 0])
    g.add_factor_xytpos(0, [0, 0, 0], np.diag([1e4, 1e4, 1e3]))
    for i in range(n - 1):
        g.add_factor_xyt(i, i + 1, [1, 0, 0], W)
    s = IncrementalSolver(cfg(nthreshold=10**9))
    s.solve(g)
    # a NEGATIVE-definite "information" matrix makes the update indefinite
    g.add_factor_xyt(0, n - 1, [n - 1.0, 0, 0], -10 * W)
    s.update(g)
    # batch fallback ran (policy acted on spd); solver remains usable
    assert s.last_path == "batch"
    g.add_node([n, 0, 0], init=[n, 0, 0])
    g.add_factor_xyt(n - 1, n, [1, 0, 0], W)
    s.update(g, seeds=[SeedSpec(n - 1, n, np.array([1.0, 0, 0]), False)])
    assert np.isfinite(s.chi2())


def test_describe_tree():
    g = FactorGraph()
    for i in range(5):
        g.add_node([i, 0, 0], init=[i, 0, 0])
    g.add_factor_xytpos(0, [0, 0, 0], np.diag([1e4, 1e4, 1e3]))
    for i in range(4):
        g.add_factor_xyt(i, i + 1, [1, 0, 0], W)
    s = IncrementalSolver(cfg())
    assert "no tree" in s.describe_tree()
    s.solve(g)
    out = s.describe_tree()
    assert "root position: 4" in out and "parent=" in out


def test_ordering_reduces_fill():
    """The constrained min-degree ordering must not blow up fill relative to
    the natural ordering on a loop-closure-rich graph, and must keep the
    newest node last (aprilsam.c:1020-1035)."""
    from aprilsam_tpu.datasets import manhattan_world
    from aprilsam_tpu.solver import symbolic as sym_mod

    g = manhattan_world(300, seed=21, closure_prob=0.4)
    n = g.nnodes
    adj = sym_mod.build_adjacency(n, g.ftype[: g.nfactors],
                                  g.fnodes[: g.nfactors])
    order = sym_mod.min_degree_ordering(n, adj)
    assert order[-1] == n - 1
    sym = sym_mod.build_symbolic(n, adj, order)
    fill_md = sum(len(p) for p in sym.patterns)
    nat = sym_mod.build_symbolic(n, adj, np.arange(n, dtype=np.int32))
    fill_nat = sum(len(p) for p in nat.patterns)
    assert fill_md <= fill_nat


def test_cli_smoke(tmp_path):
    import subprocess
    import sys

    out = subprocess.run(
        [sys.executable, "-c",
         "import jax; jax.config.update('jax_platforms','cpu');"
         "from aprilsam_tpu.cli import main;"
         "main(['--datapath','/root/reference/data/M3500.txt',"
         "'--max_steps','12','--quiet','--json','--node_capacity','512'])"],
        capture_output=True, text=True, timeout=240, cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr[-800:]
    assert '"final_chi2"' in out.stdout


def test_pallas_tri_inv_interpret():
    """The Pallas blocked triangular-inverse kernel matches numpy in
    interpreter mode (hardware validation happens on the TPU bench)."""
    import jax.numpy as jnp

    from aprilsam_tpu.kernels.pallas_tri import tri_inv_pallas

    rng = np.random.default_rng(3)
    B, N = 3, 96
    T = (np.triu(rng.standard_normal((B, N, N))).astype(np.float32)
         + 6 * np.eye(N, dtype=np.float32))
    out = np.asarray(tri_inv_pallas(jnp.asarray(T), interpret=True))
    ref = np.stack([np.linalg.inv(T[b]) for b in range(B)])
    assert np.max(np.abs(out - ref)) / np.max(np.abs(ref)) < 1e-5
