"""Pose-by-pose replay driver — the equivalent of the reference benchmark CLI
loop (reference: simulate_on_exist_graph / simulate_event,
examples/aprilsam_demo.c:119-234).

Given a fully loaded dataset graph, replays it one pose at a time:
  * step 0: add node 0 plus the geopin prior W = diag(1e4, 1e4, 1e3) at the
    origin (aprilsam_demo.c:133-146), run a batch solve;
  * step k: add node k (state = loaded init), add every loaded factor whose
    maximum endpoint is k; for factors tagged "odom" seed the new node's
    state by composing the neighbor's current optimized state with the
    odometry measurement and relinearize it (aprilsam_demo.c:180-191);
  * optimize: incremental from step 1 on (batch when --batch_update_only),
    then report chi2 and timing (aprilsam_demo.c:224-232).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import List, Optional

import numpy as np

from .graph import FactorGraph, FACTOR_XYT
from .geometry import np_xyt_inv, np_xyt_mul
from .solver import BatchSolver, SolverConfig

GEOPIN_W = np.diag([10000.0, 10000.0, 1000.0])


@dataclass
class StepResult:
    step: int
    chi2: float
    step_ms: float
    total_ms: float


class Replay:
    def __init__(
        self,
        loaded: FactorGraph,
        cfg: Optional[SolverConfig] = None,
        batch_update_only: bool = False,
    ):
        self.loaded = loaded
        self.cfg = cfg or SolverConfig()
        self.batch_update_only = batch_update_only
        self.graph = FactorGraph()
        self.event_idx = 0
        self.total_ms = 0.0
        self.results: List[StepResult] = []

        # group loaded factors by their max endpoint (preserving file order,
        # aprilsam_demo.c:150-163)
        self._factors_by_max: List[List[int]] = [[] for _ in range(loaded.nnodes)]
        for f in range(loaded.nfactors):
            if loaded.ftype[f] != FACTOR_XYT:
                continue
            a, b = loaded.fnodes[f]
            mx = int(max(a, b))
            if mx < loaded.nnodes:
                self._factors_by_max[mx].append(f)

        if batch_update_only:
            self.solver = BatchSolver(self.cfg)
        else:
            from .solver.incremental import IncrementalSolver

            self.solver = IncrementalSolver(self.cfg)

    # ------------------------------------------------------------------

    def _factor_tag(self, f: int) -> str:
        attrs = self.loaded.factor_attrs.get(f)
        if attrs is not None:
            t = attrs.get("type")
            if t:
                return t
        a, b = self.loaded.fnodes[f]
        return "odom" if abs(int(a) - int(b)) == 1 else "scan"

    def _add_pose(self) -> bool:
        """Add the next pose + its factors.  Returns False when exhausted."""
        k = self.event_idx
        if k >= self.loaded.nnodes:
            return False
        g = self.graph
        init = self.loaded.init[k]
        truth = self.loaded.truth[k] if self.loaded.has_truth[k] else None
        g.add_node(init, init=init, truth=truth)

        if k == 0:
            g.add_factor_xytpos(0, np.zeros(3), GEOPIN_W)
            self.event_idx += 1
            return True

        for f in self._factors_by_max[k]:
            a, b = (int(v) for v in self.loaded.fnodes[f])
            z = self.loaded.fz[f].copy()
            W = self.loaded.fW[f].copy()
            tag = self._factor_tag(f)
            if tag == "odom":
                # seed the new endpoint by odometry composition
                # (aprilsam_demo.c:180-191)
                if a < b:
                    g.state[b] = np_xyt_mul(g.state[a], z)
                    g.l_point[b] = g.state[b]
                else:
                    g.state[a] = np_xyt_mul(g.state[b], np_xyt_inv(z))
                    g.l_point[a] = g.state[a]
            g.add_factor_xyt(a, b, z, W)
        self.event_idx += 1
        return True

    def step(self) -> Optional[StepResult]:
        if not self._add_pose():
            return None
        t0 = time.perf_counter()
        if self.batch_update_only or self.event_idx <= 1:
            self.solver.solve(self.graph)
        else:
            self.solver.update(self.graph)
        chi2 = self.solver.chi2()
        ms = (time.perf_counter() - t0) * 1e3
        self.total_ms += ms
        self.solver.sync_states(self.graph)
        res = StepResult(
            step=self.event_idx - 1, chi2=chi2, step_ms=ms, total_ms=self.total_ms
        )
        self.results.append(res)
        return res

    def run(self, max_steps: Optional[int] = None, verbose: bool = False):
        n = 0
        while max_steps is None or n < max_steps:
            res = self.step()
            if res is None:
                break
            if verbose:
                print(
                    f"Step: {res.step} / {self.loaded.nnodes}\n"
                    f"Chi squared error: {res.chi2:f} \n"
                    f"Step running time: {res.step_ms:.3f} ms, "
                    f"Total running time: {res.total_ms:.3f} ms"
                )
            n += 1
        return self.results
