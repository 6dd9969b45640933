"""Hybrid incremental/batch solver (AprilSAM algorithm) — see design notes.

Placeholder: implemented in the incremental engine milestone.
"""

from __future__ import annotations

from typing import Optional

from ..graph import FactorGraph
from .config import SolverConfig


class IncrementalSolver:
    def __init__(self, cfg: Optional[SolverConfig] = None):
        raise NotImplementedError("incremental engine lands next milestone")
