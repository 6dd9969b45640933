"""aprilsam_tpu — a TPU-native smoothing-and-mapping (SLAM) engine.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of AprilSAM
(ICRA'18): real-time 2D pose-graph SLAM with a hybrid incremental/batch
sparse Cholesky solver.  The compute path is batched and block-structured for
the MXU; symbolic/structural work (orderings, elimination trees, sparsity
patterns) runs on the host; multi-chip scaling uses jax.sharding meshes.
"""

from .graph import Attributes, FactorGraph, FACTOR_XYT, FACTOR_XYTPOS
from .geometry import mod2pi, xyt_inv, xyt_inv_mul, xyt_mul
from .io import load_g2o_text, load_graph_file, save_graph_file
from .solver import BatchSolver, IncrementalSolver, SolverConfig

__version__ = "0.1.0"

__all__ = [
    "Attributes",
    "FactorGraph",
    "FACTOR_XYT",
    "FACTOR_XYTPOS",
    "mod2pi",
    "xyt_mul",
    "xyt_inv",
    "xyt_inv_mul",
    "load_g2o_text",
    "load_graph_file",
    "save_graph_file",
    "BatchSolver",
    "IncrementalSolver",
    "SolverConfig",
]
