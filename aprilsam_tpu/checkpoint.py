"""Checkpoint / resume.

The reference's checkpoint is the stype graph serialization — a complete
snapshot of the problem (nodes with state/init/truth, factors, attributes)
with solver state rebuilt by a batch step on resume (SURVEY.md section 5;
april_graph_save / april_graph_create_from_file, april_graph.c:377-426).

This module mirrors and extends that:
  * problem checkpoints: the reference-compatible binary `.graph` format
    (io/stype.py) — interoperable with the C implementation in both
    directions;
  * solver checkpoints: the full DeviceState pytree + host symbolic state
    to an .npz, so an incremental session resumes exactly (no batch replay
    needed) — something the reference cannot do.
"""

from __future__ import annotations

import json

import numpy as np

from .io import load_graph_file, save_graph_file
from .solver.config import SolverConfig
from .solver.incremental import IncrementalSolver
from .solver.state import DeviceState
from .solver.symbolic import SymbolicState

save_problem = save_graph_file
load_problem = load_graph_file


def _cfg_to_dict(cfg: SolverConfig) -> dict:
    import dataclasses

    d = dataclasses.asdict(cfg)
    d["dtype"] = np.dtype(cfg.dtype).name
    d["frontal_buckets"] = list(cfg.frontal_buckets)
    return d


def _cfg_from_dict(d: dict) -> SolverConfig:
    d = dict(d)
    d["dtype"] = np.dtype(d["dtype"])
    d["frontal_buckets"] = tuple(d["frontal_buckets"])
    return SolverConfig(**d)


def save_solver(solver: IncrementalSolver, path: str) -> None:
    """Snapshot the full solver (device pytree + host symbolic + policy)."""
    import jax

    arrays = {}
    ds = solver.ds
    for name in DeviceState._fields:
        arrays[f"ds_{name}"] = np.asarray(jax.device_get(getattr(ds, name)))

    sym = solver.sym
    meta = {
        "factor_num": solver.factor_num,
        "node_num": solver.node_num,
        "batch_time_ms": solver.batch_time_ms,
        "has_sym": sym is not None,
        "cfg": _cfg_to_dict(solver.cfg),
    }
    if sym is not None:
        from .solver.incremental import sym_patterns_list

        patterns = sym_patterns_list(sym)  # native planner mutates the pads
        arrays["sym_order"] = sym.order
        arrays["sym_pos"] = sym.pos
        arrays["sym_parents"] = sym.parents
        flat = np.concatenate(patterns) if patterns else np.zeros(0, np.int32)
        lens = np.asarray([len(p) for p in patterns], dtype=np.int32)
        arrays["sym_pattern_flat"] = flat
        arrays["sym_pattern_lens"] = lens
    arrays["meta_json"] = np.frombuffer(
        json.dumps(meta).encode(), dtype=np.uint8
    )
    np.savez_compressed(path, **arrays)


def load_solver(path: str) -> IncrementalSolver:
    import jax.numpy as jnp

    data = np.load(path)
    meta = json.loads(bytes(data["meta_json"]).decode())
    cfg = _cfg_from_dict(meta["cfg"])
    solver = IncrementalSolver(cfg)
    fields = {
        name: jnp.asarray(data[f"ds_{name}"]) for name in DeviceState._fields
    }
    solver.ds = DeviceState(**fields)
    solver.factor_num = meta["factor_num"]
    solver.node_num = meta["node_num"]
    solver.batch_time_ms = meta["batch_time_ms"]
    solver._ingested_nodes = meta["node_num"]
    solver._ingested_factors = meta["factor_num"]
    if meta["has_sym"]:
        lens = data["sym_pattern_lens"]
        flat = data["sym_pattern_flat"]
        patterns = []
        o = 0
        for L in lens:
            patterns.append(flat[o : o + L].astype(np.int32))
            o += L
        sym = SymbolicState(
            order=data["sym_order"].astype(np.int32),
            pos=data["sym_pos"].astype(np.int32),
            patterns=patterns,
            parents=data["sym_parents"].astype(np.int32),
        )
        sym.rebuild_children()
        solver.sym = sym
    return solver
