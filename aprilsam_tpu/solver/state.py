"""Device-side solver state: one pytree, donated through every step.

TPU-native equivalent of the reference's april_graph_cholesky_param_t mutable
bundle (aprilsam.h:230-269) plus the per-node fields of april_graph_node_t
(aprilsam.h:151-179).  Everything numeric is a fixed-capacity device array so
incremental steps compile once and run with static shapes; logical sizes are
traced scalars.

Layout conventions:
  * "position space": elimination-order index p (0..n-1).  R rows, y, and the
    etree live here.  `pos` maps node id -> position, `order` the inverse.
  * R is the upper-triangular Cholesky factor stored as block rows:
    R_blocks[p, s] is the 3x3 block at block-row p, block-column R_idx[p, s]
    (ascending, R_idx[p, 0] == p, sentinel == node_capacity for padding).
  * node-space arrays (state, l_point, delta_X, relinearized) are indexed by
    node id, matching the graph builder.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .config import SolverConfig


class DeviceState(NamedTuple):
    # --- Cholesky factor R (position space) ---
    R_blocks: jax.Array      # [NCAP, BCAP, 3, 3]
    R_idx: jax.Array         # [NCAP, BCAP] int32, sentinel = NCAP
    R_nnz: jax.Array         # [NCAP] int32
    y: jax.Array             # [NCAP, 3]  (forward-solve intermediate, kept
                             #  across steps like param->y, aprilsam.c:293-298;
                             #  row layout so updates are row-level scatters)

    # --- node state (node-id space) ---
    state: jax.Array         # [NCAP, 3]
    l_point: jax.Array       # [NCAP, 3]
    delta_X: jax.Array       # [NCAP, 3]
    relinearized: jax.Array  # [NCAP] bool -- label_relinearized since last batch
    pos: jax.Array           # [NCAP] int32 node id -> position
    order: jax.Array         # [NCAP] int32 position -> node id

    # --- factor tables (padded; counts are traced scalars) ---
    xyt_a: jax.Array         # [FCAP] int32 node ids
    xyt_b: jax.Array         # [FCAP] int32
    xyt_z: jax.Array         # [FCAP, 3]
    xyt_W: jax.Array         # [FCAP, 3, 3]
    n_xyt: jax.Array         # int32 scalar
    pos_node: jax.Array      # [FCAP_POS] int32
    pos_z: jax.Array         # [FCAP_POS, 3]
    pos_W: jax.Array         # [FCAP_POS, 3, 3]
    n_pos: jax.Array         # int32 scalar

    # --- counters / policy state ---
    start_over: jax.Array    # int32 scalar (tr->start_over)
    spd_ok: jax.Array        # bool scalar — AND of every frontal SPD check
                             # since the last batch epoch (cumulative, so the
                             # policy needs only the NEWEST stats readback)
    nnodes: jax.Array        # int32 scalar

    # --- per-step metrics ring (device-side so replay never syncs) ---
    chi2_log: jax.Array      # [LOGCAP]
    log_ptr: jax.Array       # int32 scalar


def init_device_state(cfg: SolverConfig) -> DeviceState:
    NCAP = cfg.node_capacity
    FCAP = cfg.factor_capacity
    FPOS = max(256, cfg.factor_capacity // 8)
    BCAP = cfg.row_block_capacity
    dt = cfg.jnp_dtype
    f = lambda *s: jnp.zeros(s, dtype=dt)
    i = lambda *s: jnp.zeros(s, dtype=jnp.int32)
    return DeviceState(
        R_blocks=f(NCAP, BCAP, 3, 3),
        R_idx=jnp.full((NCAP, BCAP), NCAP, dtype=jnp.int32),
        R_nnz=i(NCAP),
        y=f(NCAP, 3),
        state=f(NCAP, 3),
        l_point=f(NCAP, 3),
        delta_X=f(NCAP, 3),
        relinearized=jnp.zeros(NCAP, dtype=bool),
        pos=i(NCAP),
        order=i(NCAP),
        xyt_a=i(FCAP),
        xyt_b=i(FCAP),
        xyt_z=f(FCAP, 3),
        xyt_W=f(FCAP, 3, 3),
        n_xyt=jnp.int32(0),
        pos_node=i(FPOS),
        pos_z=f(FPOS, 3),
        pos_W=f(FPOS, 3, 3),
        n_pos=jnp.int32(0),
        start_over=jnp.int32(0),
        spd_ok=jnp.asarray(True),
        nnodes=jnp.int32(0),
        chi2_log=f(cfg.effective_log_capacity),
        log_ptr=jnp.int32(0),
    )


def state_chi2(ds: DeviceState, dtype=None):
    """Fused graph chi2 at the current states with the reference's
    0.5x/1.0x convention (april_graph.c:79-98), masked over padded tables."""
    from ..factors import graph_chi2

    FCAP = ds.xyt_a.shape[0]
    FPOS = ds.pos_node.shape[0]
    xyt_valid = jnp.arange(FCAP, dtype=jnp.int32) < ds.n_xyt
    pos_valid = jnp.arange(FPOS, dtype=jnp.int32) < ds.n_pos
    # clip padded endpoints into range for safe gather
    return graph_chi2(
        ds.state,
        jnp.where(xyt_valid, ds.xyt_a, 0),
        jnp.where(xyt_valid, ds.xyt_b, 0),
        ds.xyt_z,
        ds.xyt_W,
        jnp.where(pos_valid, ds.pos_node, 0),
        ds.pos_z,
        ds.pos_W,
        xyt_valid=xyt_valid,
        pos_valid=pos_valid,
    )
