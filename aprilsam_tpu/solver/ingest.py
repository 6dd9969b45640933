"""Host graph -> device table ingestion (outside the hot path).

Copies the [from_node:) and [from_factor:) tails of a FactorGraph into the
padded device tables.  The incremental solver ingests new factors *inside*
its step jit instead (no extra dispatches); this path serves batch-mode and
solver (re)initialization.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..graph import FactorGraph, FACTOR_XYT, FACTOR_XYTPOS
from .config import SolverConfig
from .state import DeviceState


def ingest_graph(
    ds: DeviceState,
    g: FactorGraph,
    cfg: SolverConfig,
    from_node: int,
    from_factor: int,
    to_node: int = None,
    to_factor: int = None,
) -> DeviceState:
    """to_node/to_factor bound the ingested span (default: the whole graph).
    Superstep capacity-flushes dispatch a buffer whose last entry predates
    the caller's current step, so their fallback ingestion must stop at the
    buffered span rather than swallow the pending step's tail."""
    dt = ds.state.dtype
    n_end = g.nnodes if to_node is None else to_node
    f_end = g.nfactors if to_factor is None else to_factor
    if n_end > cfg.node_capacity:
        raise OverflowError(
            f"{n_end} nodes exceed node_capacity {cfg.node_capacity}"
        )

    if n_end > from_node:
        sl = slice(from_node, n_end)
        idx = jnp.arange(from_node, n_end)
        st = jnp.asarray(g.state[sl], dtype=dt)
        lp = jnp.asarray(g.l_point[sl], dtype=dt)
        ds = ds._replace(
            state=ds.state.at[idx].set(st),
            l_point=ds.l_point.at[idx].set(lp),
            delta_X=ds.delta_X.at[idx].set(0.0),
            nnodes=jnp.int32(n_end),
        )

    if f_end > from_factor:
        types = g.ftype[from_factor : f_end]
        nodes = g.fnodes[from_factor : f_end]
        z = g.fz[from_factor : f_end]
        W = g.fW[from_factor : f_end]

        m_xyt = types == FACTOR_XYT
        k_xyt = int(np.sum(m_xyt))
        if k_xyt:
            n0 = int(ds.n_xyt)
            if n0 + k_xyt > ds.xyt_a.shape[0]:
                raise OverflowError("xyt factor capacity exceeded")
            idx = jnp.arange(n0, n0 + k_xyt)
            ds = ds._replace(
                xyt_a=ds.xyt_a.at[idx].set(jnp.asarray(nodes[m_xyt, 0])),
                xyt_b=ds.xyt_b.at[idx].set(jnp.asarray(nodes[m_xyt, 1])),
                xyt_z=ds.xyt_z.at[idx].set(jnp.asarray(z[m_xyt], dtype=dt)),
                xyt_W=ds.xyt_W.at[idx].set(jnp.asarray(W[m_xyt], dtype=dt)),
                n_xyt=jnp.int32(n0 + k_xyt),
            )

        m_pos = types == FACTOR_XYTPOS
        k_pos = int(np.sum(m_pos))
        if k_pos:
            n0 = int(ds.n_pos)
            if n0 + k_pos > ds.pos_node.shape[0]:
                raise OverflowError("xytpos factor capacity exceeded")
            idx = jnp.arange(n0, n0 + k_pos)
            ds = ds._replace(
                pos_node=ds.pos_node.at[idx].set(jnp.asarray(nodes[m_pos, 0])),
                pos_z=ds.pos_z.at[idx].set(jnp.asarray(z[m_pos], dtype=dt)),
                pos_W=ds.pos_W.at[idx].set(jnp.asarray(W[m_pos], dtype=dt)),
                n_pos=jnp.int32(n0 + k_pos),
            )

    return ds
