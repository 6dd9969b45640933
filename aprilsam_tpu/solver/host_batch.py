"""Host (native C) batch epoch backend.

At M3500 scale the batch factorization is a ~10 MFLOP sparse problem —
orders of magnitude below accelerator dispatch overhead — so the default
batch backend runs the whole epoch in native float64 on the host
(native/sam_native.c) and pushes the resulting solver state (block-sparse R,
y, states) to the device in one transfer batch.  Semantics are exactly the
reference's one-Gauss-Newton-step batch (april_graph_cholesky,
aprilsam.c:87-375), in the reference's own precision.

The device-dense backend (batch.py) remains for float32 validation and for
configurations where the host would be the bottleneck.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np

from .. import native
from ..graph import FACTOR_XYT
from .batch import BatchInfo
from .config import SolverConfig
from .state import DeviceState
from .symbolic import SymbolicState


def _adjacency_csr(nnodes: int, ftypes, fnodes) -> Tuple[np.ndarray, np.ndarray]:
    m = ftypes == FACTOR_XYT
    a = fnodes[m, 0].astype(np.int64)
    b = fnodes[m, 1].astype(np.int64)
    src = np.concatenate([a, b])
    dst = np.concatenate([b, a])
    order = np.argsort(src, kind="stable")
    src, dst = src[order], dst[order]
    ptr = np.zeros(nnodes + 1, dtype=np.int32)
    np.add.at(ptr, src + 1, 1)
    ptr = np.cumsum(ptr).astype(np.int32)
    return ptr, dst.astype(np.int32)


def host_batch_epoch(
    ds: DeviceState,
    cfg: SolverConfig,
    nnodes: int,
    ftypes: np.ndarray,
    fnodes: np.ndarray,
    fz: np.ndarray,
    fW: np.ndarray,
    log_mode: int = 0,
) -> Tuple[DeviceState, SymbolicState, BatchInfo]:
    NCAP = cfg.node_capacity
    BCAP = cfg.row_block_capacity

    adj_ptr, adj_idx = _adjacency_csr(nnodes, ftypes, fnodes)
    order = native.order_md(nnodes, adj_ptr, adj_idx)
    patterns, nnz, parents, maxnnz = native.symbolic(
        nnodes, adj_ptr, adj_idx, order, BCAP)

    # current states come from the device (one fetch; batches are rare)
    states = np.asarray(ds.state[:nnodes], dtype=np.float64)

    # float64 host epochs need only 1 GN iteration for reference parity, but
    # honor an explicit gn_iters request (e.g. the distributed-solve tests
    # compare multi-iteration optima)
    iters = cfg.gn_iters if cfg.gn_iters is not None else 1
    m_xyt = ftypes == FACTOR_XYT
    cur = states
    for _ in range(max(1, iters)):
        blocks, y, x, new_states, delta, chi2, spd = native.batch_solve(
            nnodes, cur,
            fnodes[m_xyt, 0], fnodes[m_xyt, 1], fz[m_xyt], fW[m_xyt],
            fnodes[~m_xyt, 0], fz[~m_xyt], fW[~m_xyt],
            order, BCAP, patterns, nnz, cfg.tikhonov,
        )
        states = cur  # linearization points of the final iteration
        cur = new_states

    # build the SymbolicState mirror for the incremental engine
    pos = np.empty(nnodes, dtype=np.int32)
    pos[order] = np.arange(nnodes, dtype=np.int32)
    sym = SymbolicState(
        order=order, pos=pos,
        patterns=[patterns[p, : nnz[p]].copy() for p in range(nnodes)],
        parents=parents.copy(),
    )
    sym.rebuild_children()

    # pack padded device arrays
    dt = ds.R_blocks.dtype
    R_blocks = np.zeros((NCAP, BCAP, 3, 3), dtype=dt)
    R_blocks[:nnodes] = blocks
    R_idx = np.full((NCAP, BCAP), NCAP, dtype=np.int32)
    idx = patterns.copy()
    idx[idx >= nnodes] = NCAP
    R_idx[:nnodes] = idx
    R_nnz = np.zeros(NCAP, dtype=np.int32)
    R_nnz[:nnodes] = nnz
    y_full = np.zeros((NCAP, 3), dtype=dt)
    y_full[:nnodes] = np.asarray(y).reshape(nnodes, 3)
    st = np.asarray(ds.state)
    st_new = st.copy()
    st_new[:nnodes] = new_states
    # relinearize-all happened BEFORE the solve: the stored linearization
    # points are the pre-update states (aprilsam.c:131-135), and R/y are
    # consistent with them
    lp_new = st.copy()
    lp_new[:nnodes] = states
    dx = np.asarray(ds.delta_X)
    dx_new = dx.copy()
    dx_new[:nnodes] = delta
    pos_full = np.arange(NCAP, dtype=np.int32)
    pos_full[:nnodes] = pos
    order_full = np.arange(NCAP, dtype=np.int32)
    order_full[:nnodes] = order

    log_ptr = int(ds.log_ptr)
    chi2_log = ds.chi2_log
    LOG = chi2_log.shape[0]
    if log_mode == 0:
        if log_ptr < LOG:  # overflow drops; chi2_history() raises on readback
            chi2_log = chi2_log.at[log_ptr].set(chi2)
        log_ptr += 1
    elif log_mode == 1:
        if 0 <= log_ptr - 1 < LOG:
            chi2_log = chi2_log.at[log_ptr - 1].set(chi2)

    ds = ds._replace(
        R_blocks=jnp.asarray(R_blocks),
        R_idx=jnp.asarray(R_idx),
        R_nnz=jnp.asarray(R_nnz),
        y=jnp.asarray(y_full),
        state=jnp.asarray(st_new),
        l_point=jnp.asarray(lp_new),
        delta_X=jnp.asarray(dx_new),
        relinearized=jnp.zeros_like(ds.relinearized),
        pos=jnp.asarray(pos_full),
        order=jnp.asarray(order_full),
        start_over=jnp.int32(0),
        spd_ok=jnp.asarray(True),
        chi2_log=chi2_log,
        log_ptr=jnp.int32(log_ptr),
    )
    return ds, sym, BatchInfo(chi2=chi2, spd=spd, n=nnodes)
