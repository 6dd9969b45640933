"""Panel-level dependency DAG at M3500: how wide are the waves?

A left-looking panel k depends on panel j < k when any contributor row of
panel k lives in panel j.  Wave level[k] = 1 + max(level over deps).  If
waves are wide near the leaves, batching panels per wave amortizes the
per-scan-step latency of the Gram/chol stages.
"""
import os
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import numpy as np

from aprilsam_tpu.io import load_g2o_text
from aprilsam_tpu.solver import SolverConfig
from aprilsam_tpu.solver import panel_epoch as PE
from aprilsam_tpu.solver.host_batch import _adjacency_csr
from aprilsam_tpu.solver.symbolic import SymbolicState
from aprilsam_tpu import native

loaded = load_g2o_text("/root/reference/data/M3500.txt")
cfg = SolverConfig(dtype=np.float32, node_capacity=4096, factor_capacity=8192,
                   row_block_capacity=96, panel_nodes=128,
                   batch_backend="panel")
nn = loaded.nnodes
ftypes = np.concatenate([[2], loaded.ftype[:loaded.nfactors]]).astype(np.int32)
fnodes = np.concatenate([[[0, -1]], loaded.fnodes[:loaded.nfactors]]).astype(np.int32)

adj_ptr, adj_idx = _adjacency_csr(nn, ftypes, fnodes)
order = native.order_md(nn, adj_ptr, adj_idx)
patterns, nnzv, parents, _ = native.symbolic(nn, adj_ptr, adj_idx, order, 96)
pos = np.empty(nn, dtype=np.int32)
pos[order] = np.arange(nn, dtype=np.int32)
sym = SymbolicState(order=order, pos=pos, patterns=[], parents=parents)
NCAP, BCAP, PANEL = 4096, 96, 128
pad_idx = np.full((NCAP, BCAP), NCAP, np.int32)
vm = np.arange(BCAP)[None, :] < nnzv[:, None]
pad_idx[:nn][vm] = patterns[vm]
pad_nnz = np.zeros(NCAP, np.int32)
pad_nnz[:nn] = nnzv

plan = PE.build_panel_plan(cfg, nn, sym, pad_idx, pad_nnz, ftypes, fnodes)
npan_act = -(-nn // PANEL)
print(f"npanb={plan.npanb} active={npan_act}")

crow_all = np.concatenate(plan.crows, axis=1)
mc = (crow_all < NCAP - 1).sum(axis=1)
level = np.zeros(plan.npanb, dtype=np.int64)
for k in range(plan.npanb):
    cr = crow_all[k][crow_all[k] < NCAP - 1]
    if len(cr) == 0:
        level[k] = 0
        continue
    dep_pan = np.unique(cr // PANEL)
    level[k] = 1 + level[dep_pan].max()

print("level per panel:", level[:npan_act].tolist())
print("mc per panel:   ", mc[:npan_act].tolist())
nlev = level[:npan_act].max() + 1
print(f"waves: {nlev} (vs {npan_act} sequential)")
for lv in range(nlev):
    members = np.nonzero(level[:npan_act] == lv)[0]
    print(f"  wave {lv}: {len(members)} panels {members.tolist()} "
          f"mc={mc[members].tolist()}")
