"""Host-side panel-plan statistics at M3500 (no TPU needed)."""
import os
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import time
import numpy as np

from aprilsam_tpu.io import load_g2o_text
from aprilsam_tpu.solver import SolverConfig
from aprilsam_tpu.solver import panel_epoch as PE
from aprilsam_tpu.solver.host_batch import _adjacency_csr
from aprilsam_tpu.solver.symbolic import SymbolicState
from aprilsam_tpu import native
from aprilsam_tpu.graph import FACTOR_XYT

loaded = load_g2o_text("/root/reference/data/M3500.txt")
cfg = SolverConfig(dtype=np.float32, node_capacity=4096, factor_capacity=8192,
                   row_block_capacity=96, panel_nodes=128,
                   batch_backend="panel")
nn = loaded.nnodes
# full factor table + geopin prior like the replay builds
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

t0 = time.perf_counter()
plan = PE.build_panel_plan(cfg, nn, sym, pad_idx, pad_nnz, ftypes, fnodes)
print(f"plan host: {(time.perf_counter()-t0)*1e3:.1f} ms")
print(f"dims: npanb={plan.npanb} mc_cap={plan.mc_cap} nu_cap={plan.nu_cap} "
      f"mult={plan.mult} kexta={plan.kexta} nfac3={plan.nfac3}")

# per-panel real mc / nu (summed over the seg_ladder grade tables; each
# panel is live in exactly one grade)
mc = sum((cg < NCAP - 1).sum(axis=1) for cg in plan.crows)
nu = sum((ug < NCAP).sum(axis=1) for ug in plan.ucolss)
print("gbounds:", plan.gbounds.tolist(),
      "ladder:", PE.seg_ladder(plan.mc_cap, plan.nu_cap))
print("mc per panel:", mc.tolist())
print("nu per panel:", nu.tolist())
print(f"mc: mean={mc.mean():.0f} max={mc.max()} sum={mc.sum()}")
print(f"nu: mean={nu.mean():.0f} max={nu.max()}")

# contributor window widths: suffix of contributor row's pattern with col >= panel start
rows_i, slots_i = np.nonzero(np.arange(BCAP)[None, :] < nnzv[:, None])
cols_i = pad_idx[rows_i, slots_i]
widths_all = []
for p in range(plan.npanb):
    cr = plan.crow[p][plan.crow[p] < NCAP - 1]
    if len(cr) == 0:
        continue
    w = np.array([np.count_nonzero(pad_idx[r, :pad_nnz[r]] >= p * PANEL)
                  for r in cr])
    widths_all.append(w)
w = np.concatenate(widths_all)
print(f"window widths: mean={w.mean():.2f} p50={np.percentile(w,50):.0f} "
      f"p90={np.percentile(w,90):.0f} p99={np.percentile(w,99):.0f} max={w.max()}")
print(f"nnz: mean={nnzv.mean():.2f} max={nnzv.max()}")
