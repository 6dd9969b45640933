"""Epoch-only TPU timing at full M3500 (no replay): chained run_batch_epoch.

Env knobs: ASN_GRAM_HIGH=1 (Gram at bf16x3), ASN_PANEL=N (panel_nodes).
"""
import os
import time
import numpy as np
import jax
import jax.numpy as jnp

from aprilsam_tpu.utils import enable_compilation_cache, setup_precision
enable_compilation_cache()
setup_precision()
print("platform:", jax.devices()[0].platform,
      "gram_high:", bool(os.environ.get("ASN_GRAM_HIGH")),
      "panel:", os.environ.get("ASN_PANEL", "128"), flush=True)

from aprilsam_tpu.io import load_g2o_text
from aprilsam_tpu.graph import FactorGraph
from aprilsam_tpu.replay import GEOPIN_W
from aprilsam_tpu.solver import SolverConfig
from aprilsam_tpu.solver import batch as B
from aprilsam_tpu.solver.batch import BatchSolver

loaded = load_g2o_text("/root/reference/data/M3500.txt")
cfg = SolverConfig(dtype=np.float32, node_capacity=4096, factor_capacity=8192,
                   row_block_capacity=96,
                   panel_nodes=int(os.environ.get("ASN_PANEL", "128")),
                   batch_backend="panel", log_chi2=False)
g = FactorGraph()
for i in range(loaded.nnodes):
    g.add_node(loaded.state[i])
g.add_factor_xytpos(0, loaded.state[0], GEOPIN_W)
for f in range(loaded.nfactors):
    a, b = loaded.fnodes[f]
    g.add_factor_xyt(int(a), int(b), loaded.fz[f], loaded.fW[f])

solver = BatchSolver(cfg)
info = solver.solve(g)
print(f"first epoch chi2={float(info.chi2):.4f}", flush=True)

ds = solver.ds
t_host = []
N = 8
t0 = time.perf_counter()
for _ in range(N):
    th = time.perf_counter()
    ds, sym, info = B.run_batch_epoch(
        ds, cfg, g.nnodes, g.ftype[:g.nfactors], g.fnodes[:g.nfactors],
        log_mode=2, lazy=True)
    t_host.append(time.perf_counter() - th)
jax.block_until_ready(ds.state)
total = time.perf_counter() - t0
print(f"epoch total: {total/N*1e3:.1f} ms  (dispatch-side host "
      f"{np.mean(t_host)*1e3:.1f} ms)  chi2={float(info.chi2):.4f}",
      flush=True)
