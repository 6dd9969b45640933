"""Decompose the panel epoch: assembly vs scan vs backsub, on TPU."""
import time
import numpy as np
import jax, jax.numpy as jnp
from functools import partial
from aprilsam_tpu.utils import enable_compilation_cache, setup_precision
enable_compilation_cache()
setup_precision()
print("platform:", jax.devices()[0].platform, flush=True)

from aprilsam_tpu.io import load_g2o_text
from aprilsam_tpu.replay import Replay
from aprilsam_tpu.solver import SolverConfig
from aprilsam_tpu.solver import panel_epoch as PE
from aprilsam_tpu.solver.host_batch import _adjacency_csr
from aprilsam_tpu.solver.symbolic import SymbolicState
from aprilsam_tpu import native

loaded = load_g2o_text("/root/reference/data/M3500.txt")
cfg = SolverConfig(
    dtype=np.float32, node_capacity=4096, factor_capacity=8192,
    row_block_capacity=96, panel_nodes=128, wallclock_gate=False,
    policy_lag=2, policy_poll=1, superstep_size=32, log_chi2=False,
    batch_backend="panel",
)
rep = Replay(loaded, cfg, deferred=True)
n = 0
while n < 3400:
    if rep.step() is None:
        break
    n += 1
solver = rep.solver
solver._dispatch_queue()
jax.block_until_ready(solver.ds.state)
g = rep.graph
nn = g.nnodes
print(f"replayed nn={nn}", flush=True)

ftypes = g.ftype[:g.nfactors]; fnodes = g.fnodes[:g.nfactors]
adj_ptr, adj_idx = _adjacency_csr(nn, ftypes, fnodes)
order = native.order_md(nn, adj_ptr, adj_idx)
patterns, nnzv, parents, _ = native.symbolic(nn, adj_ptr, adj_idx, order, 96)
pos = np.empty(nn, dtype=np.int32); pos[order] = np.arange(nn, dtype=np.int32)
sym = SymbolicState(order=order, pos=pos, patterns=[], parents=parents)
pad_idx = np.full((4096, 96), 4096, np.int32)
vm = np.arange(96)[None,:] < nnzv[:,None]
pad_idx[:nn][vm] = patterns[vm]
pad_nnz = np.zeros(4096, np.int32); pad_nnz[:nn] = nnzv
t0 = time.perf_counter()
plan = PE.build_panel_plan(cfg, nn, sym, pad_idx, pad_nnz, ftypes, fnodes)
print(f"plan host: {(time.perf_counter()-t0)*1e3:.1f} ms  dims=({plan.npanb},{plan.mc_cap},{plan.nu_cap},{plan.mult},{plan.kexta},{plan.nfac3})", flush=True)
bb = PE.pack_pep(plan, 4096, 96, 2)
bbj = jnp.asarray(bb)
jax.block_until_ready(bbj)
t0 = time.perf_counter()
for _ in range(5):
    x = jnp.asarray(bb)
jax.block_until_ready(x)
print(f"upload ({bb.nbytes//1024} KB): {(time.perf_counter()-t0)/5*1e3:.1f} ms", flush=True)

ds = solver.ds
tik = jnp.asarray(cfg.tikhonov, dtype=cfg.jnp_dtype)
dims = dict(NPANB=plan.npanb, MC=plan.mc_cap, NU=plan.nu_cap, MULT=plan.mult,
            KEXTA=plan.kexta, NFAC3=plan.nfac3, PANEL=128,
            BPACK=plan.bpack, PMAX16=plan.pmax16)

# full kernel chained (state not donated-restored; reuse returned ds)
ds2, c2, spd = PE.panel_epoch_step(ds, bbj, tik, **dims)
jax.block_until_ready(ds2.state)
t0 = time.perf_counter()
N = 8
for _ in range(N):
    ds2, c2, spd = PE.panel_epoch_step(ds2, bbj, tik, **dims)
jax.block_until_ready(ds2.state)
print(f"full kernel: {(time.perf_counter()-t0)/N*1e3:.1f} ms chi2={float(c2):.3f}", flush=True)
