"""TPU: panel epoch under 'high' (bf16x3) vs 'highest' matmul precision."""
import time, dataclasses, os
import numpy as np
import jax, jax.numpy as jnp
from aprilsam_tpu.utils import enable_compilation_cache
enable_compilation_cache()
PREC = os.environ.get("ASN_PREC", "highest")
jax.config.update("jax_default_matmul_precision", "highest")
print("platform:", jax.devices()[0].platform, "precision:", PREC, flush=True)

from aprilsam_tpu.io import load_g2o_text
from aprilsam_tpu.replay import Replay
from aprilsam_tpu.solver import SolverConfig
from aprilsam_tpu.solver import batch as B

loaded = load_g2o_text("/root/reference/data/M3500.txt")
cfg = SolverConfig(
    dtype=np.float32, node_capacity=4096, factor_capacity=8192,
    row_block_capacity=96, panel_nodes=128, wallclock_gate=False,
    policy_lag=2, policy_poll=1, superstep_size=64, log_chi2=False,
    batch_backend="panel",
)
t0 = time.perf_counter()
rep = Replay(loaded, cfg, deferred=True)
n = 0
while True:
    if rep.step() is None: break
    n += 1
rep.solver.flush(rep.graph)
jax.block_until_ready(rep.solver.ds.state)
total = time.perf_counter() - t0
chi2 = rep.solver.chi2()
print(f"FULL replay: {total:.2f}s = {n/total:.1f} poses/s chi2={chi2:.4f}", flush=True)
print("counters:", rep.solver.counters, flush=True)

g = rep.graph
solver = rep.solver
solver.ds, solver.sym, info = B.run_batch_epoch(
    solver.ds, cfg, g.nnodes, g.ftype[:g.nfactors], g.fnodes[:g.nfactors],
    log_mode=2, lazy=True)
jax.block_until_ready(solver.ds.state)
t0 = time.perf_counter()
N = 8
for _ in range(N):
    solver.ds, solver.sym, info = B.run_batch_epoch(
        solver.ds, cfg, g.nnodes, g.ftype[:g.nfactors], g.fnodes[:g.nfactors],
        log_mode=2, lazy=True)
jax.block_until_ready(solver.ds.state)
print(f"panel epoch: {(time.perf_counter()-t0)/N*1e3:.1f} ms chi2={float(info.chi2):.3f}", flush=True)
