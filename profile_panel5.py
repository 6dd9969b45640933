"""TPU: panel epoch variants — PANEL width and matmul precision."""
import time, dataclasses
import numpy as np
import jax, jax.numpy as jnp
from aprilsam_tpu.utils import enable_compilation_cache, setup_precision
enable_compilation_cache()
setup_precision()
print("platform:", jax.devices()[0].platform, flush=True)

from aprilsam_tpu.io import load_g2o_text
from aprilsam_tpu.replay import Replay
from aprilsam_tpu.solver import SolverConfig
from aprilsam_tpu.solver import batch as B

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
    if rep.step() is None: break
    n += 1
solver = rep.solver; solver._dispatch_queue()
jax.block_until_ready(solver.ds.state)
g = rep.graph
print(f"replayed nn={g.nnodes}", flush=True)

for panel in (128, 256):
    c2 = dataclasses.replace(cfg, panel_nodes=panel)
    try:
        solver.ds, solver.sym, info = B.run_batch_epoch(
            solver.ds, c2, g.nnodes, g.ftype[:g.nfactors], g.fnodes[:g.nfactors],
            log_mode=2, lazy=True)
        jax.block_until_ready(solver.ds.state)
        t0 = time.perf_counter()
        N = 8
        for _ in range(N):
            solver.ds, solver.sym, info = B.run_batch_epoch(
                solver.ds, c2, g.nnodes, g.ftype[:g.nfactors],
                g.fnodes[:g.nfactors], log_mode=2, lazy=True)
        jax.block_until_ready(solver.ds.state)
        print(f"panel={panel}: {(time.perf_counter()-t0)/N*1e3:.1f} ms chi2={float(info.chi2):.3f}", flush=True)
    except Exception as e:
        print(f"panel={panel}: FAILED {type(e).__name__} {e}", flush=True)
