"""Isolated superstep cost: capture a real plan mid-replay, re-dispatch in a
chained loop (donated state feeds back), block once.  Separates h2d, kernel,
and readback costs from replay-loop noise."""
import time
import numpy as np
import jax, jax.numpy as jnp

from aprilsam_tpu.utils import enable_compilation_cache, setup_precision
enable_compilation_cache()
setup_precision()
print("platform:", jax.devices()[0].platform, flush=True)

from aprilsam_tpu.io import load_g2o_text
from aprilsam_tpu.replay import Replay
from aprilsam_tpu.solver import SolverConfig
from aprilsam_tpu.solver import incremental as I

loaded = load_g2o_text("/root/reference/data/M3500.txt")
cfg = SolverConfig(
    dtype=np.float32, node_capacity=4096, factor_capacity=8192,
    row_block_capacity=96, panel_nodes=128, wallclock_gate=False,
    policy_lag=2, policy_poll=2, superstep_size=64, log_chi2=False,
    batch_backend="panel",
)

captured = []
orig = I.inc_superstep
def capture(ds, packed, **kw):
    captured.append((np.asarray(packed), dict(kw)))
    return orig(ds, packed, **kw)
I.inc_superstep = capture

rep = Replay(loaded, cfg, deferred=True)
n = 0
while n < 3500:
    if rep.step() is None:
        break
    n += 1
I.inc_superstep = orig
solver = rep.solver
solver._dispatch_queue()
jax.block_until_ready(solver.ds.state)
print(f"captured {len(captured)} plans after {n} steps", flush=True)

by_m = {}
for p, kw in captured:
    by_m.setdefault(kw["MAXAFF"], (p, kw))
for M, (p, kw) in sorted(by_m.items()):
    packed = jnp.asarray(p)
    jax.block_until_ready(packed)
    ds = solver.ds
    # warm (already compiled during replay)
    ds, st = orig(ds, packed, **kw)
    jax.block_until_ready(st)
    N = 20
    t0 = time.perf_counter()
    for _ in range(N):
        ds, st = orig(ds, packed, **kw)
    jax.block_until_ready(st)
    dt = (time.perf_counter() - t0) / N * 1e3
    # h2d cost alone
    t0 = time.perf_counter()
    for _ in range(N):
        x = jnp.asarray(p)
    jax.block_until_ready(x)
    dh = (time.perf_counter() - t0) / N * 1e3
    # readback cost (stats only)
    t0 = time.perf_counter()
    for _ in range(N):
        _ = np.asarray(st)
    dr = (time.perf_counter() - t0) / N * 1e3
    print(f"M={M:5d} npanb={kw['NPANB']}: superstep {dt:7.2f} ms  "
          f"h2d({p.nbytes//1024}KB) {dh:6.2f} ms  stats-read {dr:6.2f} ms",
          flush=True)
    solver.ds = ds

# batch epoch cost, chained
from aprilsam_tpu.solver.batch import run_batch_epoch
g = rep.graph
t0 = time.perf_counter()
N = 5
for _ in range(N):
    solver.ds, solver.sym, info = run_batch_epoch(
        solver.ds, cfg, g.nnodes, g.ftype[:g.nfactors], g.fnodes[:g.nfactors],
        log_mode=2, lazy=True)
jax.block_until_ready(solver.ds.state)
print(f"batch epoch (n={g.nnodes}): {(time.perf_counter()-t0)/N*1e3:.2f} ms",
      flush=True)
