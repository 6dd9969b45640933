"""TPU profile: per-phase breakdown of the superstep replay."""
import time
import numpy as np
import jax

from aprilsam_tpu.utils import enable_compilation_cache, setup_precision
enable_compilation_cache()
setup_precision()
print("platform:", jax.devices()[0].platform, flush=True)

from aprilsam_tpu.io import load_g2o_text
from aprilsam_tpu.replay import Replay
from aprilsam_tpu.solver import SolverConfig
from aprilsam_tpu.solver import incremental as I

M3500 = "/root/reference/data/M3500.txt"
loaded = load_g2o_text(M3500)

cfg = SolverConfig(
    dtype=np.float32, node_capacity=4096, factor_capacity=8192,
    row_block_capacity=96, panel_nodes=128, wallclock_gate=False,
    policy_lag=2, policy_poll=1, superstep_size=32, log_chi2=False,
    batch_backend="device",
)

acc = {}
cnt = {}
def timed(name, fn):
    def w(*a, **k):
        t0 = time.perf_counter()
        r = fn(*a, **k)
        acc[name] = acc.get(name, 0.0) + time.perf_counter() - t0
        cnt[name] = cnt.get(name, 0) + 1
        return r
    return w

I.plan_step = timed("plan", I.plan_step)
I.pack_plan = timed("pack", I.pack_plan)
_orig_sup = I.inc_superstep
I.inc_superstep = timed("dispatch_sup", _orig_sup)

rep = Replay(loaded, cfg, deferred=True)
solver = rep.solver
solver._drain_pending = timed("drain_policy", solver._drain_pending)
solver._run_batch = timed("batch", solver._run_batch)

t0 = time.perf_counter()
n = 0
seg_t = t0
while True:
    res = rep.step()
    if res is None:
        break
    n += 1
    if n % 500 == 0:
        now = time.perf_counter()
        print(f"steps {n}: seg {(now-seg_t)/500*1e3:6.2f} ms/step", flush=True)
        seg_t = now
tf = time.perf_counter()
rep.solver.flush(rep.graph)
jax.block_until_ready(rep.solver.ds.state)
total = time.perf_counter() - t0
acc["final_flush"] = time.perf_counter() - tf
chi2 = rep.solver.chi2()
print(f"total: {total:.2f}s = {n/total:.1f} poses/s  chi2={chi2:.4f}", flush=True)
import json
print("counters:", json.dumps(rep.solver.counters), flush=True)
for k in sorted(acc, key=lambda k: -acc[k]):
    print(f"  {k:15s} {acc[k]:7.2f}s  n={cnt.get(k,1)}", flush=True)
