"""TPU profile: full M3500 replay in superstep mode.

Mirrors the bench worker's protocol (warmup + precompile, then a timed
deferred replay) with the superstep configuration."""
import time
import numpy as np
import jax

from aprilsam_tpu.utils import enable_compilation_cache, setup_precision
enable_compilation_cache()
setup_precision()

platform = jax.devices()[0].platform
print("platform:", platform, flush=True)

from aprilsam_tpu.io import load_g2o_text
from aprilsam_tpu.replay import Replay
from aprilsam_tpu.solver import SolverConfig
from aprilsam_tpu.solver.state import init_device_state

M3500 = "/root/reference/data/M3500.txt"
loaded = load_g2o_text(M3500)

cfg = SolverConfig(
    dtype=np.float32,
    node_capacity=4096,
    factor_capacity=8192,
    row_block_capacity=96,
    panel_nodes=128,
    wallclock_gate=False,
    policy_lag=2,
    policy_poll=1,
    superstep_size=32,
    log_chi2=False,
    batch_backend="device",
)

t0 = time.time()
warm = Replay(loaded, cfg, deferred=True)
warm.run(max_steps=60)
print(f"warm prefix done {time.time()-t0:.1f}s", flush=True)
sigs = warm.solver.default_signatures(nnodes=loaded.nnodes)
print("signatures:", sigs, flush=True)
for i, sig in enumerate(sigs):
    t1 = time.time()
    warm.solver.precompile(signatures=(sig,))
    print(f"precompile {i+1}/{len(sigs)} {sig}: {time.time()-t1:.1f}s", flush=True)
from aprilsam_tpu.solver.batch import precompile_device_batch
_, nexp = precompile_device_batch(init_device_state(cfg), cfg, loaded.nnodes)
print(f"precompile_expand n={nexp} {time.time()-t0:.1f}s total warm", flush=True)
del warm

rep = Replay(loaded, cfg, deferred=True)
t0 = time.perf_counter()
n = 0
seg_t = time.perf_counter()
while True:
    res = rep.step()
    if res is None:
        break
    n += 1
    if n % 500 == 0:
        now = time.perf_counter()
        print(f"steps {n}: seg {(now-seg_t)/500*1e3:6.2f} ms/step", flush=True)
        seg_t = now
rep.solver.flush(rep.graph)
jax.block_until_ready(rep.solver.ds.state)
total = time.perf_counter() - t0
chi2 = rep.solver.chi2()
print(f"total: {total:.2f}s = {n/total:.1f} poses/s  chi2={chi2:.4f}", flush=True)
import json
print("counters:", json.dumps(rep.solver.counters), flush=True)
