"""TPU: decompose run_batch_epoch cost at M3500 scale."""
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
from aprilsam_tpu.solver import batch as B
from aprilsam_tpu.solver.host_batch import _adjacency_csr
from aprilsam_tpu import native

loaded = load_g2o_text("/root/reference/data/M3500.txt")
cfg = SolverConfig(
    dtype=np.float32, node_capacity=4096, factor_capacity=8192,
    row_block_capacity=96, panel_nodes=128, wallclock_gate=False,
    policy_lag=2, policy_poll=1, superstep_size=32, log_chi2=False,
    batch_backend="device",
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
nnodes = g.nnodes
print(f"replayed {n} steps, nnodes={nnodes}", flush=True)

ftypes = g.ftype[:g.nfactors]; fnodes = g.fnodes[:g.nfactors]
NCAP, BCAP = cfg.node_capacity, cfg.row_block_capacity

def host_symbolic():
    adj_ptr, adj_idx = _adjacency_csr(nnodes, ftypes, fnodes)
    order = native.order_md(nnodes, adj_ptr, adj_idx)
    patterns, nnz, parents, _ = native.symbolic(nnodes, adj_ptr, adj_idx, order, BCAP)
    return order, patterns, nnz, parents

for name, fn in (("host_symbolic", host_symbolic),):
    fn()
    t0 = time.perf_counter()
    for _ in range(5):
        fn()
    print(f"{name}: {(time.perf_counter()-t0)/5*1e3:.1f} ms", flush=True)

# full epoch chained
t0 = time.perf_counter()
N = 5
for _ in range(N):
    solver.ds, solver.sym, info = B.run_batch_epoch(
        solver.ds, cfg, nnodes, ftypes, fnodes, log_mode=2, lazy=True)
jax.block_until_ready(solver.ds.state)
print(f"full epoch (n={nnodes}): {(time.perf_counter()-t0)/N*1e3:.1f} ms", flush=True)

# device step alone, chained (reuse one symb upload)
order, patterns, nnz, parents = host_symbolic()
pos = np.empty(nnodes, dtype=np.int32); pos[order] = np.arange(nnodes, dtype=np.int32)
valid = np.arange(BCAP, dtype=np.int32)[None,:] < nnz[:,None]
R_idx_np = np.full((NCAP, BCAP), NCAP, dtype=np.int32); R_idx_np[:nnodes][valid] = patterns[valid]
R_nnz_np = np.zeros(NCAP, dtype=np.int32); R_nnz_np[:nnodes] = nnz
ext_p, ext_slot = np.nonzero(valid); ext_c = patterns[valid].astype(np.int32)
K = len(ext_p)
MB = B.node_bucket(nnodes, NCAP)
KEXT = max(B._ext_bucket(K), 8 * MB)
pad = KEXT - K
ext_p = np.pad(ext_p.astype(np.int32), (0, pad)); ext_slot = np.pad(ext_slot.astype(np.int32), (0, pad)); ext_c = np.pad(ext_c, (0, pad))
pos_full = np.arange(NCAP, dtype=np.int32); pos_full[:nnodes] = pos
order_full = np.arange(NCAP, dtype=np.int32); order_full[:nnodes] = order
symb_np = B.pack_symb(NCAP, BCAP, KEXT, R_idx_np, R_nnz_np, pos_full, order_full, ext_p, ext_slot, ext_c, K, 2)
t0 = time.perf_counter()
for _ in range(5):
    symb = jnp.asarray(symb_np)
jax.block_until_ready(symb)
print(f"symb upload ({symb_np.nbytes//1024} KB): {(time.perf_counter()-t0)/5*1e3:.1f} ms", flush=True)
tik = jnp.asarray(cfg.tikhonov, dtype=cfg.jnp_dtype)
solver.ds, c2, spd = B._batch_step(solver.ds, symb, tik, MB=MB, KEXT=KEXT, gn_iters=cfg.effective_gn_iters)
jax.block_until_ready(solver.ds.state)
t0 = time.perf_counter()
N = 10
for _ in range(N):
    solver.ds, c2, spd = B._batch_step(solver.ds, symb, tik, MB=MB, KEXT=KEXT, gn_iters=cfg.effective_gn_iters)
jax.block_until_ready(solver.ds.state)
print(f"_batch_step[MB={MB},KEXT={KEXT}] chained: {(time.perf_counter()-t0)/N*1e3:.1f} ms", flush=True)
