"""Mixed-bundle device-cost split on TPU.

Times inc_bundle_mixed with 32 dead slots per branch on a realistic
post-batch M3500 device state:
  * all slots fast@16 (m=0)  -> bundle fixed cost (h2d + scan + switch)
  * all slots full@{16,64,256} (m=0) -> + the per-slot NPANB panel sweep
The difference isolates the full-path sweep cost the replay pays ~1200x.
Also times the h2d of one packed bundle alone.
"""

from __future__ import annotations

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from aprilsam_tpu.utils import enable_compilation_cache, setup_precision

    enable_compilation_cache()
    setup_precision()
    print(f"platform: {jax.devices()[0].platform}", flush=True)

    from aprilsam_tpu.io import load_g2o_text
    from aprilsam_tpu.graph import FactorGraph
    from aprilsam_tpu.solver import SolverConfig
    from aprilsam_tpu.solver.incremental import (
        IncrementalSolver, MIXED_FR, MIXED_BUCKETS, MIXED_FLAT_BUCKETS,
        mixed_branch_len, packed_layout, inc_bundle_mixed)

    cfg = SolverConfig(
        dtype=np.float32, node_capacity=4096, factor_capacity=8192,
        row_block_capacity=96, panel_nodes=128, wallclock_gate=False,
        policy_lag=16, bundle_size=32, policy_poll=64, log_chi2=False,
        batch_backend="device")
    loaded = load_g2o_text("/root/reference/data/M3500.txt")

    # full graph -> one batch epoch -> realistic R at 3500 nodes
    g = FactorGraph()
    for i in range(loaded.nnodes):
        g.add_node(loaded.init[i])
    g.add_factor_xytpos(0, np.zeros(3), np.diag([1e4, 1e4, 1e3]))
    for f in range(loaded.nfactors):
        a, b = (int(v) for v in loaded.fnodes[f])
        g.add_factor_xyt(a, b, loaded.fz[f], loaded.fW[f])
    solver = IncrementalSolver(cfg)
    solver.solve(g)
    jax.block_until_ready(solver.ds.state)
    print("state built (1 batch epoch, 3500 nodes)", flush=True)

    K = cfg.new_factor_capacity
    BCAP = cfg.row_block_capacity
    RCAP = cfg.effective_ridx_pack
    half = solver._half_ridx
    B = 32
    npanb = 32

    def dead_flat(sel: int):
        """Ragged flat buffer: B identical dead slots of the branch."""
        M = 16 if sel == 0 else MIXED_BUCKETS[sel - 1]
        seg, L = packed_layout(M, MIXED_FR, K, BCAP, np.float32, RCAP, half)
        row = np.zeros(1 + L, dtype=np.int32)
        row[0] = sel
        sent = cfg.node_capacity
        if half:
            sent = np.array([sent, sent], dtype=np.int16).view(np.int32)[0]
        row[1 + seg["ridx"][0]: 1 + seg["ridx"][1]] = sent
        # distinct payload copies up to what the largest bucket holds; all
        # B slots still execute (extra offs reuse payload 0)
        ncopy = min(B, MIXED_FLAT_BUCKETS[-1] // (1 + L))
        FLATCAP = next(b for b in MIXED_FLAT_BUCKETS
                       if b >= ncopy * (1 + L))
        flat = np.zeros(FLATCAP, dtype=np.int32)
        offs = np.zeros(B, dtype=np.int32)
        for i in range(B):
            offs[i] = (i % ncopy) * (1 + L)
        for i in range(ncopy):
            flat[i * (1 + L): (i + 1) * (1 + L)] = row
        return flat, offs

    # h2d cost of one bundle alone
    flat, offs = dead_flat(0)
    o = jnp.asarray(flat)
    jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(20):
        o = jnp.asarray(flat)
        jax.block_until_ready(o)
    print(f"h2d bundle [{flat.nbytes/1e6:.2f} MB] blocking: "
          f"{(time.perf_counter()-t0)/20*1e3:7.2f} ms", flush=True)

    for sel, name in ((0, "fast@16"), (1, "full@16"), (2, "full@64"),
                      (3, "full@256"), (4, "full@1024")):
        flat, offs = dead_flat(sel)
        ds = solver.ds

        def run(ds):
            return inc_bundle_mixed(
                ds, jnp.asarray(flat), jnp.asarray(offs),
                KNEW=K, PANEL=cfg.panel_nodes, NPANB=npanb,
                RCAP=RCAP, delta_xy=0.1, delta_theta=0.1, log_chi2=False,
                coalesce=cfg.coalesce_full_solves)

        ds, _ = run(ds)   # compile/warm
        jax.block_until_ready(ds.state)
        t0 = time.perf_counter()
        reps = 10
        for _ in range(reps):
            ds, _ = run(ds)
        jax.block_until_ready(ds.state)
        ms = (time.perf_counter() - t0) / reps * 1e3
        print(f"bundle 32x {name:9s} npanb={npanb}: {ms:8.2f} ms "
              f"({ms/B*1e3:7.1f} us/slot)", flush=True)
        solver.ds = ds


if __name__ == "__main__":
    main()
