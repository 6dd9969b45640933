"""Step-mix census of the M3500 replay: per step, which path (fast/full),
naffected, MAXAFF bucket, MAXFR and NPANB — the data that decides where
full-path optimization effort pays.  Runs on CPU; relaunches itself with the
axon sitecustomize neutralized so it can run concurrently with TPU jobs.
"""

from __future__ import annotations

import collections
import json
import os
import sys


def relaunch_cpu():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PALLAS_AXON_POOL_IPS", None)
    parts = [p for p in env.get("PYTHONPATH", "").split(os.pathsep)
             if p and ".axon_site" not in p]
    env["PYTHONPATH"] = os.pathsep.join(parts)
    env["_PROFILE_MIX_CHILD"] = "1"
    os.execve(sys.executable, [sys.executable, os.path.abspath(__file__)], env)


def main():
    import numpy as np
    from aprilsam_tpu.io import load_g2o_text
    from aprilsam_tpu.replay import Replay
    from aprilsam_tpu.solver import SolverConfig

    loaded = load_g2o_text("/root/reference/data/M3500.txt")
    cfg = SolverConfig(dtype=np.float64, node_capacity=4096,
                       factor_capacity=8192, row_block_capacity=96,
                       panel_nodes=128, wallclock_gate=False,
                       policy_lag=0, bundle_size=1, log_chi2=False)
    rep = Replay(loaded, cfg, batch_update_only=False, deferred=False)
    s = rep.solver

    paths = []
    n = 0
    while True:
        res = rep.step()
        if res is None:
            break
        n += 1
        paths.append((s.last_path, s.last_naffected, s._npanb(rep.graph.nnodes)))
        if n % 500 == 0:
            print(f"... {n}", flush=True)

    c = collections.Counter(p for p, _, _ in paths)
    print("path counts:", dict(c))
    # bucketed naffected histogram for full steps
    from aprilsam_tpu.solver.incremental import _bucket
    hb = collections.Counter()
    for p, na, npanb in paths:
        if p == "full":
            hb[(_bucket(na + 2, cfg.frontal_buckets), npanb)] += 1
    print("full-path (MAXAFF-ish bucket, NPANB) histogram:")
    for k in sorted(hb, key=lambda k: (k[0] or 10**9, k[1])):
        print("   ", k, hb[k])
    na_full = sorted(na for p, na, _ in paths if p == "full")
    if na_full:
        qs = [na_full[int(q * (len(na_full) - 1))] for q in (0.5, 0.9, 0.99)]
        print(f"full-path naffected p50/p90/p99: {qs}, max {na_full[-1]}")
    batches = sum(1 for p, _, _ in paths if p == "batch")
    print(json.dumps({"steps": n, "fast": c.get("fast", 0),
                      "full": c.get("full", 0), "batch": batches}))


if __name__ == "__main__":
    if os.environ.get("_PROFILE_MIX_CHILD") != "1":
        relaunch_cpu()
    main()
