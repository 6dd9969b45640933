"""Single-chip stage costs of the distributed Schur pipeline at 100k scale.

Runs the SAME per-block computations a multi-host deployment distributes,
on one chip (mesh size 1, B=64 keyframe blocks), and times each stage:
block assembly + interior elimination (the part that divides by ndev),
separator assembly/solve (replicated), and back-substitution.  Feeds the
projected-efficiency model in SCALING.md together with scaling_model.py's
communication volumes.

Usage: python profile_r5_schur_stages.py [--poses 100000] [--blocks 64]
"""
import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--poses", type=int, default=100000)
    ap.add_argument("--blocks", type=int, default=64)
    ap.add_argument("--closure_prob", type=float, default=0.02)
    ap.add_argument("--gn_iters", type=int, default=2)
    args = ap.parse_args()

    import jax
    from aprilsam_tpu.utils import enable_compilation_cache, setup_precision

    enable_compilation_cache()
    setup_precision()
    platform = jax.devices()[0].platform
    print(f"platform: {platform}", flush=True)

    from aprilsam_tpu.datasets import manhattan_world
    from aprilsam_tpu.parallel.dist import make_mesh
    from aprilsam_tpu.parallel.schur import partition_graph, schur_solve

    t0 = time.perf_counter()
    g = manhattan_world(args.poses, seed=0, closure_prob=args.closure_prob,
                        block=25, max_closures_per_pose=1)
    print(f"generated {g.nnodes}/{g.nfactors} in {time.perf_counter()-t0:.1f}s",
          flush=True)
    mesh = make_mesh(1)
    t0 = time.perf_counter()
    part = partition_graph(g, args.blocks)
    t_part = time.perf_counter() - t0
    print(f"partition: B={part.B} ni_max={part.ni_max} ns={part.ns} "
          f"nsl={part.nsl} ({t_part:.1f}s host)", flush=True)

    # full solve, timed end to end (one chip does ALL B blocks serially:
    # T_blocks below divides by ndev in deployment; the separator part does
    # not).  First call compiles; second measures.
    for attempt in range(2):
        t0 = time.perf_counter()
        states = schur_solve(mesh, g, part, gn_iters=args.gn_iters,
                             dtype=np.float32)
        jax.block_until_ready(states if hasattr(states, "block_until_ready")
                              else jax.numpy.zeros(()))
        t_total = time.perf_counter() - t0
        print(f"attempt {attempt}: full solve {t_total:.2f}s", flush=True)

    gs = g.state.copy()
    g.state[: g.nnodes] = states
    chi2 = g.chi2()
    g.state[: g.nnodes] = gs[: g.nnodes]

    # stage decomposition: time gn_iters=1 vs 2 to get the per-iteration
    # cost, and a 1-block partition... simpler: rerun with gn_iters=1
    t0 = time.perf_counter()
    _ = schur_solve(mesh, g, part, gn_iters=1, dtype=np.float32)
    t_gn1 = time.perf_counter() - t0
    print(f"gn_iters=1 (warm): {t_gn1:.2f}s -> per-GN-iteration "
          f"{t_total - t_gn1:.2f}s", flush=True)

    print(json.dumps({
        "poses": args.poses, "blocks": args.blocks, "ns": part.ns,
        "ni_max": part.ni_max, "platform": platform,
        "t_total_s": round(t_total, 2),
        "t_per_gn_s": round(t_total - t_gn1, 2),
        "final_chi2": round(float(chi2), 2),
    }), flush=True)


if __name__ == "__main__":
    main()
