"""Distributed keyframe-block solve on a device mesh.

Generates a synthetic Manhattan-world graph, partitions the trajectory into
contiguous keyframe blocks, and runs the Schur-complement Gauss-Newton solve
over all available devices (real chips, or the virtual CPU mesh when
XLA_FLAGS=--xla_force_host_platform_device_count=N is set).

Run:  python examples/distributed_solve.py [--poses 2000] [--blocks 16]
"""

import argparse
import copy

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--poses", type=int, default=2000)
    ap.add_argument("--blocks", type=int, default=16)
    args = ap.parse_args()

    import jax

    from aprilsam_tpu.datasets import manhattan_world
    from aprilsam_tpu.parallel.dist import make_mesh
    from aprilsam_tpu.parallel.schur import partition_graph, schur_solve
    from aprilsam_tpu.utils import setup_precision

    setup_precision()
    ndev = len(jax.devices())
    blocks = args.blocks - args.blocks % ndev or ndev
    print(f"devices: {ndev}, blocks: {blocks}")

    g = manhattan_world(args.poses, seed=0, closure_prob=0.2)
    print(f"graph: {g.nnodes} poses, {g.nfactors} factors, "
          f"chi2 {g.chi2():.1f}")

    part = partition_graph(g, blocks)
    print(f"partition: interior<= {part.ni_max}, separator {part.ns}, "
          f"local-separator<= {part.nsl}")

    mesh = make_mesh(ndev)
    dtype = np.float64 if jax.devices()[0].platform == "cpu" else np.float32
    states = schur_solve(mesh, g, part, gn_iters=3, dtype=dtype)

    g2 = copy.deepcopy(g)
    g2.state[: g.nnodes] = states
    print(f"after 3 distributed GN iterations: chi2 {g2.chi2():.1f}")


if __name__ == "__main__":
    main()
