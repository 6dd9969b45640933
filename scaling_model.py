"""Communication-volume model of the distributed Schur pipeline.

Traces the schur_solve GN step ABSTRACTLY (jax.eval_shape-level; no
execution, so 100k-pose shapes cost nothing) for a given pose count and
mesh size, walks the jaxpr for collectives, and reports per-GN-iteration
communication bytes by primitive.  Combined with measured single-chip
stage times (profile_r5_schur_stages.py) this yields the projected
multi-host scaling-efficiency model in SCALING.md.

Usage: JAX_PLATFORMS=cpu python scaling_model.py [--poses 100000]
"""

from __future__ import annotations

import argparse
import json
from collections import defaultdict

import numpy as np

COLLECTIVES = {
    "psum": "all-reduce",
    "psum_invariant": "all-reduce",
    "psum2": "all-reduce",
    "all_gather": "all-gather",
    "all_gather_invariant": "all-gather",
    "reduce_scatter": "reduce-scatter",
    "psum_scatter": "reduce-scatter",
    "ppermute": "ppermute",
    "all_to_all": "all-to-all",
}


def _subjaxprs(p):
    if hasattr(p, "eqns"):
        yield p
    elif hasattr(p, "jaxpr"):
        yield p.jaxpr
    elif isinstance(p, (list, tuple)):
        for s in p:
            yield from _subjaxprs(s)


def _walk(jaxpr, hits, mult=1):
    for eqn in jaxpr.eqns:
        name = eqn.primitive.name
        if name in COLLECTIVES:
            nbytes = sum(int(np.prod(v.aval.shape)) * v.aval.dtype.itemsize
                         for v in eqn.invars if hasattr(v, "aval"))
            kind = COLLECTIVES[name]
            hits[kind][0] += mult
            hits[kind][1] += mult * nbytes
        # loop bodies execute `length` times (fori_loop lowers to scan when
        # the trip count is static); while_loops are flagged unbounded
        m = mult
        if name == "scan":
            m = mult * int(eqn.params.get("length", 1))
        elif name == "while":
            hits["(while-loop: counts are per-iteration)"][0] += 1
        for sub in eqn.params.values():
            for j in _subjaxprs(sub):
                _walk(j, hits, m)


def comm_volume(poses: int, ndev: int, sep_dist: bool, sep_block: int = 128,
                closure_prob: float = 0.02):
    import jax
    from aprilsam_tpu.datasets import manhattan_world
    from aprilsam_tpu.parallel.dist import make_mesh
    from aprilsam_tpu.parallel import schur as SC

    # the partition shapes what gets traced; generate a real graph so the
    # separator size is the true one for this workload
    g = manhattan_world(poses, seed=0, closure_prob=closure_prob, block=25,
                        max_closures_per_pose=1)
    part = SC.partition_graph(g, ndev)
    mesh = make_mesh(ndev)

    # trace one gn_step through schur_solve's internals by capturing the
    # jaxpr of the shard_mapped function
    traced = {}

    orig = jax.make_jaxpr

    import functools

    # schur_solve jits gn_step internally; intercept via tracing the whole
    # solve with abstract inputs is intrusive — instead reconstruct the
    # shard_map function exactly as schur_solve does by calling it with
    # trace-only mode: we monkeypatch jax.jit to capture the jaxpr of the
    # first jitted call.
    captured = []
    real_jit = jax.jit

    def capture_jit(fn=None, **kw):
        wrapped = real_jit(fn, **kw) if fn is not None else real_jit(**kw)

        def runner(*a, **k):
            captured.append(jax.make_jaxpr(fn)(*a, **k))
            raise _Stop()
        return runner if fn is not None else wrapped

    class _Stop(Exception):
        pass

    jax.jit = capture_jit
    try:
        SC.schur_solve(mesh, g, part, gn_iters=1, dtype=np.float32,
                       sep_dist=sep_dist, sep_block=sep_block)
    except _Stop:
        pass
    finally:
        jax.jit = real_jit
    assert captured, "no jaxpr captured"
    hits = defaultdict(lambda: [0, 0])
    _walk(captured[0].jaxpr, hits)
    return part, hits


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--poses", type=int, default=100000)
    ap.add_argument("--closure_prob", type=float, default=0.02)
    args = ap.parse_args()

    rows = []
    for ndev in (2, 4, 8):
        for sep_dist in (False, True):
            part, hits = comm_volume(args.poses, ndev, sep_dist,
                                     closure_prob=args.closure_prob)
            total = sum(b for _c, b in hits.values())
            rows.append({
                "poses": args.poses, "ndev": ndev,
                "sep": "pchol" if sep_dist else "replicated",
                "ns": part.ns, "ni_max": part.ni_max,
                "collectives": {k: {"count": c, "MB": round(b / 1e6, 2)}
                                for k, (c, b) in sorted(hits.items())},
                "total_MB_per_gn": round(total / 1e6, 2),
            })
            print(json.dumps(rows[-1]), flush=True)
    return rows


if __name__ == "__main__":
    main()
