"""Executable-alternation cost on the TPU relay: same-executable chains vs
alternating fast/full dispatches, with and without per-call h2d plan packs,
post d2h-flip (the real replay's regime).  Explains the gap between
profile_body chains (0.8 ms/bundle-step) and the real replay (13-25 ms/step).
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

    from aprilsam_tpu.solver import SolverConfig
    from aprilsam_tpu.solver import incremental as I
    from aprilsam_tpu.solver.state import init_device_state

    cfg = SolverConfig(dtype=np.float32, node_capacity=4096,
                       factor_capacity=8192, row_block_capacity=96,
                       panel_nodes=128, wallclock_gate=False,
                       policy_lag=8, bundle_size=8)
    K = cfg.new_factor_capacity
    BCAP = cfg.row_block_capacity
    NCAP = cfg.node_capacity

    def dead_packed(MAXAFF, MAXFR):
        seg, L = I.packed_layout(MAXAFF, MAXFR, K, BCAP, np.float32)
        dead = np.zeros(L, dtype=np.int32)
        dead[seg["ridx"][0]:seg["ridx"][1]] = NCAP
        return dead

    s = I.IncrementalSolver(cfg)
    ds = s.ds

    pk_f_np = dead_packed(16, 32)
    pkb_fast_np = np.stack([pk_f_np] * 8)
    pkb_fast = jnp.asarray(pkb_fast_np)
    pkb_full = jnp.asarray(np.stack([pk_f_np] * cfg.bundle_size_full))

    kw = dict(MAXAFF=16, MAXFR=32, KNEW=K, delta_xy=0.1, delta_theta=0.1,
              log_chi2=False)
    kwf = dict(kw, PANEL=128, NPANB=4)

    # compile both
    ds, st1 = I.inc_bundle_fast(ds, pkb_fast, **kw)
    ds, st2 = I.inc_bundle_full(ds, pkb_full, **kwf)
    jax.block_until_ready(ds.state)

    # flip the relay out of pipelined mode (real replays always have)
    _ = np.asarray(ds.state[0])

    def timeit(tag, fn, n=20):
        nonlocal ds
        for _ in range(3):
            fn()
        jax.block_until_ready(ds.state)
        t0 = time.perf_counter()
        for _ in range(n):
            fn()
        jax.block_until_ready(ds.state)
        ms = (time.perf_counter() - t0) / n * 1e3
        print(f"  {tag:44s}: {ms:8.2f} ms/call", flush=True)

    def fast_resident():
        nonlocal ds
        ds, _ = I.inc_bundle_fast(ds, pkb_fast, **kw)

    def full_resident():
        nonlocal ds
        ds, _ = I.inc_bundle_full(ds, pkb_full, **kwf)

    def fast_h2d():
        nonlocal ds
        pk = jnp.asarray(np.stack([pk_f_np] * 8))
        ds, _ = I.inc_bundle_fast(ds, pk, **kw)

    def alternate_resident():
        nonlocal ds
        ds, _ = I.inc_bundle_fast(ds, pkb_fast, **kw)
        ds, _ = I.inc_bundle_full(ds, pkb_full, **kwf)

    def alternate_h2d():
        nonlocal ds
        pk = jnp.asarray(np.stack([pk_f_np] * 8))
        ds, _ = I.inc_bundle_fast(ds, pk, **kw)
        pk2 = jnp.asarray(np.stack([pk_f_np] * cfg.bundle_size_full))
        ds, _ = I.inc_bundle_full(ds, pk2, **kwf)

    def fast_h2d_readback():
        nonlocal ds
        pk = jnp.asarray(np.stack([pk_f_np] * 8))
        ds, st = I.inc_bundle_fast(ds, pk, **kw)
        _ = np.asarray(st)

    timeit("fast bundle x8, resident plan, same exec", fast_resident)
    timeit("full bundle x4, resident plan, same exec", full_resident)
    timeit("fast bundle x8 + h2d pack", fast_h2d)
    timeit("alternate fast/full, resident (per pair)", alternate_resident)
    timeit("alternate fast/full + h2d (per pair)", alternate_h2d)
    timeit("fast bundle x8 + h2d + stats d2h", fast_h2d_readback)


if __name__ == "__main__":
    main()
