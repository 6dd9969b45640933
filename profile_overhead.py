"""Isolate the per-dispatch overhead degradation: nop dispatch time vs
(a) fresh process, (b) big live buffers, (c) many loaded executables,
(d) after a real replay."""

from __future__ import annotations

import gc
import time

import numpy as np


def t_nop(tag):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def nop(x):
        return x + 1.0

    x = jnp.zeros(8)
    for _ in range(3):
        x = nop(x)
    jax.block_until_ready(x)
    t0 = time.perf_counter()
    for _ in range(50):
        x = nop(x)
    jax.block_until_ready(x)
    ms = (time.perf_counter() - t0) / 50 * 1e3
    print(f"nop after {tag:36s}: {ms:8.3f} ms", flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from aprilsam_tpu.utils import enable_compilation_cache, setup_precision

    enable_compilation_cache()
    setup_precision()
    print(f"platform: {jax.devices()[0].platform}", flush=True)

    t_nop("fresh process")

    # (b) big live buffers
    bufs = [jnp.zeros((4096, 96, 3, 3), dtype=jnp.float32) for _ in range(4)]
    bufs += [jnp.zeros((8192, 3, 3), dtype=jnp.float32) for _ in range(8)]
    jax.block_until_ready(bufs[-1])
    t_nop("40 MB live buffers")

    many = [jnp.zeros((128,), dtype=jnp.float32) + i for i in range(400)]
    jax.block_until_ready(many[-1])
    t_nop("400 more live buffers")

    del many
    gc.collect()
    t_nop("del 400 buffers")

    # (c) many loaded executables
    fns = []
    for i in range(30):
        k = i + 2

        def f(x, k=k):
            return (x * k).sum()

        jf = jax.jit(f)
        jf(jnp.zeros((16, 16)))
        fns.append(jf)
    t_nop("30 distinct executables")

    del bufs
    gc.collect()
    t_nop("del big buffers")

    # (d) the real replay
    from aprilsam_tpu.io import load_g2o_text
    from aprilsam_tpu.replay import Replay
    from aprilsam_tpu.solver import SolverConfig

    cfg = SolverConfig(
        dtype=np.float32, node_capacity=4096, factor_capacity=8192,
        row_block_capacity=96, panel_nodes=128, wallclock_gate=False,
        policy_lag=8, bundle_size=8)
    loaded = load_g2o_text("/root/reference/data/M3500.txt")
    rep = Replay(loaded, cfg, batch_update_only=False, deferred=True)
    for _ in range(100):
        rep.step()
    rep.solver._dispatch_queue()
    jax.block_until_ready(rep.solver.ds.state)
    t_nop("replay 100 steps")

    for _ in range(300):
        rep.step()
    rep.solver._dispatch_queue()
    jax.block_until_ready(rep.solver.ds.state)
    t_nop("replay 400 steps")

    ds = rep.solver.ds
    del rep
    gc.collect()
    t_nop("del replay (ds kept)")

    del ds
    gc.collect()
    t_nop("del ds")


if __name__ == "__main__":
    main()
