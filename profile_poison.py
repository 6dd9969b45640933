"""Bisect which part of the replay degrades per-dispatch overhead, and
whether it recovers with idling/draining."""

from __future__ import annotations

import gc
import time

import numpy as np


def t_nop(tag, n=50):
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
    for _ in range(n):
        x = nop(x)
    jax.block_until_ready(x)
    ms = (time.perf_counter() - t0) / n * 1e3
    print(f"nop after {tag:42s}: {ms:8.3f} ms", flush=True)
    return ms


def main():
    import jax
    import jax.numpy as jnp

    from aprilsam_tpu.utils import enable_compilation_cache, setup_precision

    enable_compilation_cache()
    setup_precision()
    print(f"platform: {jax.devices()[0].platform}", flush=True)

    t_nop("fresh")

    # --- piece 1: many small uploads (plan uploads)
    for _ in range(400):
        a = jnp.asarray(np.zeros(300, dtype=np.int32))
    jax.block_until_ready(a)
    t_nop("400 small uploads")

    # --- piece 2: many buffer creates+frees (temporaries)
    @jax.jit
    def mk(x):
        return x * 2.0

    for _ in range(2000):
        b = mk(jnp.zeros(64))
    jax.block_until_ready(b)
    t_nop("2000 create/free cycles")

    # --- piece 3: donation churn on a big pytree
    big = tuple(jnp.zeros((4096, 96, 9), dtype=jnp.float32) for _ in range(4))

    @jax.jit
    def don(t):
        return tuple(x + 1.0 for x in t)

    don2 = jax.jit(lambda t: tuple(x + 1.0 for x in t), donate_argnums=0)
    for _ in range(300):
        big = don2(big)
    jax.block_until_ready(big[0])
    t_nop("300 donated big-pytree steps")

    del big
    gc.collect()
    t_nop("del donated pytree")

    # --- piece 4: d2h readbacks (policy stats)
    s = jnp.zeros(3)
    for _ in range(200):
        _ = np.asarray(s + 1.0)
    t_nop("200 small d2h readbacks")

    # --- recovery: idle + drain
    time.sleep(3)
    t_nop("3 s idle")
    for _ in range(500):
        pass
    t_nop("another 50 nops", n=500)


if __name__ == "__main__":
    main()
