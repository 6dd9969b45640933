"""Characterize the d2h-readback dispatch-overhead poison: decay profile,
per-readback cost, and whether anything resets it."""

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

    @jax.jit
    def nop(x):
        return x + 1.0

    x = jnp.zeros(8)
    for _ in range(3):
        x = nop(x)
    jax.block_until_ready(x)

    def group(tag, n=50):
        nonlocal x
        t0 = time.perf_counter()
        for _ in range(n):
            x = nop(x)
        jax.block_until_ready(x)
        ms = (time.perf_counter() - t0) / n * 1e3
        print(f"  {tag:28s}: {ms:8.3f} ms/dispatch", flush=True)
        return ms

    print("baseline:")
    group("fresh 50")
    group("fresh 50 again")

    # single readback
    t0 = time.perf_counter()
    _ = np.asarray(x)
    print(f"one d2h (8 floats): {(time.perf_counter()-t0)*1e3:.3f} ms",
          flush=True)
    for i in range(6):
        group(f"post-1-readback group {i}")

    # 10 readbacks
    t0 = time.perf_counter()
    for _ in range(10):
        _ = np.asarray(x)
    print(f"10 d2h: {(time.perf_counter()-t0)*1e3:.3f} ms total", flush=True)
    for i in range(6):
        group(f"post-10-readback group {i}")

    # does a big h2d reset it?
    big = jax.device_put(np.zeros((1024, 1024), dtype=np.float32))
    jax.block_until_ready(big)
    group("after big h2d")

    # does jax.device_get differ from np.asarray?
    _ = jax.device_get(x)
    group("after device_get")

    # readback of a LARGE array
    t0 = time.perf_counter()
    _ = np.asarray(big)
    print(f"one d2h (4 MB): {(time.perf_counter()-t0)*1e3:.3f} ms", flush=True)
    for i in range(3):
        group(f"post-big-readback group {i}")

    # long drain
    for i in range(10):
        group(f"drain {i}", n=200)


if __name__ == "__main__":
    main()
