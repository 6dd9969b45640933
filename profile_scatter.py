"""A/B: scalar-index scatter-add vs [3,3]-window scatter-add for the
normal-equation assembly, same shapes, one process (controls for relay
contention between runs)."""

from __future__ import annotations

import time

import numpy as np


def bench(fn, *args, reps=10):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    import jax
    import jax.numpy as jnp

    from aprilsam_tpu.utils import enable_compilation_cache, setup_precision

    enable_compilation_cache()
    setup_precision()
    print(f"platform: {jax.devices()[0].platform}", flush=True)
    dtype = jnp.float32

    MB = 4096
    n3 = 3 * MB
    F = 8192
    rng = np.random.default_rng(0)
    pr = jnp.asarray(rng.integers(0, MB, size=F).astype(np.int32))
    pc = jnp.asarray(rng.integers(0, MB, size=F).astype(np.int32))
    H = jnp.asarray(rng.normal(size=(F, 3, 3)), dtype=dtype)

    # NB: each form ends in a .sum() — through the relay, block_until_ready
    # on a large untouched output can return before the compute lands (the
    # isolated run measured an impossible 0.03 ms for a 576 MB write); the
    # scalar reduction forces the full dataflow before the block returns.
    def scalar_form(pr, pc, H):
        dense = jnp.zeros((n3, n3), dtype=dtype)
        r = 3 * pr[:, None, None] + jnp.arange(3)[None, :, None]
        c = 3 * pc[:, None, None] + jnp.arange(3)[None, None, :]
        r = jnp.broadcast_to(r, H.shape)
        c = jnp.broadcast_to(c, H.shape)
        # 4 scatters like the real assembly
        for _ in range(4):
            dense = dense.at[r, c].add(H, mode="drop")
        return dense.sum()

    def window_form(pr, pc, H):
        dense = jnp.zeros((n3, n3), dtype=dtype)
        idx = jnp.stack([3 * pr, 3 * pc], axis=1)
        dn = jax.lax.ScatterDimensionNumbers(
            update_window_dims=(1, 2), inserted_window_dims=(),
            scatter_dims_to_operand_dims=(0, 1))
        for _ in range(4):
            dense = jax.lax.scatter_add(
                dense, idx, H, dn, indices_are_sorted=False,
                unique_indices=False,
                mode=jax.lax.GatherScatterMode.FILL_OR_DROP)
        return dense.sum()

    fs = jax.jit(scalar_form)
    fw = jax.jit(window_form)
    print(f"scalar 4x scatter-add[F={F}]: {bench(fs, pr, pc, H):8.2f} ms",
          flush=True)
    print(f"window 4x scatter-add[F={F}]: {bench(fw, pr, pc, H):8.2f} ms",
          flush=True)
    d = abs(float(fs(pr, pc, H)) - float(fw(pr, pc, H)))
    print(f"|sum diff| = {d:.2e}", flush=True)


if __name__ == "__main__":
    main()
