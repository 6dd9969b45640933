"""Device batch-epoch microbench: where does an epoch's device time go?

Times _batch_step end-to-end at the MB ladder, then its pieces in
isolation (assembly, dense cholesky + solves, R-block extraction) at the
same shapes, on whatever device is available.  Run on TPU to size the
epoch budget of the M3500 replay (~28 epochs on the critical path).
"""

from __future__ import annotations

import time

import numpy as np


def bench(fn, *args, reps=10, **kw):
    import jax

    out = fn(*args, **kw)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    import jax
    import jax.numpy as jnp

    from aprilsam_tpu.utils import enable_compilation_cache, setup_precision

    enable_compilation_cache()
    setup_precision()
    platform = jax.devices()[0].platform
    print(f"platform: {platform}", flush=True)
    dtype = jnp.float32

    # ---- piece 1: dense cholesky + triangular solves at the ladder
    for MB in (1024, 2048, 4096):
        n = 3 * MB
        a = jnp.eye(n, dtype=dtype) * 4.0 + 0.01
        f = jax.jit(lambda A: jnp.linalg.cholesky(A))
        print(f"chol[{n}]: {bench(f, a):8.2f} ms", flush=True)
        L = f(a)
        b = jnp.ones(n, dtype=dtype)
        g = jax.jit(lambda L, b: jax.scipy.linalg.solve_triangular(
            L, b, lower=True))
        print(f"trisolve[{n}]: {bench(g, L, b):8.2f} ms", flush=True)

    # ---- piece 2: assembly at M3500-like sizes
    from aprilsam_tpu.kernels.assembly import assemble_block_dense

    MB = 4096
    N = 3500
    F = 5460
    rng = np.random.default_rng(0)
    l_point = jnp.asarray(rng.normal(size=(MB, 3)), dtype=dtype)
    pos = jnp.asarray(np.arange(MB, dtype=np.int32))
    a_idx = jnp.asarray(rng.integers(0, N, size=8192).astype(np.int32))
    b_idx = jnp.asarray(rng.integers(0, N, size=8192).astype(np.int32))
    z = jnp.asarray(rng.normal(size=(8192, 3)), dtype=dtype)
    W = jnp.tile(jnp.eye(3, dtype=dtype), (8192, 1, 1))
    valid = jnp.asarray(np.arange(8192) < F)
    pn = jnp.asarray(rng.integers(0, N, size=1024).astype(np.int32))
    pz = jnp.asarray(rng.normal(size=(1024, 3)), dtype=dtype)
    pW = jnp.tile(jnp.eye(3, dtype=dtype), (1024, 1, 1))
    pv = jnp.asarray(np.arange(1024) < 1)

    asm = jax.jit(lambda: assemble_block_dense(
        l_point, l_point, pos, a_idx, b_idx, z, W, valid,
        pn, pz, pW, pv, MB=MB, tikhonov=1e-4, dtype=dtype))
    print(f"assembly[MB={MB}]: {bench(asm):8.2f} ms", flush=True)

    # ---- piece 3: R-block extraction gather at KEXT=32768
    KEXT = 32768
    L = jnp.asarray(rng.normal(size=(3 * MB, 3 * MB)), dtype=dtype)
    cp = jnp.asarray(rng.integers(0, MB, size=KEXT).astype(np.int32))
    pp = jnp.asarray(rng.integers(0, MB, size=KEXT).astype(np.int32))

    def extract(L, cp, pp):
        ri = 3 * cp[:, None, None] + jnp.arange(3)[None, :, None]
        ci = 3 * pp[:, None, None] + jnp.arange(3)[None, None, :]
        return L[ri, ci].transpose(0, 2, 1)

    ex = jax.jit(extract)
    print(f"extract[KEXT={KEXT}]: {bench(ex, L, cp, pp):8.2f} ms", flush=True)

    # ---- piece 4: R_blocks scatter at [NCAP=4096, BCAP=96]
    NCAP, BCAP = 4096, 96
    blocks = jnp.asarray(rng.normal(size=(KEXT, 3, 3)), dtype=dtype)
    dp = jnp.asarray(rng.integers(0, NCAP, size=KEXT).astype(np.int32))
    sl = jnp.asarray(rng.integers(0, BCAP, size=KEXT).astype(np.int32))

    def scat(blocks, dp, sl):
        return jnp.zeros((NCAP, BCAP, 3, 3), dtype=dtype).at[dp, sl].set(
            blocks, mode="drop")

    sc = jax.jit(scat)
    print(f"scatter[KEXT={KEXT}]: {bench(sc, blocks, dp, sl):8.2f} ms",
          flush=True)

    # ---- end-to-end _batch_step at the ladder (dead symbolic inputs)
    from aprilsam_tpu.solver.batch import _batch_step, pack_symb
    from aprilsam_tpu.solver.config import SolverConfig
    from aprilsam_tpu.solver.state import init_device_state

    cfg = SolverConfig(dtype=np.float32, node_capacity=4096,
                       factor_capacity=8192, row_block_capacity=96)
    ds = init_device_state(cfg)
    for MB in (1024, 2048, 4096):
        KE = 8 * MB
        symb = pack_symb(
            NCAP, BCAP, KE,
            np.full((NCAP, BCAP), NCAP, dtype=np.int32),
            np.zeros(NCAP, dtype=np.int32),
            np.arange(NCAP, dtype=np.int32),
            np.arange(NCAP, dtype=np.int32),
            np.zeros(KE, dtype=np.int32),
            np.zeros(KE, dtype=np.int32),
            np.zeros(KE, dtype=np.int32),
            0, 2)

        def step(ds):
            return _batch_step(
                ds,
                jnp.asarray(symb),
                jnp.asarray(1e-4, dtype=dtype),
                MB=MB, KEXT=KE, gn_iters=1,
            )

        # donated ds: rebuild each rep
        t = []
        for _ in range(5):
            ds = init_device_state(cfg)
            jax.block_until_ready(ds.state)
            t0 = time.perf_counter()
            ds, chi2, spd = step(ds)
            jax.block_until_ready(ds.state)
            t.append(time.perf_counter() - t0)
        print(f"_batch_step[MB={MB}]: {min(t) * 1e3:8.2f} ms (min of 5)",
              flush=True)


if __name__ == "__main__":
    main()
