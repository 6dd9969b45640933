"""Round-3 perf unknowns, measured on the real chip:

 1. frontal refactor cost per bucket: thin QR [3M+96, 3M] vs
    Gram+Cholesky (R'T R' = RT R + UT U) vs blocked structured update;
 2. dense triangular solve [3M] (the Gram path needs one for y');
 3. back-substitution sweep variants at PANEL = 128 / 256 / 512 with
    cached panel inverses (matvec) instead of trisolves;
 4. lax.switch-of-3-branches inside a scan bundle (the planned merged
    fast/full executable) vs plain scan;
 5. h2d upload cost of bundle payloads at the current (full-row ridx)
    and planned (delta-cols) sizes.
"""

from __future__ import annotations

import time

import numpy as np


def t_it(fn, *args, n=30, warmup=3, **kw):
    import jax

    for _ in range(warmup):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3  # ms


def main():
    import jax
    import jax.numpy as jnp
    from functools import partial

    from aprilsam_tpu.utils import enable_compilation_cache, setup_precision

    enable_compilation_cache()
    setup_precision()
    print(f"platform: {jax.devices()[0].platform}", flush=True)
    dtype = jnp.float32
    rng = np.random.default_rng(0)

    KROWS = 96  # 2 * KNEW * 3 measurement rows

    # ---------------- 1. frontal refactor per bucket ----------------
    for M in (16, 64, 256):
        m = 3 * M
        A = np.triu(rng.standard_normal((m, m))) + 3 * np.eye(m)
        U = rng.standard_normal((KROWS, m)) * 0.1
        C = jnp.asarray(np.vstack([A, U]), dtype)
        Rj = jnp.asarray(A, dtype)
        Uj = jnp.asarray(U, dtype)
        d = jnp.asarray(rng.standard_normal(m + KROWS), dtype)

        def via_qr(C, d):
            Q, Rq = jnp.linalg.qr(C, mode="reduced")
            return Rq, Q.T @ d

        def via_gram(R, U, d):
            G = R.T @ R + U.T @ U
            rhs = R.T @ d[:m] + U.T @ d[m:]
            Rn = jnp.linalg.cholesky(G).T
            yn = jax.scipy.linalg.solve_triangular(
                Rn.T, rhs, lower=True)
            return Rn, yn

        print(f"M={M:4d} qr[{m+KROWS},{m}]:      "
              f"{t_it(jax.jit(via_qr), C, d):8.3f} ms", flush=True)
        print(f"M={M:4d} gram+chol+trisolve:  "
              f"{t_it(jax.jit(via_gram), Rj, Uj, d):8.3f} ms", flush=True)

    # ---------------- 2. trisolve / cholesky alone ----------------
    for m in (192, 768):
        A = np.triu(rng.standard_normal((m, m))) + 3 * np.eye(m)
        Aj = jnp.asarray(A, dtype)
        b = jnp.asarray(rng.standard_normal(m), dtype)
        G = jnp.asarray(A.T @ A + m * np.eye(m), dtype)
        print(f"m={m:4d} trisolve 1rhs: "
              f"{t_it(jax.jit(partial(jax.scipy.linalg.solve_triangular, lower=False)), Aj, b):8.3f} ms   "
              f"chol[{m}]: {t_it(jax.jit(jnp.linalg.cholesky), G):8.3f} ms",
              flush=True)

    # ---------------- 3. Tinv sweep at several panel sizes ----------------
    NCAP, BCAP = 4096, 96
    R_blocks = jnp.asarray(rng.standard_normal((NCAP, BCAP, 3, 3)), dtype)
    idx_np = np.full((NCAP, BCAP), NCAP, dtype=np.int32)
    for p in range(NCAP):
        idx_np[p, 0] = p
        k = min(8, NCAP - p - 1)
        if k > 0:
            idx_np[p, 1:1 + k] = p + 1 + rng.choice(
                NCAP - p - 1, size=k, replace=False)
            idx_np[p, 1:1 + k] = np.sort(idx_np[p, 1:1 + k])
    R_idx = jnp.asarray(idx_np)
    y = jnp.asarray(rng.standard_normal((NCAP, 3)), dtype)

    for PANEL in (128, 256, 512):
        NPANB = 4096 // PANEL
        Tinv = jnp.asarray(
            np.tile(np.eye(3 * PANEL, dtype=np.float32),
                    (NPANB, 1, 1)) * 0.3)

        @jax.jit
        def sweep_tinv(R_blocks, R_idx, y, Tinv):
            xb = jnp.zeros((NCAP + 1, 3), dtype=dtype)

            def body(xb, j_rev):
                j = NPANB - 1 - j_rev
                p0 = j * PANEL
                rows = jax.lax.dynamic_slice_in_dim(R_blocks, p0, PANEL, 0)
                idx = jax.lax.dynamic_slice_in_dim(R_idx, p0, PANEL, 0)
                yp = jax.lax.dynamic_slice_in_dim(y, p0, PANEL, 0)
                beyond = idx >= (p0 + PANEL)
                xg = xb[jnp.clip(idx, 0, NCAP)]
                acc = jnp.einsum("pbij,pbj->pi", rows,
                                 jnp.where(beyond[..., None], xg, 0.0))
                rhs = (yp - acc).reshape(-1)
                Ti = jax.lax.dynamic_slice_in_dim(Tinv, j, 1, 0)[0]
                xp = Ti @ rhs
                return jax.lax.dynamic_update_slice_in_dim(
                    xb, xp.reshape(PANEL, 3), p0, 0), None

            xb, _ = jax.lax.scan(body, xb, jnp.arange(NPANB))
            return xb

        print(f"PANEL={PANEL:4d} NPANB={NPANB:3d} Tinv sweep: "
              f"{t_it(sweep_tinv, R_blocks, R_idx, y, Tinv):8.3f} ms",
              flush=True)

    # refresh cost: invert k panels of PANEL=128 via trisolve vs all
    PANEL = 128
    for k in (1, 2, 4, 8):
        Td = jnp.asarray(
            np.tile(np.triu(rng.standard_normal((3 * PANEL, 3 * PANEL)))
                    + 3 * np.eye(3 * PANEL), (k, 1, 1)), dtype)

        @jax.jit
        def inv_k(Td):
            eye = jnp.eye(3 * PANEL, dtype=dtype)
            return jax.vmap(lambda T: jax.scipy.linalg.solve_triangular(
                T, eye, lower=False))(Td)

        print(f"invert {k} panels[384]: {t_it(inv_k, Td):8.3f} ms",
              flush=True)

    # ---------------- 4. switch-in-scan overhead ----------------
    B = 32

    def mk(flagged):
        def body(c, xs):
            flag, v = xs

            def br0(c):
                return c + v * 1.0

            def br1(c):
                return c * 0.999 + v

            def br2(c):
                return c - v * 0.5

            if flagged:
                c = jax.lax.switch(flag, (br0, br1, br2), c)
            else:
                c = br0(c)
            return c, None

        @jax.jit
        def run(c0, flags, vs):
            c, _ = jax.lax.scan(body, c0, (flags, vs))
            return c

        return run

    c0 = jnp.zeros((256, 256), dtype)
    flags = jnp.asarray(rng.integers(0, 3, B), jnp.int32)
    vs = jnp.asarray(rng.standard_normal((B, 256, 256)), dtype)
    print(f"scan x{B} plain:  {t_it(mk(False), c0, flags, vs):8.3f} ms",
          flush=True)
    print(f"scan x{B} switch: {t_it(mk(True), c0, flags, vs):8.3f} ms",
          flush=True)

    # ---------------- 5. h2d payload cost ----------------
    for KB, label in ((3300, "bundle ridx-full (32x256x96 ints)"),
                      (260, "bundle delta-cols (32x~8KB)")):
        buf = np.zeros(KB * 256, dtype=np.int32)  # KB kilobytes

        def up(buf=buf):
            return jnp.asarray(buf).block_until_ready()

        t0 = time.perf_counter()
        for _ in range(10):
            up()
        print(f"h2d {label}: {(time.perf_counter() - t0) / 10 * 1e3:8.3f} ms",
              flush=True)


if __name__ == "__main__":
    main()
