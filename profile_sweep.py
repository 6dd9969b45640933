"""Panel-sweep dissection on TPU: times each component of the full-path
back-substitution body (gather, one-hot T extraction, trisolve) and
candidate replacements (one-hot matmul gather, cached dense panel triangle,
cached panel inverse) at the real late-trajectory shapes (NPANB=32).
"""

from __future__ import annotations

import time

import numpy as np


def t_it(fn, *args, n=20, warmup=3, **kw):
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

    NCAP, BCAP, PANEL = 4096, 96, 128
    NPANB = 32
    dtype = jnp.float32
    rng = np.random.default_rng(0)

    R_blocks = jnp.asarray(rng.standard_normal((NCAP, BCAP, 3, 3)), dtype=dtype)
    # diagonal-ish index structure: slot0 = self, rest random ascending
    idx_np = np.full((NCAP, BCAP), NCAP, dtype=np.int32)
    for p in range(NCAP):
        idx_np[p, 0] = p
        k = min(8, NCAP - p - 1)
        if k > 0:
            idx_np[p, 1 : 1 + k] = p + 1 + rng.choice(
                np.arange(1, min(256, NCAP - p)), size=k, replace=False)
            idx_np[p, 1 : 1 + k].sort()
    R_idx = jnp.asarray(idx_np)
    y = jnp.asarray(rng.standard_normal((NCAP, 3)), dtype=dtype)
    n = jnp.int32(3500)

    eye_p = jnp.eye(3 * PANEL, dtype=dtype)

    # ---------- full sweep as currently written
    @jax.jit
    def sweep_current(R_blocks, R_idx, y, n):
        xb = jnp.zeros((NCAP + 1, 3), dtype=dtype)

        def panel_body(xb, j_rev):
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
            prow = p0 + jnp.arange(PANEL, dtype=jnp.int32)
            active = jnp.repeat(prow < n, 3)
            inpan = (idx >= p0) & (idx < p0 + PANEL)
            oh = jax.nn.one_hot(jnp.where(inpan, idx - p0, 0), PANEL,
                                dtype=dtype) * inpan[..., None]
            T = jnp.einsum("pbij,pbc->pcij", rows, oh)
            Td = T.transpose(0, 2, 1, 3).reshape(3 * PANEL, 3 * PANEL)
            Td = Td + jnp.where(active, 0.0, 1.0) * eye_p
            xp = jax.scipy.linalg.solve_triangular(
                Td, jnp.where(active, rhs, 0.0), lower=False)
            xb = jax.lax.dynamic_update_slice_in_dim(
                xb, xp.reshape(PANEL, 3), p0, 0)
            return xb, None

        xb, _ = jax.lax.scan(panel_body, xb, jnp.arange(NPANB))
        return xb

    print(f"sweep current (32 panels):    {t_it(sweep_current, R_blocks, R_idx, y, n):8.3f} ms")

    # ---------- component: gather xg only
    @jax.jit
    def gathers_only(R_blocks, R_idx, y, n):
        xb = jnp.zeros((NCAP + 1, 3), dtype=dtype)

        def panel_body(xb, j_rev):
            j = NPANB - 1 - j_rev
            p0 = j * PANEL
            rows = jax.lax.dynamic_slice_in_dim(R_blocks, p0, PANEL, 0)
            idx = jax.lax.dynamic_slice_in_dim(R_idx, p0, PANEL, 0)
            beyond = idx >= (p0 + PANEL)
            xg = xb[jnp.clip(idx, 0, NCAP)]
            acc = jnp.einsum("pbij,pbj->pi", rows,
                             jnp.where(beyond[..., None], xg, 0.0))
            xb = jax.lax.dynamic_update_slice_in_dim(
                xb, acc, p0, 0)
            return xb, None

        xb, _ = jax.lax.scan(panel_body, xb, jnp.arange(NPANB))
        return xb

    print(f"  gather+einsum only:         {t_it(gathers_only, R_blocks, R_idx, y, n):8.3f} ms")

    # ---------- component: one-hot T extraction + trisolve only
    @jax.jit
    def t_and_solve(R_blocks, R_idx, y, n):
        xb = jnp.zeros((NCAP + 1, 3), dtype=dtype)

        def panel_body(xb, j_rev):
            j = NPANB - 1 - j_rev
            p0 = j * PANEL
            rows = jax.lax.dynamic_slice_in_dim(R_blocks, p0, PANEL, 0)
            idx = jax.lax.dynamic_slice_in_dim(R_idx, p0, PANEL, 0)
            yp = jax.lax.dynamic_slice_in_dim(y, p0, PANEL, 0)
            prow = p0 + jnp.arange(PANEL, dtype=jnp.int32)
            active = jnp.repeat(prow < n, 3)
            inpan = (idx >= p0) & (idx < p0 + PANEL)
            oh = jax.nn.one_hot(jnp.where(inpan, idx - p0, 0), PANEL,
                                dtype=dtype) * inpan[..., None]
            T = jnp.einsum("pbij,pbc->pcij", rows, oh)
            Td = T.transpose(0, 2, 1, 3).reshape(3 * PANEL, 3 * PANEL)
            Td = Td + jnp.where(active, 0.0, 1.0) * eye_p
            xp = jax.scipy.linalg.solve_triangular(
                Td, jnp.where(active, yp.reshape(-1), 0.0), lower=False)
            xb = jax.lax.dynamic_update_slice_in_dim(
                xb, xp.reshape(PANEL, 3), p0, 0)
            return xb, None

        xb, _ = jax.lax.scan(panel_body, xb, jnp.arange(NPANB))
        return xb

    print(f"  T-extract+trisolve only:    {t_it(t_and_solve, R_blocks, R_idx, y, n):8.3f} ms")

    # ---------- variant: cached dense panel triangles (no per-panel extract)
    Tpan = jnp.asarray(
        np.tile(np.triu(rng.standard_normal((3 * PANEL, 3 * PANEL))).astype(np.float32)
                + 3.0 * np.eye(3 * PANEL, dtype=np.float32), (NPANB, 1, 1)))

    @jax.jit
    def sweep_cached_T(R_blocks, R_idx, y, Tpan, n):
        xb = jnp.zeros((NCAP + 1, 3), dtype=dtype)

        def panel_body(xb, j_rev):
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
            xp = jax.scipy.linalg.solve_triangular(
                Tpan[j], rhs, lower=False)
            xb = jax.lax.dynamic_update_slice_in_dim(
                xb, xp.reshape(PANEL, 3), p0, 0)
            return xb, None

        xb, _ = jax.lax.scan(panel_body, xb, jnp.arange(NPANB))
        return xb

    print(f"sweep cached-T:               {t_it(sweep_cached_T, R_blocks, R_idx, y, Tpan, n):8.3f} ms")

    # ---------- variant: cached panel INVERSE (matvec instead of trisolve)
    @jax.jit
    def sweep_cached_Tinv(R_blocks, R_idx, y, Tpan, n):
        xb = jnp.zeros((NCAP + 1, 3), dtype=dtype)

        def panel_body(xb, j_rev):
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
            xp = Tpan[j] @ rhs
            xb = jax.lax.dynamic_update_slice_in_dim(
                xb, xp.reshape(PANEL, 3), p0, 0)
            return xb, None

        xb, _ = jax.lax.scan(panel_body, xb, jnp.arange(NPANB))
        return xb

    print(f"sweep cached-Tinv matvec:     {t_it(sweep_cached_Tinv, R_blocks, R_idx, y, Tpan, n):8.3f} ms")

    # ---------- variant: one-hot matmul gather instead of vector gather
    @jax.jit
    def sweep_onehot_gather(R_blocks, R_idx, y, Tpan, n):
        xb = jnp.zeros((NCAP + 1, 3), dtype=dtype)

        def panel_body(xb, j_rev):
            j = NPANB - 1 - j_rev
            p0 = j * PANEL
            rows = jax.lax.dynamic_slice_in_dim(R_blocks, p0, PANEL, 0)
            idx = jax.lax.dynamic_slice_in_dim(R_idx, p0, PANEL, 0)
            yp = jax.lax.dynamic_slice_in_dim(y, p0, PANEL, 0)
            beyond = idx >= (p0 + PANEL)
            oh = jax.nn.one_hot(jnp.where(beyond, idx, NCAP), NCAP + 1,
                                dtype=dtype)          # [P, B, NCAP+1]
            xg = jnp.einsum("pbn,nj->pbj", oh, xb)
            acc = jnp.einsum("pbij,pbj->pi", rows, xg)
            rhs = (yp - acc).reshape(-1)
            xp = Tpan[j] @ rhs
            xb = jax.lax.dynamic_update_slice_in_dim(
                xb, xp.reshape(PANEL, 3), p0, 0)
            return xb, None

        xb, _ = jax.lax.scan(panel_body, xb, jnp.arange(NPANB))
        return xb

    print(f"sweep onehot-gather+Tinv:     {t_it(sweep_onehot_gather, R_blocks, R_idx, y, Tpan, n):8.3f} ms")

    # ---------- refresh cost: batched panel inversion (dirty panels)
    @jax.jit
    def invert_panels(Tpan):
        return jax.vmap(jnp.linalg.inv)(Tpan)

    print(f"invert all 32 panels:         {t_it(invert_panels, Tpan):8.3f} ms")

    @partial(jax.jit, static_argnames=("k",))
    def invert_k(Tpan, k):
        return jax.vmap(jnp.linalg.inv)(Tpan[:k])

    for k in (1, 4, 8):
        print(f"invert {k} panels:             {t_it(invert_k, Tpan, k=k):8.3f} ms")


if __name__ == "__main__":
    main()
