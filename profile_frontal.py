"""Frontal-core dissection on TPU: times each sub-op of _frontal_core at the
M=256 bucket standalone, to locate the ~4 ms compute gap (profile_body shows
frontal_core-only at 7 ms incl. ~2.8 ms dispatch floor, while QR is 0.11 ms).
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
    return (time.perf_counter() - t0) / n * 1e3


def main():
    import jax
    import jax.numpy as jnp

    from aprilsam_tpu.utils import enable_compilation_cache, setup_precision

    enable_compilation_cache()
    setup_precision()
    print(f"platform: {jax.devices()[0].platform}", flush=True)

    NCAP, BCAP, KNEW = 4096, 96, 32
    dtype = jnp.float32
    rng = np.random.default_rng(0)

    for M in (16, 64, 256):
        K3 = 3 * M
        R_blocks = jnp.asarray(rng.standard_normal((NCAP, BCAP, 3, 3)),
                               dtype=dtype)
        F_pos = jnp.asarray(np.sort(rng.choice(NCAP, M, replace=False))
                            .astype(np.int32))
        gather_fc = jnp.asarray(
            rng.integers(-1, M, (M, BCAP)).astype(np.int32))
        rows = R_blocks[F_pos]

        # 1. row gather
        g1 = jax.jit(lambda Rb, fp: Rb[fp])
        print(f"M={M:4d} row gather [M,BCAP,3,3]:      "
              f"{t_it(g1, R_blocks, F_pos):8.3f} ms")

        # 2. one-hot frontal densify einsum (current form)
        def densify(rows, fc):
            oh = jax.nn.one_hot(jnp.clip(fc, 0, M), M, dtype=dtype)
            oh = oh * (fc >= 0)[..., None]
            RF = jnp.einsum("rbij,rbc->rcij", rows, oh)
            return RF.transpose(0, 2, 1, 3).reshape(K3, K3)

        print(f"M={M:4d} one-hot densify einsum:       "
              f"{t_it(jax.jit(densify), rows, gather_fc):8.3f} ms")

        # 2b. scalar-matmul densify: expand one-hot at scalar level and use
        # a single [3M? no: per-row (3 x 3BCAP) @ (3BCAP x 3M)] batched matmul
        def densify_mm(rows, fc):
            oh = jax.nn.one_hot(jnp.clip(fc, 0, M), M, dtype=dtype)
            oh = oh * (fc >= 0)[..., None]                    # [M, BCAP, M]
            # scalar layout: Rrows [M, 3, BCAP*3]; ohS [M, BCAP*3, M*3]
            Rr = rows.transpose(0, 2, 1, 3).reshape(M, 3, BCAP * 3)
            ohS = jnp.einsum("rbc,ij->rbicj", oh,
                             jnp.eye(3, dtype=dtype)).reshape(M, BCAP * 3,
                                                              M * 3)
            out = jnp.einsum("rib,rbk->rik", Rr, ohS)         # [M, 3, M*3]
            return out.reshape(K3, K3)

        print(f"M={M:4d} scalar-matmul densify:        "
              f"{t_it(jax.jit(densify_mm), rows, gather_fc):8.3f} ms")

        # 3. QR
        C = jnp.asarray(rng.standard_normal((K3 + 6 * KNEW, K3)), dtype=dtype)
        qr = jax.jit(lambda c: jnp.linalg.qr(c, mode="reduced"))
        print(f"M={M:4d} QR [{K3 + 6*KNEW}x{K3}]:      "
              f"{t_it(qr, C):8.3f} ms")

        # 4. scatter-back: einsum + row set
        R_up = jnp.asarray(rng.standard_normal((K3, K3)), dtype=dtype)
        scat_fc = gather_fc

        def scatter_back(Rb, R_up, fc, fp):
            Rt = R_up.reshape(M, 3, M, 3).transpose(0, 2, 1, 3)
            oh = jax.nn.one_hot(jnp.clip(fc, 0, M), M, dtype=dtype)
            oh = oh * (fc >= 0)[..., None]
            nb = jnp.einsum("rcij,rbc->rbij", Rt, oh)
            return Rb.at[fp].set(nb, mode="drop")

        print(f"M={M:4d} scatter-back einsum+set:      "
              f"{t_it(jax.jit(scatter_back), R_blocks, R_up, scat_fc, F_pos):8.3f} ms")

        # 5. pos2f one-hot over NCAP
        def pos2f_fn(fp):
            oh = jax.nn.one_hot(jnp.clip(fp, 0, NCAP), NCAP + 1, dtype=dtype)
            slot1 = jnp.arange(M, dtype=dtype) + 1.0
            return jnp.einsum("mn,m->n", oh, slot1).astype(jnp.int32) - 1

        print(f"M={M:4d} pos2f one-hot:                "
              f"{t_it(jax.jit(pos2f_fn), F_pos):8.3f} ms")

        # 6. slot-map derivation gathers
        def slotmaps(Ridx, fp, p2f):
            old = Ridx[jnp.clip(fp, 0, NCAP - 1)]
            return p2f[jnp.clip(old, 0, NCAP)]

        R_idx = jnp.asarray(
            rng.integers(0, NCAP, (NCAP, BCAP)).astype(np.int32))
        p2f = jnp.asarray(rng.integers(-1, M, NCAP + 1).astype(np.int32))
        print(f"M={M:4d} slot-map gathers:             "
              f"{t_it(jax.jit(slotmaps), R_idx, F_pos, p2f):8.3f} ms")

        # 7. Jrow build (measurement rows)
        Wh = jnp.asarray(rng.standard_normal((KNEW, 3, 3)), dtype=dtype)
        Ja = jnp.asarray(rng.standard_normal((KNEW, 3, 3)), dtype=dtype)
        sa = jnp.asarray(rng.integers(0, M, KNEW).astype(np.int32))

        def jrow(Wh, Ja, sa):
            Jr = jnp.zeros((KNEW, 3, M + 1, 3), dtype=dtype)
            Jr = Jr.at[jnp.arange(KNEW), :, sa, :].add(
                jnp.einsum("fik,fkj->fij", Wh, Ja))
            return Jr[:, :, :M, :].reshape(KNEW * 3, K3)

        print(f"M={M:4d} Jrow scatter build:           "
              f"{t_it(jax.jit(jrow), Wh, Ja, sa):8.3f} ms")
        print()


if __name__ == "__main__":
    main()
