"""Microbench v3: K chained QR/chol iterations INSIDE one executable
(lax.fori_loop), one dispatch, float() readback.  Per-iter cost =
(t(K2)-t(K1))/(K2-K1) cancels dispatch+readback overhead."""
import time
import numpy as np
import jax, jax.numpy as jnp
from functools import partial
from aprilsam_tpu.utils import enable_compilation_cache
enable_compilation_cache()

print("platform:", jax.devices()[0].platform, flush=True)

rng = np.random.default_rng(0)

def bench(n3, p, K1=4, K2=24):
    W = jnp.asarray(rng.standard_normal((p, n3)).astype(np.float32) * 0.01)
    eye = jnp.eye(n3, dtype=jnp.float32)
    R0 = jnp.asarray(np.triu(rng.standard_normal((n3, n3))).astype(np.float32) * 0.01 + np.eye(n3, dtype=np.float32))
    y0 = jnp.asarray(rng.standard_normal((n3,)).astype(np.float32))

    @partial(jax.jit, static_argnames=("K",))
    def qr_loop(R, K):
        def body(i, R):
            C = jnp.concatenate([R, W], axis=0)
            Q, R2 = jnp.linalg.qr(C, mode="reduced")
            d = jnp.abs(jnp.diagonal(R2)) + 1e-6
            return R2 * (1.0 / d)[:, None]
        return jnp.sum(jax.lax.fori_loop(0, K, body, R))

    @partial(jax.jit, static_argnames=("K",))
    def chol_loop(R, K):
        def body(i, R):
            G = R.T @ R + W.T @ W + eye
            L = jnp.linalg.cholesky(G)
            d = jnp.abs(jnp.diagonal(L)) + 1e-6
            return (L * (1.0 / d)[:, None]).T
        return jnp.sum(jax.lax.fori_loop(0, K, body, R))

    @partial(jax.jit, static_argnames=("K",))
    def qty_loop(R, K):
        # QR + Q^T y + trisolve: the actual frontal-update compute
        def body(i, carry):
            R, y = carry
            C = jnp.concatenate([R, W], axis=0)
            Q, R2 = jnp.linalg.qr(C, mode="reduced")
            yn = Q.T @ jnp.concatenate([y, jnp.zeros(p, jnp.float32)])
            x = jax.scipy.linalg.solve_triangular(R2, yn, lower=False)
            d = jnp.abs(jnp.diagonal(R2)) + 1e-6
            return (R2 * (1.0 / d)[:, None], yn + 1e-9 * x)
        R, y = jax.lax.fori_loop(0, K, body, (R, y0))
        return jnp.sum(R) + jnp.sum(y)

    out = {}
    for name, fn in (("qr", qr_loop), ("gram+chol", chol_loop), ("qr+qty+solve", qty_loop)):
        ts = {}
        for K in (K1, K2):
            float(fn(R0, K))  # compile+warm
            t0 = time.perf_counter()
            v = float(fn(R0, K))
            ts[K] = time.perf_counter() - t0
        out[name] = (ts[K2] - ts[K1]) / (K2 - K1) * 1e3
    return out

for m in (16, 64, 128, 256, 512):
    r = bench(3 * m, 3 * 80)
    print(f"m={m:4d} n={3*m:5d}: " + "  ".join(f"{k}={v:8.3f} ms" for k, v in r.items()), flush=True)
