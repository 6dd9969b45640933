"""Reproduce the in-situ Gram slowness: strip build + dots inside a scan."""
import time
from functools import partial
import numpy as np
import jax
import jax.numpy as jnp
from aprilsam_tpu.utils import enable_compilation_cache, setup_precision
enable_compilation_cache()
setup_precision()
print("platform:", jax.devices()[0].platform, flush=True)

NCAP, BCAP, PANEL, MC, NU, NPANB = 4096, 96, 128, 1024, 768, 32
P3 = 3 * PANEL
key = jax.random.PRNGKey(0)
Rb = jax.random.normal(key, (NCAP, BCAP, 3, 3), dtype=jnp.float32)
Ridx = jax.random.randint(key, (NCAP, BCAP), 0, NCAP, dtype=jnp.int32)
Ridx = jnp.sort(Ridx, axis=1)
yv = jax.random.normal(key, (NCAP, 3), dtype=jnp.float32)
crow = jax.random.randint(key, (NPANB, MC), 0, NCAP, dtype=jnp.int32)
ucols = jnp.sort(jax.random.randint(key, (NPANB, NU), 0, NCAP, dtype=jnp.int32), axis=1)


def timed(name, f, *args):
    v = float(f(*args, REPS=1))
    v = float(f(*args, REPS=9))
    t0 = time.perf_counter(); v = float(f(*args, REPS=1)); t1 = time.perf_counter() - t0
    t0 = time.perf_counter(); v = float(f(*args, REPS=9)); t9 = time.perf_counter() - t0
    print(f"{name}: {(t9-t1)/8*1e3:.1f} ms/iter", flush=True)


def variant(mode):
    @partial(jax.jit, static_argnames=("REPS",))
    def f(Rb, Ridx, yv, crow, ucols, REPS=1):
        def rep(_i, acc):
            def body(carry, xs):
                acc = carry
                k, crow_k, ucols_k = xs
                p0 = k * jnp.int32(PANEL)
                cr = jnp.clip(crow_k, 0, NCAP - 1)
                rows_c = Rb[cr]
                idx_c = Ridx[cr]
                y_c = yv[cr]
                dtype = jnp.float32
                if mode in ("onehot", "onehot_direct"):
                    locc = idx_c - p0
                    cin = (locc >= 0) & (locc < PANEL)
                    ohc = jax.nn.one_hot(jnp.where(cin, locc, 0), PANEL,
                                         dtype=dtype) * cin[..., None]
                    ohu_c = (idx_c[:, :, None] == ucols_k[None, None, :]).astype(dtype)
                    if mode == "onehot":
                        Wp = jnp.einsum("mbij,mbp->mpij", rows_c, ohc)
                        Wps = Wp.transpose(0, 2, 1, 3).reshape(3 * MC, P3)
                        Wu = jnp.einsum("mbij,mbu->muij", rows_c, ohu_c)
                        Wus = Wu.transpose(0, 2, 1, 3).reshape(3 * MC, 3 * NU)
                    else:
                        Wps = jnp.einsum("mbij,mbp->mipj", rows_c, ohc).reshape(3 * MC, P3)
                        Wus = jnp.einsum("mbij,mbu->miuj", rows_c, ohu_c).reshape(3 * MC, 3 * NU)
                elif mode == "gather":
                    tcols = jnp.concatenate([p0 + jnp.arange(PANEL, dtype=jnp.int32), ucols_k])
                    cnt = (idx_c[:, :, None] < tcols[None, None, :]).sum(1)  # [MC, T]
                    cnt = jnp.clip(cnt, 0, BCAP - 1)
                    hit = jnp.take_along_axis(idx_c, cnt, axis=1) == tcols[None, :]
                    Wstrip = jnp.take_along_axis(
                        rows_c, cnt[..., None, None], axis=1) * hit[..., None, None]
                    Wall = Wstrip.transpose(0, 2, 1, 3).reshape(3 * MC, 3 * (PANEL + NU))
                    Wps = Wall[:, :P3]
                    Wus = Wall[:, P3:]
                S = Wps.T @ Wps
                Su = Wps.T @ Wus
                by = Wps.T @ y_c.reshape(3 * MC)
                return acc + (S * S).sum() * 1e-30 + (Su * Su).sum() * 1e-30 + (by * by).sum() * 1e-30, None
            acc, _ = jax.lax.scan(
                body, acc, (jnp.arange(NPANB, dtype=jnp.int32), crow, ucols))
            return acc
        return jax.lax.fori_loop(0, REPS, rep, jnp.float32(0))
    return f


def variant_strips_only(mode):
    @partial(jax.jit, static_argnames=("REPS",))
    def f(Rb, Ridx, yv, crow, ucols, REPS=1):
        def rep(_i, acc):
            def body(carry, xs):
                acc = carry
                k, crow_k, ucols_k = xs
                p0 = k * jnp.int32(PANEL)
                cr = jnp.clip(crow_k, 0, NCAP - 1)
                rows_c = Rb[cr]
                idx_c = Ridx[cr]
                dtype = jnp.float32
                if mode == "onehot":
                    locc = idx_c - p0
                    cin = (locc >= 0) & (locc < PANEL)
                    ohc = jax.nn.one_hot(jnp.where(cin, locc, 0), PANEL,
                                         dtype=dtype) * cin[..., None]
                    ohu_c = (idx_c[:, :, None] == ucols_k[None, None, :]).astype(dtype)
                    Wp = jnp.einsum("mbij,mbp->mpij", rows_c, ohc)
                    Wps = Wp.transpose(0, 2, 1, 3).reshape(3 * MC, P3)
                    Wu = jnp.einsum("mbij,mbu->muij", rows_c, ohu_c)
                    Wus = Wu.transpose(0, 2, 1, 3).reshape(3 * MC, 3 * NU)
                else:
                    tcols = jnp.concatenate([p0 + jnp.arange(PANEL, dtype=jnp.int32), ucols_k])
                    cnt = (idx_c[:, :, None] < tcols[None, None, :]).sum(1)
                    cnt = jnp.clip(cnt, 0, BCAP - 1)
                    hit = jnp.take_along_axis(idx_c, cnt, axis=1) == tcols[None, :]
                    Wstrip = jnp.take_along_axis(
                        rows_c, cnt[..., None, None], axis=1) * hit[..., None, None]
                    Wall = Wstrip.transpose(0, 2, 1, 3).reshape(3 * MC, 3 * (PANEL + NU))
                    Wps = Wall[:, :P3]
                    Wus = Wall[:, P3:]
                return acc + (Wps * Wps).sum() * 1e-30 + (Wus * Wus).sum() * 1e-30, None
            acc, _ = jax.lax.scan(
                body, acc, (jnp.arange(NPANB, dtype=jnp.int32), crow, ucols))
            return acc
        return jax.lax.fori_loop(0, REPS, rep, jnp.float32(0))
    return f


timed("strips-only onehot", variant_strips_only("onehot"), Rb, Ridx, yv, crow, ucols)
timed("strips-only gather", variant_strips_only("gather"), Rb, Ridx, yv, crow, ucols)
timed("strip+dots onehot (in-situ form)", variant("onehot"), Rb, Ridx, yv, crow, ucols)
timed("strip+dots onehot direct-order", variant("onehot_direct"), Rb, Ridx, yv, crow, ucols)
timed("strip+dots gather", variant("gather"), Rb, Ridx, yv, crow, ucols)
