"""Microbench the panel Gram matmuls at exact epoch shapes, by precision."""
import time
from functools import partial
import numpy as np
import jax
import jax.numpy as jnp
from aprilsam_tpu.utils import enable_compilation_cache
enable_compilation_cache()
print("platform:", jax.devices()[0].platform, flush=True)

MC3, P3, NU3 = 3072, 384, 2304
NPANB = 32
key = jax.random.PRNGKey(0)
Wps = jax.random.normal(key, (NPANB, MC3, P3), dtype=jnp.float32)
Wus = jax.random.normal(key, (NPANB, MC3, NU3), dtype=jnp.float32)
yc = jax.random.normal(key, (NPANB, MC3), dtype=jnp.float32)


def run(name, fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    N = 10
    for _ in range(N):
        out = fn(*args)
        jax.block_until_ready(out)
    print(f"{name}: {(time.perf_counter()-t0)/N*1e3:.2f} ms", flush=True)


def make_scan(prec):
    @jax.jit
    def f(Wps, Wus, yc):
        def body(acc, xs):
            wp, wu, y = xs
            S = jax.lax.dot_general(wp, wp, (((0,), (0,)), ((), ())),
                                    precision=prec)
            Su = jax.lax.dot_general(wp, wu, (((0,), (0,)), ((), ())),
                                     precision=prec)
            by = jax.lax.dot_general(wp, y, (((0,), (0,)), ((), ())),
                                     precision=prec)
            return acc + (S*S).sum() + (Su*Su).sum() + (by*by).sum(), None
        acc, _ = jax.lax.scan(body, jnp.float32(0), (Wps, Wus, yc))
        return acc
    return f


for prec in ("highest", "high", "default"):
    run(f"scan32 S+Su+by prec={prec}", make_scan(prec), Wps, Wus, yc)

# combined single matmul [P3, MC3] @ [MC3, P3+NU3+1]
def make_comb(prec):
    @jax.jit
    def f(Wps, Wus, yc):
        def body(acc, xs):
            wp, wu, y = xs
            rhs = jnp.concatenate([wp, wu, y[:, None]], axis=1)
            G = jax.lax.dot_general(wp, rhs, (((0,), (0,)), ((), ())),
                                    precision=prec)
            return acc + (G*G).sum(), None
        acc, _ = jax.lax.scan(body, jnp.float32(0), (Wps, Wus, yc))
        return acc
    return f


for prec in ("highest", "high"):
    run(f"scan32 combined prec={prec}", make_comb(prec), Wps, Wus, yc)

# batched (no scan) all 32 panels at once
def make_batched(prec):
    @jax.jit
    def f(Wps, Wus, yc):
        rhs = jnp.concatenate([Wps, Wus, yc[..., None]], axis=2)
        G = jax.lax.dot_general(Wps, rhs, (((1,), (1,)), ((0,), (0,))),
                                precision=prec)
        return (G*G).sum()
    return f


for prec in ("highest", "high"):
    run(f"batched combined prec={prec}", make_batched(prec), Wps, Wus, yc)

# f32 accumulate from bf16 operands (explicit cast)
@jax.jit
def bf16_scan(Wps, Wus, yc):
    def body(acc, xs):
        wp, wu, y = xs
        wpb = wp.astype(jnp.bfloat16)
        rhs = jnp.concatenate([wp, wu, y[:, None]], axis=1).astype(jnp.bfloat16)
        G = jax.lax.dot_general(wpb, rhs, (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        return acc + (G*G).sum(), None
    acc, _ = jax.lax.scan(body, jnp.float32(0), (Wps, Wus, yc))
    return acc


run("scan32 bf16-operand f32-acc", bf16_scan, Wps, Wus, yc)
