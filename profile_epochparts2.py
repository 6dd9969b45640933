"""TPU: chained per-part decomposition of _batch_step at MB=4096."""
import time
import numpy as np
import jax, jax.numpy as jnp
from functools import partial
from aprilsam_tpu.utils import enable_compilation_cache, setup_precision
enable_compilation_cache()
setup_precision()
print("platform:", jax.devices()[0].platform, flush=True)

from aprilsam_tpu.kernels.assembly import assemble_block_dense

rng = np.random.default_rng(0)
MB = 4096
n3 = 3 * MB
NCAP, BCAP, F = 4096, 96, 8192
KEXT = 32768

lp = jnp.asarray(rng.standard_normal((NCAP, 3)).astype(np.float32))
pos = jnp.asarray(np.arange(NCAP, dtype=np.int32))
xa = jnp.asarray(rng.integers(0, 3000, F).astype(np.int32))
xb = jnp.asarray((rng.integers(0, 3000, F) % 3000).astype(np.int32))
xz = jnp.asarray(rng.standard_normal((F, 3)).astype(np.float32))
xW = jnp.asarray(np.tile(np.eye(3, dtype=np.float32) * 10, (F, 1, 1)))
xv = jnp.asarray(np.ones(F, dtype=bool))
pn = jnp.asarray(np.zeros(1024, dtype=np.int32))
pz = jnp.asarray(np.zeros((1024, 3), dtype=np.float32))
pW = jnp.asarray(np.tile(np.eye(3, dtype=np.float32), (1024, 1, 1)))
pv = jnp.asarray(np.zeros(1024, dtype=bool))

@jax.jit
def asm(lp):
    A, B = assemble_block_dense(lp, lp, pos, xa, xb, xz, xW, xv,
                                pn, pz, pW, pv, MB=MB, tikhonov=1e-4,
                                dtype=jnp.float32)
    return A, B, jnp.sum(A) + jnp.sum(B)

@jax.jit
def chol_part(A):
    dvec = jax.lax.rsqrt(jnp.maximum(jnp.diagonal(A), 1e-30))
    As = A * dvec[:, None] * dvec[None, :]
    Ls = jnp.linalg.cholesky(As)
    return Ls, jnp.sum(Ls)

@jax.jit
def solve_part(Ls, B):
    y = jax.scipy.linalg.solve_triangular(Ls, B, lower=True)
    x = jax.scipy.linalg.solve_triangular(Ls.T, y, lower=False)
    return x, jnp.sum(x) + jnp.sum(y)

ext_p = jnp.asarray(rng.integers(0, NCAP, KEXT).astype(np.int32))
ext_s = jnp.asarray(rng.integers(0, BCAP, KEXT).astype(np.int32))
ext_c = jnp.asarray(rng.integers(0, MB, KEXT).astype(np.int32))

@jax.jit
def extract_part(L):
    gidx = jnp.stack([3 * ext_c, 3 * ext_p], axis=1)
    gdn = jax.lax.GatherDimensionNumbers(offset_dims=(1, 2), collapsed_slice_dims=(), start_index_map=(0, 1))
    blocks = jax.lax.gather(L, gidx, gdn, slice_sizes=(3, 3))
    sidx = jnp.stack([ext_p, ext_s], axis=1)
    sdn = jax.lax.ScatterDimensionNumbers(update_window_dims=(1, 2), inserted_window_dims=(0, 1), scatter_dims_to_operand_dims=(0, 1))
    Rb = jax.lax.scatter(jnp.zeros((NCAP, BCAP, 3, 3), jnp.float32), sidx,
                         blocks.transpose(0, 2, 1), sdn,
                         mode=jax.lax.GatherScatterMode.FILL_OR_DROP)
    return Rb, jnp.sum(Rb)

def chain(fn, x0, n=8, aux=None):
    args = (x0,) if aux is None else (x0, aux)
    out = fn(*args)
    jax.block_until_ready(out[-1])
    t0 = time.perf_counter()
    x = x0
    for _ in range(n):
        args = (x,) if aux is None else (x, aux)
        out = fn(*args)
        x = out[0] if out[0].shape == x0.shape else x0
    jax.block_until_ready(out[-1])
    return (time.perf_counter() - t0) / n * 1e3

t_asm = chain(asm, lp)
A, B, _ = asm(lp)
A = A + n3 * jnp.eye(n3)
t_chol = chain(chol_part, A)
Ls, _ = chol_part(A)
t_solve = chain(solve_part, Ls, aux=B)
t_ext = chain(extract_part, Ls)
print(f"assembly: {t_asm:.1f} ms\nchol[{n3}]: {t_chol:.1f} ms\nsolves: {t_solve:.1f} ms\nextract+scatter: {t_ext:.1f} ms", flush=True)
