"""Persistent XLA compilation cache setup.

TPU compiles in this environment go through a remote-compile relay and cost
tens of seconds each; the persistent cache makes warm restarts near-free.
"""

import os


def setup_precision() -> None:
    """Force float32 matmul precision on TPU.

    The MXU's default f32 "matmul" multiplies bf16-truncated operands
    (~1e-3 relative error), which is catastrophic for normal-equation
    assembly: the assembled Hessian goes indefinite and Cholesky NaNs.
    Gauss-Newton assembly, QR updates, and solves all need true fp32.
    """
    import jax

    jax.config.update("jax_default_matmul_precision", "highest")


def enable_compilation_cache(path: str = None) -> None:
    import jax

    platform = jax.default_backend()
    path = path or os.environ.get(
        "APRILSAM_JAX_CACHE",
        os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))), f".jax_cache-{platform}"),
    )
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # cache is an optimization only
