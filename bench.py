"""Benchmark harness: full M3500 incremental replay on the available device.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Baseline (BASELINE.md): the C reference replays M3500 incrementally at a
1.41 ms mean step => ~711 poses/s on one x86 core, final chi2 in the
68.96 - 69.91 band (the reference trajectory is machine-dependent through
its wall-clock batch gate; both its endpoints sit in that band).

The replay runs in deferred mode: odometry seeding and per-step chi2 stay on
device, policy counters are read back with an 8-step lag, so throughput is
bounded by compute rather than the host<->device round-trip.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

BASELINE_POSES_PER_SEC = 711.0
CHI2_BAND = (60.0, 80.0)  # sanity band around the reference optimum ~69
M3500 = "/root/reference/data/M3500.txt"


def _device_healthy(timeout_s: float = 240.0) -> bool:
    """Probe the accelerator in a subprocess: this environment's TPU relay
    can die and leave every device op hanging forever; a structured failure
    beats an infinite hang."""
    import subprocess
    import sys

    try:
        out = subprocess.run(
            [sys.executable, "-c",
             "import jax, jax.numpy as jnp;"
             "print(float((jnp.ones((8,8))@jnp.ones((8,8))).sum()))"],
            capture_output=True, text=True, timeout=timeout_s,
        )
        return out.returncode == 0 and "512" in out.stdout
    except Exception:
        return False


def main() -> int:
    import jax

    if not _device_healthy():
        print(json.dumps({
            "metric": "m3500_incremental_replay_poses_per_sec_DEVICE_UNREACHABLE",
            "value": 0.0,
            "unit": "poses/s (accelerator probe timed out; relay/tunnel down)",
            "vs_baseline": 0.0,
        }))
        return 1

    from aprilsam_tpu.utils import enable_compilation_cache, setup_precision

    enable_compilation_cache()
    setup_precision()

    platform = jax.devices()[0].platform
    use_x64 = platform == "cpu"
    if use_x64:
        jax.config.update("jax_enable_x64", True)

    from aprilsam_tpu.io import load_g2o_text
    from aprilsam_tpu.replay import Replay
    from aprilsam_tpu.solver import SolverConfig

    loaded = load_g2o_text(M3500)

    cfg = SolverConfig(
        dtype=np.float64 if use_x64 else np.float32,
        node_capacity=4096,
        factor_capacity=8192,
        row_block_capacity=96,
        panel_nodes=128,
        wallclock_gate=False,   # deterministic trajectory (matches the
                                # published 69.91 semantics, BASELINE.md)
        policy_lag=8,
        bundle_size=8,          # amortize dispatch round-trips
    )

    # warmup: run a short prefix (compiles the batch path), then drive every
    # step/bundle specialization with dead-slot plans so no compile lands in
    # the timed region (entries persist in the compilation cache)
    warm = Replay(loaded, cfg, batch_update_only=False, deferred=True)
    warm.run(max_steps=60)
    warm.solver.precompile()
    del warm

    rep = Replay(loaded, cfg, batch_update_only=False, deferred=True)
    t0 = time.perf_counter()
    res = rep.run()
    total_s = time.perf_counter() - t0

    n = len(res)
    hist = rep.solver.chi2_history()
    final_chi2 = float(hist[-1]) if len(hist) else float("nan")
    poses_per_sec = n / total_s
    ok = CHI2_BAND[0] <= final_chi2 <= CHI2_BAND[1]

    print(json.dumps({
        "metric": "m3500_incremental_replay_poses_per_sec"
        + ("" if ok else "_CHI2_PARITY_FAIL"),
        "value": round(poses_per_sec, 2),
        "unit": f"poses/s (final_chi2={final_chi2:.3f}, platform={platform}, "
                f"steps={n})",
        "vs_baseline": round(poses_per_sec / BASELINE_POSES_PER_SEC, 3),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
