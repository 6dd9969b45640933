"""Benchmark harness: full M3500 incremental replay on the available device.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Baseline (BASELINE.md): the C reference replays M3500 incrementally at a
1.41 ms mean step => ~711 poses/s on one x86 core, final chi2 in the
68.96 - 69.91 band (the reference trajectory is machine-dependent through
its wall-clock batch gate; both its endpoints sit in that band).

Architecture: a pure-stdlib orchestrator (this process never imports jax)
drives the replay in a subprocess so a dead TPU relay can never hang the
bench into recording nothing:

  1. probe the accelerator with a short timeout (retry once);
  2. healthy -> run the TPU worker; it streams PROGRESS lines so a mid-run
     relay death still yields a partial throughput number;
  3. unhealthy / worker died with no progress -> run the worker on CPU with
     the axon sitecustomize neutralized, emitting a clearly-labeled
     `..._cpu_fallback` metric instead of a zero.

The replay itself runs in deferred mode: odometry seeding and per-step chi2
stay on device, policy counters are read back with an 8-step lag, so
throughput is bounded by compute rather than the host<->device round-trip.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import threading
import time

BASELINE_POSES_PER_SEC = 711.0
CHI2_BAND = (60.0, 80.0)  # sanity band around the reference optimum ~69
M3500 = "/root/reference/data/M3500.txt"
REPO = os.path.dirname(os.path.abspath(__file__))

PROBE_TIMEOUT_S = 75.0      # first d2h readback through the relay is slow
PROBE_RETRY_TIMEOUT_S = 45.0
TPU_WORKER_TIMEOUT_S = 2700.0  # cold-cache warmup compiles ~20 min once;
                               # warm runs finish in ~2 min
CPU_WORKER_TIMEOUT_S = 900.0


# ======================================================================
# worker (runs the actual replay; platform comes from the environment)
# ======================================================================

def worker() -> int:
    import numpy as np
    import jax

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
        policy_lag=16,
        bundle_size=32,         # amortize dispatch round-trips (profile_body:
                                # fast x32 = 0.32 ms/step vs x8 = 0.51)
        policy_poll=64,         # one policy d2h per ~4 bundles (each d2h
                                # costs ~1 ms through the relay)
        log_chi2=False,         # the C demo times only the solver call
                                # (aprilsam_demo.c:101-115); chi2 is computed
                                # off the clock, here once at the end
    )

    # warmup: run a short prefix (compiles the batch path), then drive every
    # step/bundle specialization with dead-slot plans so no compile lands in
    # the timed region (entries persist in the compilation cache)
    warm = Replay(loaded, cfg, batch_update_only=False, deferred=True)
    warm.run(max_steps=60)
    warm.solver.precompile(nnodes=loaded.nnodes)
    del warm

    rep = Replay(loaded, cfg, batch_update_only=False, deferred=True)
    t0 = time.perf_counter()
    n = 0
    while True:
        res = rep.step()
        if res is None:
            break
        n += 1
        if n % 500 == 0:
            # dispatch-side progress (device may lag by <= a bundle); lets
            # the orchestrator salvage a partial number if the relay dies
            print("PROGRESS " + json.dumps({
                "steps": n, "elapsed_s": time.perf_counter() - t0,
                "platform": platform}), flush=True)
    # flush queued bundles and wait for the device INSIDE the clock (the
    # optimizer isn't done until its dispatched work is), then read the
    # final chi2 off the clock — the reference also computes chi2 outside
    # its step timer (aprilsam_demo.c:229-232)
    rep.solver.flush(rep.graph)
    jax.block_until_ready(rep.solver.ds.state)
    total_s = time.perf_counter() - t0

    final_chi2 = rep.solver.chi2()
    poses_per_sec = n / total_s
    ok = CHI2_BAND[0] <= final_chi2 <= CHI2_BAND[1]

    print("RESULT " + json.dumps({
        "poses_per_sec": poses_per_sec,
        "final_chi2": final_chi2,
        "steps": n,
        "total_s": total_s,
        "platform": platform,
        "chi2_ok": ok,
    }), flush=True)
    return 0


# ======================================================================
# orchestrator
# ======================================================================

def _cpu_env() -> dict:
    """Environment for a CPU-only worker: neutralize the axon sitecustomize
    (it dials the TPU relay at interpreter start regardless of
    JAX_PLATFORMS) and force the cpu backend."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PALLAS_AXON_POOL_IPS", None)  # sitecustomize no-ops without it
    parts = [p for p in env.get("PYTHONPATH", "").split(os.pathsep)
             if p and ".axon_site" not in p]
    env["PYTHONPATH"] = os.pathsep.join(parts)
    return env


def _probe(timeout_s: float) -> bool:
    """Probe the accelerator in a subprocess: this environment's TPU relay
    can die and leave every device op hanging forever; a structured failure
    beats an infinite hang."""
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


def _run_worker(env: dict, timeout_s: float):
    """Run the replay worker; returns (result dict | None, progress dict | None)."""
    proc = subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--worker"],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
        text=True, env=env, cwd=REPO,
    )
    result = {}
    progress = {}

    def reader():
        for line in proc.stdout:
            line = line.strip()
            if line.startswith("PROGRESS "):
                try:
                    progress.update(json.loads(line[len("PROGRESS "):]))
                except json.JSONDecodeError:
                    pass
            elif line.startswith("RESULT "):
                try:
                    result.update(json.loads(line[len("RESULT "):]))
                except json.JSONDecodeError:
                    pass

    t = threading.Thread(target=reader, daemon=True)
    t.start()
    try:
        proc.wait(timeout=timeout_s)
    except subprocess.TimeoutExpired:
        proc.kill()
    t.join(timeout=10.0)
    return (result or None), (progress or None)


def _emit(metric: str, value: float, unit: str) -> None:
    print(json.dumps({
        "metric": metric,
        "value": round(value, 2),
        "unit": unit,
        "vs_baseline": round(value / BASELINE_POSES_PER_SEC, 3),
    }))


def main() -> int:
    forced_cpu = os.environ.get("JAX_PLATFORMS", "") == "cpu"
    device_ok = False
    if not forced_cpu:
        device_ok = _probe(PROBE_TIMEOUT_S) or _probe(PROBE_RETRY_TIMEOUT_S)

    if device_ok:
        result, progress = _run_worker(dict(os.environ), TPU_WORKER_TIMEOUT_S)
        if result:
            ok = result.get("chi2_ok", False)
            _emit(
                "m3500_incremental_replay_poses_per_sec"
                + ("" if ok else "_CHI2_PARITY_FAIL"),
                result["poses_per_sec"],
                f"poses/s (final_chi2={result['final_chi2']:.3f}, "
                f"platform={result['platform']}, steps={result['steps']})",
            )
            return 0
        if progress and progress.get("steps", 0) >= 500:
            # relay died mid-run: salvage the dispatch-side partial number
            pps = progress["steps"] / progress["elapsed_s"]
            _emit(
                "m3500_incremental_replay_poses_per_sec_PARTIAL",
                pps,
                f"poses/s (worker died after {progress['steps']} steps; "
                f"dispatch-side rate, platform={progress['platform']})",
            )
            return 0

    # accelerator unreachable (or forced cpu): clearly-labeled CPU fallback
    result, progress = _run_worker(_cpu_env(), CPU_WORKER_TIMEOUT_S)
    if result:
        ok = result.get("chi2_ok", False)
        _emit(
            "m3500_incremental_replay_poses_per_sec_cpu_fallback"
            + ("" if ok else "_CHI2_PARITY_FAIL"),
            result["poses_per_sec"],
            f"poses/s (final_chi2={result['final_chi2']:.3f}, platform=cpu, "
            f"steps={result['steps']}; accelerator "
            + ("forced off" if forced_cpu else "unreachable") + ")",
        )
        return 0
    if progress and progress.get("steps", 0) >= 500:
        pps = progress["steps"] / progress["elapsed_s"]
        _emit(
            "m3500_incremental_replay_poses_per_sec_cpu_fallback_PARTIAL",
            pps,
            f"poses/s (cpu worker timed out after {progress['steps']} steps)",
        )
        return 0

    print(json.dumps({
        "metric": "m3500_incremental_replay_poses_per_sec_DEVICE_UNREACHABLE",
        "value": 0.0,
        "unit": "poses/s (accelerator probe failed and cpu fallback died)",
        "vs_baseline": 0.0,
    }))
    return 1


if __name__ == "__main__":
    if "--worker" in sys.argv:
        sys.exit(worker())
    sys.exit(main())
