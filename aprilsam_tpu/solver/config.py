"""Solver configuration.

TPU-native split of the reference's april_graph_cholesky_param_t
(reference: aprilsam.h:230-269): immutable hyper-parameters live here;
mutable solver state (R factor, y, ordering, tree, counters) lives in
solver/state.py as a device pytree + host symbolic state.

Defaults match the reference demo exactly: tikhonov 1e-4
(april_graph_cholesky_param_init, aprilsam.c:45-64), delta_xy = 0.1,
delta_theta = 0.1, nthreshold = 100 (examples/aprilsam_demo.c:250-252).
"""

from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass(frozen=True)
class SolverConfig:
    # --- policy thresholds (reference semantics) ---
    delta_xy: float = 0.1        # relinearization |dx|,|dy| threshold
    delta_theta: float = 0.1     # relinearization |dtheta| threshold
    nthreshold: int = 100        # batch fallback when start_over exceeds this
    tikhonov: float = 1e-4       # diagonal damping, batch assembly only
    # Incremental steps slower than batch_time/3 force a batch
    # (aprilsam.c:557-559); naffected <= small_path_max takes the pruned
    # fast path (aprilsam.c:755-772 "naffected <= 5").
    batch_time_fraction: float = 1.0 / 3.0
    small_path_max: int = 5
    # Disable for deterministic runs (differential tests): the reference's
    # wall-clock gate makes the incremental trajectory machine-dependent.
    wallclock_gate: bool = True
    # Steps by which batch-fallback policy decisions may lag (async stats
    # readback).  0 = fully synchronous reference semantics; > 0 overlaps the
    # host<->device round trip with compute (the wall-clock gate is then
    # inactive, as there is no per-step device sync to time).
    policy_lag: int = 0
    # In lagged mode, materialize (device->host) policy stats only once per
    # this many due entries.  The counters are cumulative on device
    # (start_over monotone since last batch, spd AND-accumulated), so reading
    # only the newest due entry is exact — older entries are dropped without
    # a transfer.  Raising this amortizes the d2h round trip (which costs
    # ~1 ms through the TPU relay) at the price of up to
    # policy_poll * bundle_size extra steps of decision lag.
    policy_poll: int = 1
    # Consecutive same-shaped incremental steps dispatched as ONE device call
    # (lax.scan bundle).  1 = off.  Bundling adds up to bundle_size extra
    # steps of policy lag; per-step chi2 logging is unaffected.  Full-path
    # bundles use the smaller bundle_size_full (dead padding slots still pay
    # the panel sweep).
    bundle_size: int = 1
    bundle_size_full: int = 4
    # Mixed bundles: fast and full steps share ONE executable (per-slot
    # lax.switch over fast@16 / full@16 / full@64 / full@256), so the queue
    # no longer flushes on every path flip — the M3500 mix alternates
    # densely and signature-homogeneous bundles fragment into mostly 1-2
    # slot dispatches.  Plans that do not fit the mixed layout (affected
    # set > 256, fringe > 32 on a fast step, pattern rows wider than
    # ridx_pack_capacity) fall back to the legacy per-signature dispatch.
    mixed_bundles: bool = True
    # Coalesce the full-path whole-graph back-substitution to ONCE per
    # mixed bundle: full slots still run their frontal update and the
    # EXACT affected-set solve (F is ancestor-closed), but the sweep that
    # refreshes non-affected nodes — the dominant full-step device cost,
    # ~2.7 ms of serialized pattern gathers — runs at bundle granularity.
    # Off by default: per-step semantics then match the reference
    # trajectory exactly (golden tests); benchmarks turn it on, accepting
    # up to bundle_size steps of staleness on non-affected nodes (the
    # final chi2 band is the guard, as with policy_lag).
    coalesce_full_solves: bool = False
    # Supersteps: buffer this many incremental steps and dispatch them as
    # ONE joint frontal update on the union affected set followed by one
    # whole-graph sweep.  1 = off (per-step reference semantics).  B
    # sequential frontal QR updates with fixed linearization points compose
    # exactly into the joint update (R'^T R' = R^T R + sum J^T W J either
    # way); the one drift is that within-bundle odometry seeds compose from
    # pre-bundle states (see the superstep section in incremental.py).
    # Replaces mixed bundles entirely when > 1: one dispatch, one h2d
    # payload, and one host planning pass per bundle instead of per step.
    superstep_size: int = 1
    # Windowed sweep (the reference's pruned tree-gated descent,
    # aprilsam.c:721-779, at panel granularity): 0 = off (every superstep
    # sweeps the whole graph — O(N) per superstep).  > 0 = panel-window
    # capacity PW: the sweep refreshes only the panels containing the
    # union front + fringe (exact for affected nodes, since fronts are
    # ancestor-closed and R rows reference only etree ancestors), falling
    # back to a full sweep when the window overflows PW or every
    # sweep_full_every-th superstep (staleness re-sync; 0 = never).
    # This makes the incremental step cost N-independent — the large-N
    # (20k/100k-pose) throughput mode.
    sweep_window_panels: int = 0
    sweep_full_every: int = 8
    # Sweep cadence across supersteps: 1 = every superstep ends with a
    # sweep (reference-shaped semantics).  K > 1 = only every K-th
    # superstep sweeps; the others run the joint frontal update alone
    # (states of the union front + fringe still update exactly in-kernel,
    # so within-bundle odometry seeding is unaffected — only non-front
    # state refresh and its relinearization counting are deferred).
    # flush() clears any residual staleness with one standalone sweep.
    sweep_every_supersteps: int = 1
    # Affected-set buckets for the union front (None = a finer ladder than
    # frontal_buckets: M3500 unions of 32 steps average m~152 and max ~343,
    # so intermediate buckets keep the joint QR and the front tables sized
    # to the work).  Unions exceeding the largest bucket trigger the batch
    # fallback.
    superstep_buckets: tuple = None

    @property
    def effective_superstep_buckets(self) -> tuple:
        if self.superstep_buckets is not None:
            return self.superstep_buckets
        return (64, 128, 256, 384, 1024)

    # Pattern-row columns packed per affected row in bundle uploads (rows
    # are padded back to row_block_capacity with sentinels on device).
    # None = row_block_capacity: every plan fits the mixed layout.  The
    # round-3 replay showed mid-epoch incremental fill grows rows well past
    # the fresh-epoch max (48 on M3500), and each plan that misses the
    # packed width falls back to a legacy signature whose first dispatch
    # costs a 10-25 s compile — narrower packing is not worth that.
    ridx_pack_capacity: int = None

    @property
    def effective_ridx_pack(self) -> int:
        if self.ridx_pack_capacity is None:
            return self.row_block_capacity
        return self.ridx_pack_capacity

    # Fill-reducing ordering style: "md" = exact minimum degree with lazy
    # re-evaluation (newest-last; better fill); "heapmd" = the reference's
    # bucketed heap scheme with the +rowi recency bias
    # (heap_minimum_degree_ordering, aprilsam.c:989-1249) for
    # exact-ordering parity runs — the per-step trajectory then tracks the
    # C reference's elimination choices, not just its optimum.
    ordering: str = "md"

    # --- numerics ---
    dtype: np.dtype = np.float64   # float32 on TPU for speed, float64 for parity tests
    # Gauss-Newton iterations per batch epoch.  None => 1 (exact one-step
    # parity with the reference).  Historically float32 defaulted to 2, but
    # with Jacobi equilibration the f32 device epoch matches the f64 host
    # epoch to ~5 significant digits in one iteration (measured on M3500
    # prefixes: chi2 35.9070 f32/gn1 vs 35.9069 f64 at 2000 poses), and the
    # second iteration doubled the dominant dense-Cholesky cost per epoch.
    gn_iters: int = None
    # Batch epoch backend: "host" = native C float64 (exact reference
    # semantics; default when built), "device" = jitted dense path,
    # "auto" picks host when the native module is available.
    batch_backend: str = "auto"
    check_spd: bool = True         # trigger batch fallback on non-SPD frontal
                                   # (fixes the reference's ignored is_spd flag,
                                   # smatd.c:669-699)
    # Per-step chi2 logging into the device metric ring.  The reference
    # computes chi2 OUTSIDE its step timer (aprilsam_demo.c:101-115, 229), so
    # benchmark replays disable this (the full-table chi2 reduction costs
    # ~0.6 ms/step on TPU) and read chi2 once at the end; parity runs keep it.
    log_chi2: bool = True

    # --- capacities (static shapes; grow => recompile) ---
    node_capacity: int = 4096      # max nodes before reallocation
    factor_capacity: int = 8192    # max factors
    row_block_capacity: int = 96   # max 3x3 blocks per R row (fill headroom)
    new_factor_capacity: int = 16  # max new factors per incremental step
    frontal_buckets: tuple = (16, 64, 256, 1024)  # padded affected-set sizes
    panel_nodes: int = 128         # nodes per triangular-solve panel (384 scalars)
    # Capacity of the device-side per-step chi2 ring.  None => 2x
    # node_capacity (every replay step logs once, plus batch epochs, so steps
    # stay comfortably below 2N).  Overflow raises in chi2_history() instead
    # of silently clobbering the last slot.
    metric_log_capacity: int = None

    @property
    def effective_log_capacity(self) -> int:
        if self.metric_log_capacity is not None:
            return self.metric_log_capacity
        return 2 * self.node_capacity

    show_timing: bool = False

    @property
    def jnp_dtype(self):
        return np.dtype(self.dtype)

    @property
    def effective_gn_iters(self) -> int:
        if self.gn_iters is not None:
            return self.gn_iters
        return 1
