"""Batch Gauss-Newton + Cholesky solve.

TPU-native re-design of april_graph_cholesky (reference: aprilsam.c:87-375):

  host:  symbolic adjacency -> constrained min-degree ordering -> block
         symbolic factorization (patterns + etree)        [this module + symbolic.py]
  device (one fused jit): relinearize all nodes -> batched factor eval ->
         block scatter-add assembly of A,B -> +tikhonov -> dense (bucketed)
         Cholesky -> forward solve (keep y, as the reference keeps param->y,
         aprilsam.c:293-298) -> back substitution -> update all states ->
         extract the block-sparse R rows on the symbolic pattern.

The device numeric path factors a dense bucketed matrix (exact,
pattern-agnostic) and gathers R's structural blocks out of it; the default
batch backend for small problems is the native float64 host epoch
(host_batch.py / native/sam_native.c), where the ~10 MFLOP factorization is
cheaper than device dispatch.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..graph import FactorGraph
from ..kernels.assembly import assemble_block_dense
from .config import SolverConfig
from .state import DeviceState, init_device_state, state_chi2
from . import symbolic as sym_mod
from .symbolic import SymbolicState


def node_bucket(n: int, cap: int) -> int:
    b = 256
    while b < n:
        b *= 2
    return min(b, cap) if b <= cap else cap


def _ext_bucket(k: int) -> int:
    b = 1024
    while b < k:
        b *= 2
    return b


def symb_half(NCAP: int) -> bool:
    """Whether the epoch's symbolic upload packs as int16 pairs (all packed
    values — positions, slots, nnz — are bounded by NCAP/BCAP).  Requires
    every packed segment length to be even (symb_layout's n // w would
    silently truncate an odd segment; pack_symb's .view would then raise)."""
    return NCAP <= 32766 and NCAP % 2 == 0


def symb_layout(NCAP: int, BCAP: int, KEXT: int):
    """Word offsets of the single packed int32 symbolic-upload vector.

    One merged buffer instead of eight arrays: through the relay each h2d
    transfer costs ~2-3 ms of latency, and int16 pair-packing halves the
    ~2 MB/epoch payload whenever node_capacity fits int16."""
    w = 2 if symb_half(NCAP) else 1
    sizes = (("R_idx", NCAP * BCAP), ("R_nnz", NCAP), ("pos", NCAP),
             ("order", NCAP), ("ext_p", KEXT), ("ext_slot", KEXT),
             ("ext_c", KEXT))
    off = {}
    o = 0
    for name, n in sizes:
        off[name] = (o, o + n // w, n)
        o += n // w
    off["scalars"] = (o, o + 2, 2)   # [k_live, log_mode], always int32
    return off, o + 2


def pack_symb(NCAP, BCAP, KEXT, R_idx_new, R_nnz_new, pos_new, order_new,
              ext_p, ext_slot, ext_c, k_live: int, log_mode: int) -> np.ndarray:
    off, L = symb_layout(NCAP, BCAP, KEXT)
    out = np.empty(L, dtype=np.int32)
    half = symb_half(NCAP)

    def put(name, arr):
        lo, hi, _ = off[name]
        a = np.ascontiguousarray(arr, dtype=np.int32).reshape(-1)
        if half:
            a = a.astype(np.int16).view(np.int32)
        out[lo:hi] = a

    put("R_idx", R_idx_new)
    put("R_nnz", R_nnz_new)
    put("pos", pos_new)
    put("order", order_new)
    put("ext_p", ext_p)
    put("ext_slot", ext_slot)
    put("ext_c", ext_c)
    lo, hi, _ = off["scalars"]
    out[lo:hi] = (k_live, log_mode)
    return out


@partial(jax.jit, static_argnames=("MB", "KEXT", "gn_iters"),
         donate_argnames=("ds",))
def _batch_step(
    ds: DeviceState,
    symb,           # packed int32 symbolic vector (symb_layout/pack_symb)
    tikhonov,
    MB: int,
    KEXT: int,
    gn_iters: int,
):
    NCAP = ds.state.shape[0]
    BCAP = ds.R_idx.shape[1]
    dtype = ds.R_blocks.dtype
    FCAP = ds.xyt_a.shape[0]
    FPOS = ds.pos_node.shape[0]

    off, _L = symb_layout(NCAP, BCAP, KEXT)
    half = symb_half(NCAP)

    def dec(name):
        lo, hi, n = off[name]
        seg = symb[lo:hi]
        if half:
            seg = jax.lax.bitcast_convert_type(seg, jnp.int16).astype(
                jnp.int32).reshape(n)
        return seg

    R_idx_new = dec("R_idx").reshape(NCAP, BCAP)
    R_nnz_new = dec("R_nnz")
    pos_new = dec("pos")
    order_new = dec("order")
    ext_p = dec("ext_p")
    ext_slot = dec("ext_slot")
    ext_c = dec("ext_c")
    sc_lo = off["scalars"][0]
    k_live = symb[sc_lo]
    log_mode = symb[sc_lo + 1]
    ext_valid = jnp.arange(KEXT, dtype=jnp.int32) < k_live

    xyt_valid = jnp.arange(FCAP, dtype=jnp.int32) < ds.n_xyt
    pos_valid = jnp.arange(FPOS, dtype=jnp.int32) < ds.n_pos
    node_ids = jnp.arange(NCAP, dtype=jnp.int32)
    valid_node = node_ids < ds.nnodes
    p_of_node = jnp.where(valid_node, pos_new, 0)

    from ..geometry import mod2pi

    state = ds.state
    # gn_iters > 1 re-relinearizes and re-solves: in float32 the extra
    # Gauss-Newton iteration recovers what the reduced-precision linear
    # solve loses (GN is self-correcting); float64 runs use 1 iteration for
    # exact one-step parity with the reference.
    for it in range(gn_iters):
        # relinearize all nodes: l_point <- state (aprilsam.c:131-135)
        l_point = state

        A, B = assemble_block_dense(
            l_point, state, pos_new,
            jnp.where(xyt_valid, ds.xyt_a, 0), jnp.where(xyt_valid, ds.xyt_b, 0),
            ds.xyt_z, ds.xyt_W, xyt_valid,
            jnp.where(pos_valid, ds.pos_node, 0), ds.pos_z, ds.pos_W, pos_valid,
            MB=MB,
            tikhonov=tikhonov,
            dtype=dtype,
        )

        # Jacobi equilibration: factor D^-1/2 A D^-1/2 (unit diagonal) for
        # float32 robustness, then unscale so the stored factor satisfies
        # L L^T = A exactly
        dvec = jax.lax.rsqrt(jnp.maximum(jnp.diagonal(A), 1e-30))
        As = A * dvec[:, None] * dvec[None, :]
        Ls = jnp.linalg.cholesky(As)
        L = Ls * (1.0 / dvec)[:, None]
        # y: forward solve L y = B; x: back solve L^T x = y
        # (smatd_chol_solve_full, smatd.c:1100-1114)
        y = jax.scipy.linalg.solve_triangular(Ls, dvec * B, lower=True)
        x = dvec * jax.scipy.linalg.solve_triangular(Ls.T, y, lower=False)

        # scatter dx to node space and update: state = l_point + dx, wrap
        # theta, NaN guard (xyt_node_update, april_graph_xyt.c:302-314)
        dxb = x.reshape(MB, 3)
        dx_node = jnp.where(
            valid_node[:, None], dxb[jnp.clip(p_of_node, 0, MB - 1)], 0.0)
        ok = valid_node & ~jnp.any(jnp.isnan(dx_node), axis=1)
        new_state = jnp.where(ok[:, None], l_point + dx_node, state)
        new_state = new_state.at[:, 2].set(
            jnp.where(ok, mod2pi(new_state[:, 2]), new_state[:, 2])
        )
        state = new_state
        new_delta = jnp.where(ok[:, None], dx_node, ds.delta_X)

    # extract block-sparse R rows on the symbolic pattern: R[p, slot] =
    # L[c-block, p-block]^T (the reference copies CSparse L columns into smatd
    # rows, aprilsam.c:237-249)
    cp = jnp.clip(ext_c, 0, MB - 1)
    pp = jnp.clip(ext_p, 0, MB - 1)
    # R[p, slot] = L[3c:3c+3, 3p:3p+3]^T as ONE windowed gather per pattern
    # entry (scalar-index gathers/scatters serialize on TPU; the windowed
    # forms measured ~5x faster at KEXT=32768)
    gidx = jnp.stack([3 * cp, 3 * pp], axis=1)
    gdn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2), collapsed_slice_dims=(),
        start_index_map=(0, 1))
    blocks = jax.lax.gather(L, gidx, gdn, slice_sizes=(3, 3))
    blocks = blocks.transpose(0, 2, 1)     # [KEXT, 3, 3]
    blocks = jnp.where(ext_valid[:, None, None], blocks, 0.0)
    BCAPd = ds.R_idx.shape[1]
    # padded rows get DISTINCT out-of-bounds destinations (NCAP + i) so the
    # unique_indices promise holds unconditionally — a shared sentinel would
    # make the scatter implementation-defined under XLA's contract even
    # though FILL_OR_DROP drops every padded entry in practice
    dest_p = jnp.where(ext_valid, ext_p,
                       NCAP + jnp.arange(KEXT, dtype=jnp.int32))
    dest_s = jnp.where(ext_valid, ext_slot, BCAPd)
    sidx = jnp.stack([dest_p, dest_s], axis=1)
    sdn = jax.lax.ScatterDimensionNumbers(
        update_window_dims=(1, 2),
        inserted_window_dims=(0, 1),
        scatter_dims_to_operand_dims=(0, 1),
    )
    R_blocks = jax.lax.scatter(
        jnp.zeros_like(ds.R_blocks), sidx, blocks, sdn,
        indices_are_sorted=True, unique_indices=True,
        mode=jax.lax.GatherScatterMode.FILL_OR_DROP)

    y_full = jnp.zeros((NCAP, 3), dtype=dtype).at[:MB].set(y.reshape(MB, 3))

    # full-diagonal SPD check: any non-SPD pivot anywhere in the 3*MB
    # factorization NaNs its diagonal entry (padding rows carry tikhonov on
    # the diagonal, so they are always finite)
    spd = jnp.all(jnp.isfinite(jnp.diagonal(L)))

    ds = ds._replace(
        R_blocks=R_blocks,
        R_idx=R_idx_new,
        R_nnz=R_nnz_new,
        y=y_full,
        state=state,
        l_point=l_point,
        delta_X=new_delta,
        relinearized=jnp.zeros_like(ds.relinearized),
        pos=pos_new,
        order=order_new,
        start_over=jnp.int32(0),
        spd_ok=jnp.asarray(True),
    )
    chi2 = state_chi2(ds)
    LOG = ds.chi2_log.shape[0]
    do_log = log_mode < 2
    ptr = jnp.maximum(ds.log_ptr - (log_mode == 1), 0)  # >= LOG drops below
    ds = ds._replace(
        chi2_log=ds.chi2_log.at[jnp.where(do_log, ptr, LOG)].set(
            chi2, mode="drop"),
        log_ptr=jnp.where(do_log, ptr + 1, ds.log_ptr),
    )
    return ds, chi2, spd


class PanelFallbackError(RuntimeError):
    """Panel epoch plan exceeded its derived capacities AND the dense
    bucketed fallback would not fit device memory — the caller should use
    the float64 host epoch for this round."""


class BatchInfo(NamedTuple):
    chi2: float
    spd: bool
    n: int


def run_batch_epoch(
    ds: DeviceState,
    cfg: SolverConfig,
    nnodes: int,
    ftypes: np.ndarray,
    fnodes: np.ndarray,
    log_mode: int = 0,
    lazy: bool = False,
) -> Tuple[DeviceState, SymbolicState, BatchInfo]:
    """Full batch epoch: host symbolic phase + device numeric step.

    `ftypes`/`fnodes` are the host factor table (all valid factors), used only
    for symbolic structure.  With `lazy`, the returned BatchInfo carries
    DEVICE scalars for chi2/spd instead of synced floats — the whole epoch
    is then one more async dispatch and the pipeline never stalls on it
    (the caller's policy readbacks materialize the values later).
    """
    NCAP = cfg.node_capacity
    BCAP = cfg.row_block_capacity

    from .. import native

    if native.available():
        # native C symbolic phase (the python ordering costs ~seconds at
        # 3500 nodes; the C one ~10 ms) — numeric stays on device.  All
        # per-row work is vectorized on the padded arrays the C code
        # already returns: the former per-row python loops (pattern list
        # copies, padded re-pack, extraction-map concat) cost ~150 ms per
        # epoch at M3500 scale, 3x the device work they fed.
        from .host_batch import _adjacency_csr

        adj_ptr, adj_idx = _adjacency_csr(nnodes, ftypes, fnodes)
        order = native.order_md(nnodes, adj_ptr, adj_idx,
                                style=cfg.ordering)
        patterns, nnz, parents, _mx = native.symbolic(
            nnodes, adj_ptr, adj_idx, order, BCAP)
        pos = np.empty(nnodes, dtype=np.int32)
        pos[order] = np.arange(nnodes, dtype=np.int32)
        sym = SymbolicState(
            order=order, pos=pos,
            patterns=[],                  # materialized lazily on demand
            parents=parents.copy(),
        )
        valid = np.arange(BCAP, dtype=np.int32)[None, :] < nnz[:, None]
        # hand the padded planner mirror straight to the incremental layer
        # (sym_patterns_list materializes the python list only if asked)
        sym.pad_idx = np.full((NCAP, BCAP), NCAP, dtype=np.int32)
        sym.pad_idx[:nnodes][valid] = patterns[valid]
        sym.pad_nnz = np.zeros(NCAP, dtype=np.int32)
        sym.pad_nnz[:nnodes] = nnz
        sym.patterns_stale = True

        R_idx_np = sym.pad_idx
        R_nnz_np = sym.pad_nnz

        # ---- scatter-free panel epoch (panel_epoch.py): the default TPU
        # backend.  Falls through to the dense bucketed path when the
        # graph exceeds the derived panel capacities or gn_iters > 1.
        if cfg.batch_backend == "panel" and cfg.effective_gn_iters == 1:
            from .panel_epoch import (build_panel_plan, pack_pep,
                                      panel_epoch_step)

            plan = build_panel_plan(cfg, nnodes, sym, sym.pad_idx,
                                    sym.pad_nnz, ftypes, fnodes)
            if plan is None:
                # escalate to the roomy grade-1 caps before giving up
                plan = build_panel_plan(cfg, nnodes, sym, sym.pad_idx,
                                        sym.pad_nnz, ftypes, fnodes, grade=1)
            if plan is not None:
                bb = pack_pep(plan, NCAP, BCAP, log_mode)
                ds, chi2, spd = panel_epoch_step(
                    ds, jnp.asarray(bb),
                    jnp.asarray(cfg.tikhonov, dtype=cfg.jnp_dtype),
                    NPANB=plan.npanb, MC=plan.mc_cap, NU=plan.nu_cap,
                    MULT=plan.mult, KEXTA=plan.kexta, NFAC3=plan.nfac3,
                    PANEL=cfg.panel_nodes, BPACK=plan.bpack,
                    PMAX16=plan.pmax16)
                if lazy:
                    return ds, sym, BatchInfo(chi2=chi2, spd=spd, n=nnodes)
                return ds, sym, BatchInfo(chi2=float(chi2), spd=bool(spd),
                                          n=nnodes)
            if 3 * node_bucket(nnodes, NCAP) > 16384:
                # dense [3MB, 3MB] would exceed ~10 GB f32
                raise PanelFallbackError(
                    f"panel plan overflow at n={nnodes}; dense infeasible")

        ext_p, ext_slot = np.nonzero(valid)
        ext_p = ext_p.astype(np.int32)
        ext_slot = ext_slot.astype(np.int32)
        ext_c = patterns[valid].astype(np.int32)
    else:
        adj = sym_mod.build_adjacency(nnodes, ftypes, fnodes)
        order = sym_mod.min_degree_ordering(nnodes, adj)
        sym = sym_mod.build_symbolic(nnodes, adj, order)

        R_idx_np, R_nnz_np = sym_mod.padded_pattern_arrays(
            sym, NCAP, BCAP, NCAP)

        # flat extraction map over all pattern entries
        ps, slots, cs = [], [], []
        for p, pat in enumerate(sym.patterns):
            ps.append(np.full(len(pat), p, dtype=np.int32))
            slots.append(np.arange(len(pat), dtype=np.int32))
            cs.append(pat)
        if ps:
            ext_p = np.concatenate(ps)
            ext_slot = np.concatenate(slots)
            ext_c = np.concatenate(cs)
        else:
            ext_p = ext_slot = ext_c = np.zeros(0, dtype=np.int32)
    K = ext_p.shape[0]
    # KEXT rides with the node bucket (mean R-row nnz is ~6.5 on SLAM
    # graphs, so 8*MB covers it) — one (MB, KEXT) specialization per node
    # doubling keeps the compile ladder predictable/precompilable
    MB_for_K = node_bucket(nnodes, NCAP)
    KEXT = max(_ext_bucket(K), 8 * MB_for_K)
    pad = KEXT - K
    ext_p = np.pad(ext_p, (0, pad))
    ext_slot = np.pad(ext_slot, (0, pad))
    ext_c = np.pad(ext_c, (0, pad))

    pos_full = np.arange(NCAP, dtype=np.int32)
    pos_full[: nnodes] = sym.pos
    order_full = np.arange(NCAP, dtype=np.int32)
    order_full[: nnodes] = sym.order

    MB = node_bucket(nnodes, NCAP)

    symb = pack_symb(NCAP, BCAP, KEXT, R_idx_np, R_nnz_np, pos_full,
                     order_full, ext_p, ext_slot, ext_c, K, log_mode)
    ds, chi2, spd = _batch_step(
        ds,
        jnp.asarray(symb),
        jnp.asarray(cfg.tikhonov, dtype=cfg.jnp_dtype),
        MB=MB,
        KEXT=KEXT,
        gn_iters=cfg.effective_gn_iters,
    )
    if lazy:
        return ds, sym, BatchInfo(chi2=chi2, spd=spd, n=nnodes)
    return ds, sym, BatchInfo(chi2=float(chi2), spd=bool(spd), n=nnodes)


def precompile_device_batch(ds: DeviceState, cfg: SolverConfig,
                            nnodes_max: int) -> Tuple[DeviceState, int]:
    """Compile the (MB, KEXT) device-epoch ladder a replay of nnodes_max
    poses crosses, with dead inputs on a throwaway state (mid-run compiles
    through the relay's compile server cost 10-25 s each)."""
    NCAP = cfg.node_capacity
    BCAP = cfg.row_block_capacity
    count = 0
    mb = 256
    while True:
        mb = min(mb, NCAP)
        MB = mb
        KEXT = 8 * MB
        symb = pack_symb(
            NCAP, BCAP, KEXT,
            np.full((NCAP, BCAP), NCAP, dtype=np.int32),
            np.zeros(NCAP, dtype=np.int32),
            np.arange(NCAP, dtype=np.int32),
            np.arange(NCAP, dtype=np.int32),
            np.zeros(KEXT, dtype=np.int32),
            np.zeros(KEXT, dtype=np.int32),
            np.zeros(KEXT, dtype=np.int32),
            0, 2)
        ds, _, _ = _batch_step(
            ds,
            jnp.asarray(symb),
            jnp.asarray(cfg.tikhonov, dtype=cfg.jnp_dtype),
            MB=MB, KEXT=KEXT, gn_iters=cfg.effective_gn_iters,
        )
        count += 1
        if mb >= min(node_bucket(nnodes_max, NCAP), NCAP):
            break
        mb *= 2
    # The dead ladder epochs are real device work (a dense chol per MB);
    # finish them INSIDE warmup — left in flight they drain into the first
    # timed replay step (measured ~5 s at step 1)
    jax.block_until_ready(ds.state)
    return ds, count


class BatchSolver:
    """One-shot batch Gauss-Newton solver over a FactorGraph — the
    counterpart of calling april_graph_cholesky directly (batch-only mode,
    examples/aprilsam_demo.c:224-228)."""

    def __init__(self, cfg: Optional[SolverConfig] = None):
        from ..utils import setup_precision

        setup_precision()
        self.cfg = cfg or SolverConfig()
        self.ds = init_device_state(self.cfg)
        self.sym: Optional[SymbolicState] = None
        self._ingested_nodes = 0
        self._ingested_factors = 0

    def _ingest(self, g: FactorGraph):
        """Copy new nodes/factors from the host graph into device tables."""
        from .ingest import ingest_graph

        self.ds = ingest_graph(
            self.ds, g, self.cfg, self._ingested_nodes, self._ingested_factors
        )
        self._ingested_nodes = g.nnodes
        self._ingested_factors = g.nfactors

    def _use_host(self) -> bool:
        if self.cfg.batch_backend == "host":
            return True
        if self.cfg.batch_backend in ("device", "panel"):
            return False
        from .. import native

        return native.available()

    def solve(self, g: FactorGraph) -> BatchInfo:
        if g.nnodes == 0 or g.nfactors == 0:
            return BatchInfo(chi2=0.0, spd=True, n=0)  # aprilsam.c:90-91
        self._ingest(g)
        n = g.nnodes
        if self._use_host():
            from .host_batch import host_batch_epoch

            self.ds, self.sym, info = host_batch_epoch(
                self.ds, self.cfg, n, g.ftype[: g.nfactors],
                g.fnodes[: g.nfactors], g.fz[: g.nfactors], g.fW[: g.nfactors]
            )
        else:
            self.ds, self.sym, info = run_batch_epoch(
                self.ds, self.cfg, n, g.ftype[: g.nfactors],
                g.fnodes[: g.nfactors]
            )
        return info

    def chi2(self) -> float:
        return float(state_chi2(self.ds))

    def sync_states(self, g: FactorGraph) -> None:
        st = np.asarray(self.ds.state[: g.nnodes], dtype=np.float64)
        g.state[: g.nnodes] = st
        g.l_point[: g.nnodes] = np.asarray(
            self.ds.l_point[: g.nnodes], dtype=np.float64
        )
        g.delta_X[: g.nnodes] = np.asarray(
            self.ds.delta_X[: g.nnodes], dtype=np.float64
        )
