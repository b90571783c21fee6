"""Spatial domain sharding — scaling SPH past one chip.

The reference is strictly single-GPU (SURVEY.md §2.5: no MPI/NCCL, its only
parallelism is one CUDA thread per particle). This module is the TPU-native
scaling layer the survey specifies: the 10×10×10 box is split into z-slabs
across a 1-D `jax.sharding.Mesh`; each device owns the particles resident in
its slab in fixed-capacity padded arrays. Per step, under `shard_map`:

  1. **Local cell-key payload sort FIRST** — ONE stable `lax.sort` carries
     the six field rows plus a pid/ownership tag with the cell keys (the
     tuned single-chip hot path's sort). Because the flat key is z-MAJOR
     (x + C·y + C²·z, grid.py), the 2h boundary bands are CONTIGUOUS in
     sorted key space: the dn-send set is an exact prefix (keys below an
     integer cell-plane threshold) and the up-send set an exact suffix
     ending at n_valid — so the halo send buffers are SLICES of the sorted
     array, and the separate halo category sort of the earlier design
     disappears. (A row can sit in both windows when the slab is < 4h wide
     — slices express that naturally, no disjointness special case.)
  2. **Halo exchange** — each device `lax.ppermute`s the two 2h face-layer
     slices (position+velocity+valid) to the adjacent devices over ICI (the
     boundary reads the reference does freely through HBM,
     simulator.cu:163-185, become explicit neighbor collectives). The ghost
     layer is TWO smoothing radii deep so that every halo copy within h of
     the boundary sees ALL of its own neighbors locally (they live within 2h
     of the boundary) — its locally-computed density/pressure is exact, and
     no second "authoritative ρ/p" round is needed. Halo rows deeper than h
     get wrong densities but are never read: force targets are local rows
     only, and their sources lie within h of the boundary. Requires
     slab_width ≥ 2h (checked at step-build time).
  3. **Combined sorted rows** — when the slab boundaries are CELL-ALIGNED
     (C % D == 0; always true for D = 1), the lo-halo / local / hi-halo key
     ranges are strictly disjoint (live rows are always inside their slab at
     build time), so the combined array is assembled WITHOUT a second
     full-width sort: one tiny sort of the 2·halo_cap received rows plus
     three fixed-size dynamic_update_slice writes splices them around the
     local rows in global key order. Non-aligned device counts fall back to
     a full-width merge sort of local ∪ halo.
  4. **Physics, fields-native** — the fused Pallas density+force megakernels
     (with the full tuned-preset machinery — qrank prep, descriptor loops,
     streamed records, slim force layout) run per device inside `shard_map`,
     each chip on its own kernel grid. No argsort, no (N,3) gathers, no
     histogram starts table (rank prep makes it dead code).
  5. **Integration + click impulse** — local targets only, in sorted order.
  6. **Migration + compaction, ONE sort** — rows are category-sorted
     dn-migrants < kept < up-migrants < dead, so a single stable payload
     sort yields BOTH direction buffers (prefix / post-kept slice) AND the
     kept-first compacted state (the middle slice, landed at the front via
     one dynamic_slice); arrivals scatter into the free tail at n_kept.
     On steps where THIS device has no migrants at all — ~every step of the
     dam break; z-cut crossers are ~zero over the whole trajectory
     (scaling/census_*.json) — a lax.cond skips the sort entirely: in the
     aligned-splice layout the kept block is already contiguous at n_lo,
     and with zero migrants the category sort is a pure rotation, so one
     dynamic_slice reproduces its kept block bit-exactly.
     On a 1-device mesh migration is STRUCTURALLY impossible (the boundary
     clamp keeps every position inside [h, box−h] ⊂ the only slab), and the
     valid rows are already the sorted prefix — the whole phase is elided.

Per-device full-width sorts per step: 2 for cell-aligned device counts
(local key sort + migration/compaction sort; the round-4 design paid 4) —
1 on the migration-free steps above, 3 for non-aligned device counts,
1 for a single-device mesh.

All buffers are fixed-capacity with overflow *detection* (never silent drop),
matching the engine's capacity philosophy. Non-periodic edges: `ppermute`
delivers zeros to devices with no source, which arrive with valid=False.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tpusph.core.config import SimConfig, compiler_opts
from tpusph.core.state import FluidState
from tpusph.engine.step import _density_pass_sorted, _force_pass_sorted
from tpusph.interact.impulse import click_kick_fields
from tpusph.neighbors.cell_list import starts_from_sorted
from tpusph.neighbors.grid import compute_keys_fields
from tpusph.physics.integrate import integrate_fields
from tpusph.physics.kernels import pressure_from_density

try:  # jax ≥ 0.6 exposes shard_map at top level
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map  # type: ignore


@dataclasses.dataclass(frozen=True)
class DistConfig:
    """Static capacities for the sharded engine (all per-device)."""

    n_devices: int
    dev_capacity: int  # particle slots per device
    halo_capacity: int  # per-direction halo buffer rows (2h-deep layer)
    migration_capacity: int  # per-direction migration buffer rows
    axis_name: str = "z"
    # Optional BALANCE-AWARE partition: n_devices+1 ascending z cell-plane
    # indices (0 .. C) giving each device the slab [planes[d], planes[d+1])
    # in CELL space. None = equal-width slabs. Cell-plane edges make EVERY
    # device count take the aligned splice path (no full-width merge sort —
    # C % D need not divide), and letting the edges follow the measured
    # z-occupancy kills the structural load imbalance of equal-width slabs
    # (random init fills [1, box−1]: edge slabs are half-empty, λ = 1.25 at
    # D ≥ 4 — scaling/census_n2097152.json). balanced_slab_planes()
    # computes them; DistSimulator.setup applies it by default.
    slab_planes: tuple | None = None

    def validate(self) -> None:
        for f in ("dev_capacity", "halo_capacity", "migration_capacity"):
            v = getattr(self, f)
            if v <= 0 or v % 8:
                raise ValueError(f"{f} must be a positive multiple of 8, got {v}")


def _check_slab_width(cfg: SimConfig, dcfg: DistConfig) -> None:
    """The 2h ghost layer needs slabs at least 2h wide (a halo copy's
    neighborhood must close inside the adjacent device's slab; see module
    docstring). With explicit slab planes that is a ≥ 2-cell minimum gap
    (cell edge = h), plus shape/monotonicity validation."""
    if dcfg.slab_planes is not None:
        pl = tuple(int(p) for p in dcfg.slab_planes)
        C, D = cfg.num_cells_per_dim, dcfg.n_devices
        if len(pl) != D + 1 or pl[0] != 0 or pl[-1] != C:
            raise ValueError(
                f"slab_planes must be {D + 1} cell planes spanning [0, {C}],"
                f" got {pl}"
            )
        gaps = [b - a for a, b in zip(pl, pl[1:])]
        if min(gaps) < 2:
            raise ValueError(
                f"slab_planes gaps {gaps}: every slab needs ≥ 2 cells (2h "
                "ghost layer)"
            )
        return
    if cfg.box_dim / dcfg.n_devices < 2 * cfg.h:
        raise ValueError(
            f"slab width {cfg.box_dim / dcfg.n_devices:.4f} < 2h = "
            f"{2 * cfg.h:.4f}: at most "
            f"{int(cfg.box_dim // (2 * cfg.h))} z-slab devices for this scene"
        )


class DistState(NamedTuple):
    """Globally-sharded particle state: arrays are [D·dev_capacity, ...]
    sharded on the leading axis; `pid` preserves global particle identity
    across migrations (for output ordering and testing)."""

    position: jnp.ndarray  # f32[D·C, 3]
    velocity: jnp.ndarray  # f32[D·C, 3]
    valid: jnp.ndarray  # bool[D·C]
    pid: jnp.ndarray  # int32[D·C]


class DistAux(NamedTuple):
    halo_overflow: jnp.ndarray
    migration_overflow: jnp.ndarray
    window_overflow: jnp.ndarray
    oob_count: jnp.ndarray
    misrouted: jnp.ndarray
    num_particles: jnp.ndarray  # global census (conservation check)
    # utilization stats (pmax over devices; max over a scan chain) — the
    # measured inputs DistSimulator.right_size uses to shrink the static
    # slack-sized capacities to what the run actually needs
    max_dev_particles: jnp.ndarray  # peak per-device occupancy
    max_halo_send: jnp.ndarray  # peak per-direction halo rows
    max_migration_send: jnp.ndarray  # peak per-direction migration rows


def _compact(mask: jnp.ndarray, fields: tuple, cap: int):
    """Pack rows where mask is True into the first `cap` rows (stable).
    Returns (packed_fields, packed_valid, take_indices, overflow)."""
    order = jnp.argsort(~mask, stable=True).astype(jnp.int32)
    take = order[:cap]
    packed = tuple(f[take] for f in fields)
    pvalid = mask[take]
    overflow = jnp.maximum(jnp.sum(mask) - cap, 0).astype(jnp.int32)
    return packed, pvalid, take, overflow

def _compute_sorted_fields(
    key_s, sx, sy, sz, svx, svy, svz, cfg: SimConfig, use_pallas: bool,
    interpret: bool,
):
    """Fields-native density+force over cell-sorted rows — the tuned
    single-chip hot path (qrank prep → fused megakernels, with every tuned
    preset flag engaging via cfg) running per device. Returns
    (rho_s, p_s, (fx, fy, fz), valid_s, window_overflow)."""
    valid_s = key_s < cfg.num_cells
    # dead in the production Pallas step when pallas_rank_prep is on (the
    # prep resolves every lookup by rank; XLA DCEs the histogram) — live
    # only for the XLA tile fallback. key_s works for the histogram too
    # (same key multiset as the unsorted keys).
    starts, s_ovf = starts_from_sorted(key_s, key_s, cfg, interpret)
    if use_pallas:
        from tpusph.pallas.fused import (
            density_pallas,
            force_pallas,
            supertile_columns,
        )

        cols_info = supertile_columns(key_s, valid_s, starts, cfg, interpret)
        raw = density_pallas(
            (sx, sy, sz), key_s, cols_info, cfg, interpret=interpret
        )
        rho_s, p_s = pressure_from_density(raw, cfg)
        rho_s = jnp.where(valid_s, rho_s, 1.0)
        p_s = jnp.where(valid_s, p_s, 0.0)
        f_rows = force_pallas(
            (sx, sy, sz), (svx, svy, svz), rho_s, p_s, key_s, cols_info, cfg,
            interpret=interpret,
        )
        fx = jnp.where(valid_s, f_rows[0], 0.0)
        fy = jnp.where(valid_s, f_rows[1], 0.0)
        fz = jnp.where(valid_s, f_rows[2], 0.0)
        ovf_w = cols_info.overflow + s_ovf
    else:
        sp = jnp.stack([sx, sy, sz], axis=1)
        sv = jnp.stack([svx, svy, svz], axis=1)
        rho_s, p_s, ovf = _density_pass_sorted(sp, key_s, valid_s, starts, cfg)
        f_s = _force_pass_sorted(
            sp, sv, rho_s, p_s, key_s, valid_s, starts, cfg
        )
        fx, fy, fz = f_s[:, 0], f_s[:, 1], f_s[:, 2]
        ovf_w = ovf + s_ovf
    return rho_s, p_s, (fx, fy, fz), valid_s, ovf_w


def _slab_geometry(cfg: SimConfig, dcfg: DistConfig):
    """(z_lo, z_hi, slab_w, pshift) for this device's slab. With explicit
    slab planes the float bounds are plane·h (informational — the migration
    predicates then run in CELL space, _migration_predicates)."""
    d_count = dcfg.n_devices
    d = lax.axis_index(dcfg.axis_name)
    if dcfg.slab_planes is not None:
        pl = jnp.asarray(dcfg.slab_planes, jnp.float32) * jnp.float32(cfg.h)
        z_lo = pl[d]
        z_hi = pl[d + 1]
        slab_w = z_hi - z_lo
    else:
        slab_w = jnp.float32(cfg.box_dim) / d_count
        z_lo = d.astype(jnp.float32) * slab_w
        z_hi = z_lo + slab_w

    perm_up = [(i, i + 1) for i in range(d_count - 1)]  # data flows d → d+1
    perm_dn = [(i + 1, i) for i in range(d_count - 1)]  # data flows d → d−1

    def pshift(x, up: bool):
        perm = perm_up if up else perm_dn
        if not perm:  # single device: nothing to exchange
            return jnp.zeros_like(x)
        return lax.ppermute(x, dcfg.axis_name, perm)

    return z_lo, z_hi, slab_w, pshift


def _force_migsort() -> bool:
    """TPUSPH_DIST_FORCE_MIGSORT=1 statically disables the migration-free
    sort skip in _device_update, so the full-machinery diagnostic can price
    the category sort itself — the worst-case per-step tax on a workload
    that migrates every step (scripts/scaling_model.py uses both numbers)."""
    import os

    return os.environ.get("TPUSPH_DIST_FORCE_MIGSORT") == "1"


def _elide_single(dcfg: DistConfig) -> bool:
    """A 1-device mesh has no slab faces: halo and migration are
    structurally absent and normally elided. TPUSPH_DIST_FULL_MACHINERY=1
    keeps the full multi-device code path (dead halo buffers, the
    migration/compaction sort) so a 1-chip host can measure the per-device
    overhead a middle device of a real mesh would pay (minus ppermute
    latency) — a benchmark-honesty knob, not a production mode."""
    import os

    return (
        dcfg.n_devices == 1
        and os.environ.get("TPUSPH_DIST_FULL_MACHINERY") != "1"
    )


def _aligned(cfg: SimConfig, dcfg: DistConfig) -> bool:
    """Static: slab faces land on cell-plane edges, so the lo-halo / local /
    hi-halo key ranges are strictly disjoint and the combined array can be
    spliced instead of re-sorted (module docstring §3). True for explicit
    slab planes (cell planes by construction — ANY device count) or when
    C % D == 0 divides equal-width slabs onto planes. The splice also
    needs c_dev ≥ 2·h_cap so the local write covers the halo scratch."""
    return (
        dcfg.slab_planes is not None
        or cfg.num_cells_per_dim % dcfg.n_devices == 0
    ) and dcfg.dev_capacity >= 2 * dcfg.halo_capacity


def _plane_array(cfg: SimConfig, dcfg: DistConfig) -> jnp.ndarray:
    """int32[D+1] z cell-plane slab edges. Only meaningful when the
    partition is cell-aligned (_aligned or explicit planes)."""
    if dcfg.slab_planes is not None:
        return jnp.asarray(dcfg.slab_planes, jnp.int32)
    C, D = cfg.num_cells_per_dim, dcfg.n_devices
    return jnp.arange(D + 1, dtype=jnp.int32) * (C // D)


def _band_thresholds(cfg: SimConfig, dcfg: DistConfig):
    """Integer z-cell-plane thresholds of the 2h send bands, computed in
    exact integer arithmetic from the device index: dn band = zcell <
    thr_dn, up band = zcell ≥ thr_up. Supersets of the float bands
    (z < z_lo + 2h / z ≥ z_hi − 2h); exact when slabs are cell-aligned
    (explicit planes always are). Because the flat key is z-major,
    `key < thr_dn·C²` / `key ≥ thr_up·C²` select CONTIGUOUS runs of the
    key-sorted rows."""
    C = cfg.num_cells_per_dim
    D = dcfg.n_devices
    d = lax.axis_index(dcfg.axis_name)
    if dcfg.slab_planes is not None:
        pl = _plane_array(cfg, dcfg)
        thr_dn = pl[d] + 2
        thr_up = pl[d + 1] - 2
    else:
        thr_dn = (d * C + D - 1) // D + 2  # ceil(d·C/D) + 2
        thr_up = ((d + 1) * C) // D - 2  # floor((d+1)·C/D) − 2
    return thr_dn * C * C, thr_up * C * C


def _migration_predicates(nz, live, cfg: SimConfig, dcfg: DistConfig,
                          z_lo, z_hi, slab_w):
    """(mig_dn, mig_up, misrouted_mask) for post-integration z. With
    explicit slab planes, ownership is decided in CELL space — the exact
    truncation the next build's keys use (grid.cell_coords), so migration,
    distribute_state and the splice invariant can never disagree at a float
    slab face. Equal-width slabs keep the float comparison (their faces are
    not exactly representable; the historical semantics)."""
    if dcfg.slab_planes is not None:
        C, D = cfg.num_cells_per_dim, dcfg.n_devices
        pl = _plane_array(cfg, dcfg)
        d = lax.axis_index(dcfg.axis_name)
        zc = jnp.clip(
            (nz / jnp.float32(cfg.h)).astype(jnp.int32), 0, C - 1
        )
        mig_dn = live & (zc < pl[d])
        mig_up = live & (zc >= pl[d + 1])
        # one-hop bound: beyond the ADJACENT slab (exact neighbor widths)
        far_lo = pl[jnp.maximum(d - 1, 0)]
        far_hi = pl[jnp.minimum(d + 2, D)]
        mis = live & ((zc < far_lo) | (zc >= far_hi))
        return mig_dn, mig_up, mis
    mig_dn = live & (nz < z_lo)
    mig_up = live & (nz >= z_hi)
    mis = live & ((nz < z_lo - slab_w) | (nz >= z_hi + slab_w))
    return mig_dn, mig_up, mis


def _device_build(pos, vel, valid, pid, cfg: SimConfig, dcfg: DistConfig):
    """Phase 1 on one device's slab: local cell-key payload sort, 2h halo
    slice exchange, and combined-row assembly — the sharded "grid
    construction" phase (the reference's timed kernelBuildGrid bracket,
    simulator.cu:505-513, plus the boundary collective that replaces its
    free HBM reads). Returns the sorted comb rows + per-device
    (halo_overflow, oob_count, max_halo_send) scalars (not yet reduced)."""
    c_dev = dcfg.dev_capacity
    h_cap = dcfg.halo_capacity
    D = dcfg.n_devices

    # ---- fields-native rows; stale/invalid slots parked at the origin:
    # the Pallas key mask can coincidentally match sentinel-keyed rows, and
    # only the ≥0.17 gap from any clamped-valid position makes them
    # physically inert
    x, y, z = pos[:, 0], pos[:, 1], pos[:, 2]
    vx, vy, vz = vel[:, 0], vel[:, 1], vel[:, 2]
    x = jnp.where(valid, x, 0.0)
    y = jnp.where(valid, y, 0.0)
    z = jnp.where(valid, z, 0.0)
    # ownership tag travels with the sort: local valid rows carry their pid
    # (≥ 0), local invalid slots −1, halo copies −2 — `tag ≥ 0` is the
    # "live local" mask in sorted space
    tag = jnp.where(valid, pid, jnp.int32(-1))
    key, oob_count = compute_keys_fields(x, y, z, valid, cfg)
    key_l, lx, ly, lz, lvx, lvy, lvz, ltag = lax.sort(
        (key, x, y, z, vx, vy, vz, tag), num_keys=1, is_stable=True
    )
    zero = jnp.int32(0)
    if _elide_single(dcfg):
        # single-device mesh: no slab faces exist, so there is no halo
        # layer — the combined rows ARE the local sorted rows
        return (key_l, lx, ly, lz, lvx, lvy, lvz, ltag, zero, oob_count,
                zero)

    # ---- halo send windows: SLICES of the key-sorted rows (module
    # docstring §1). dn band = prefix of length n_dn; up band = the last
    # n_up valid rows, shipped as the fixed h_cap window ending at n_valid
    # (front-padded so the dynamic_slice never clamps; non-band lanes
    # arrive masked invalid and are parked by the receiver).
    k_dn, k_up = _band_thresholds(cfg, dcfg)
    sentinel = jnp.int32(cfg.num_cells)
    n_valid = jnp.sum(valid).astype(jnp.int32)
    n_dn = jnp.sum(key_l < k_dn).astype(jnp.int32)
    n_up = jnp.sum((key_l >= k_up) & (key_l < sentinel)).astype(jnp.int32)
    halo_ovf = jnp.maximum(n_dn - h_cap, 0) + jnp.maximum(n_up - h_cap, 0)
    lane = jnp.arange(h_cap, dtype=jnp.int32)
    lrows = (lx, ly, lz, lvx, lvy, lvz)
    dn6 = jnp.stack([r[:h_cap] for r in lrows], axis=1)
    dn_valid = lane < jnp.minimum(n_dn, n_valid)
    pad = jnp.zeros((h_cap,), jnp.float32)
    up6 = jnp.stack(
        [
            lax.dynamic_slice(
                jnp.concatenate([pad, r]), (n_valid,), (h_cap,)
            )
            for r in lrows
        ],
        axis=1,
    )
    up_valid = lane >= (h_cap - n_up)

    # ---- exchange (the one collective round of the 2h ghost layer)
    _z_lo, _z_hi, _slab_w, pshift = _slab_geometry(cfg, dcfg)
    lo6 = pshift(up6, True)  # halo from the device below
    lo_valid = pshift(up_valid, True)
    hi6 = pshift(dn6, False)  # halo from the device above
    hi_valid = pshift(dn_valid, False)

    # ---- received halo rows: park invalid lanes, compute their keys
    h_valid = jnp.concatenate([lo_valid, hi_valid])
    hrows = [
        jnp.where(h_valid, jnp.concatenate([lo6[:, j], hi6[:, j]]), 0.0)
        for j in range(6)
    ]
    hkey, _h_oob = compute_keys_fields(
        hrows[0], hrows[1], hrows[2], h_valid, cfg
    )

    if _aligned(cfg, dcfg):
        # ---- SPLICE assembly (module docstring §3): live rows are always
        # inside their slab at build time, so aligned slabs make the lo /
        # local / hi key ranges strictly disjoint: sort just the 2·h_cap
        # halo rows, then splice [lo_real | local | hi_real+dead | dead]
        # with three fixed-size writes — no full-width merge sort.
        hk_s, h0, h1, h2, h3, h4, h5 = lax.sort(
            (hkey, *hrows), num_keys=1, is_stable=True
        )
        n_lo = jnp.sum(lo_valid).astype(jnp.int32)
        htag = jnp.full((2 * h_cap,), -2, jnp.int32)

        def splice(h_lane, local_lane, dead_val):
            dead = jnp.full((c_dev,), dead_val, h_lane.dtype)
            out = jnp.concatenate([h_lane, dead])
            out = lax.dynamic_update_slice(out, local_lane, (n_lo,))
            hh = lax.dynamic_slice(h_lane, (n_lo,), (h_cap,))
            return lax.dynamic_update_slice(out, hh, (n_lo + n_valid,))

        key_s = splice(hk_s, key_l, cfg.num_cells)
        sx = splice(h0, lx, 0.0)
        sy = splice(h1, ly, 0.0)
        sz = splice(h2, lz, 0.0)
        svx = splice(h3, lvx, 0.0)
        svy = splice(h4, lvy, 0.0)
        svz = splice(h5, lvz, 0.0)
        tag_s = splice(htag, ltag, -2)
    else:
        # ---- general assembly: full-width merge sort of local ∪ halo
        comb_key = jnp.concatenate([key_l, hkey])
        comb = [jnp.concatenate([lr, hr]) for lr, hr in zip(lrows, hrows)]
        tag_c = jnp.concatenate(
            [ltag, jnp.full((2 * h_cap,), -2, jnp.int32)]
        )
        key_s, sx, sy, sz, svx, svy, svz, tag_s = lax.sort(
            (comb_key, *comb, tag_c), num_keys=1, is_stable=True
        )
    return (key_s, sx, sy, sz, svx, svy, svz, tag_s, halo_ovf, oob_count,
            jnp.maximum(n_dn, n_up))


def _device_update(
    key_s, sx, sy, sz, svx, svy, svz, tag_s, click_cell, click_active,
    cfg: SimConfig, dcfg: DistConfig, use_pallas: bool, interpret: bool,
    with_click: bool = True,
):
    """Phase 2 on one device's slab: fused density/force megakernels +
    integration + click impulse + migration + state repacking (the sharded
    "SPH update" phase). Consumes _device_build's sorted rows; returns
    (x, v, valid_new, pid_new, (window_ovf, migration_ovf, misrouted,
    n_valid, max_mig_send)) with the scalars not yet reduced."""
    c_dev = dcfg.dev_capacity
    m_cap = dcfg.migration_capacity
    z_lo, z_hi, slab_w, pshift = _slab_geometry(cfg, dcfg)

    # ---- density + forces (fields-native; halo densities within h of the
    # boundary are exact thanks to the 2h layer — no second exchange round)
    rho_s, p_s, (fx, fy, fz), _valid_s, ovf_w = _compute_sorted_fields(
        key_s, sx, sy, sz, svx, svy, svz, cfg, use_pallas, interpret
    )

    # ---- integrate live local rows; freeze halo copies and padding
    live = tag_s >= 0
    nx, ny, nz, nvx, nvy, nvz = integrate_fields(
        sx, sy, sz, svx, svy, svz, fx, fy, fz, rho_s, cfg
    )
    nx = jnp.where(live, nx, sx)
    ny = jnp.where(live, ny, sy)
    nz = jnp.where(live, nz, sz)
    nvx = jnp.where(live, nvx, svx)
    nvy = jnp.where(live, nvy, svy)
    nvz = jnp.where(live, nvz, svz)

    # ---- 4b. click impulse (free-mode parity, simulator.cu:482-489):
    # applied after integration from PRE-step cells, exactly like the
    # single-chip engine; elementwise per particle, before migration so
    # kicked slab-crossers carry their kick to the new owner. The
    # scan-chained production run (with_click=False) skips it STATICALLY:
    # the slab-multiplicity table gather costs ~50 ns/row through this
    # stack's gather path, and XLA cannot fold `kick * 0` away (x·0 is not
    # an identity under NaN/Inf semantics).
    if with_click:
        kx, ky, kz = click_kick_fields(sx, sy, sz, live, click_cell, cfg)
        ca = click_active.astype(jnp.float32)
        nvx = nvx + kx * ca
        nvy = nvy + ky * ca
        nvz = nvz + kz * ca

    if _elide_single(dcfg):
        # ---- single-device mesh: the integrate clamp keeps every position
        # inside [h, box−h] ⊂ the only slab, so migration is STRUCTURALLY
        # impossible, and the live rows are already the sorted prefix (the
        # build sort puts sentinel-keyed invalid rows last) — no
        # migration/compaction sort at all (module docstring §6)
        x = jnp.stack([nx, ny, nz], axis=1)
        v = jnp.stack([nvx, nvy, nvz], axis=1)
        pid_new = jnp.where(live, tag_s, jnp.int32(-1))
        n_valid = jnp.sum(live).astype(jnp.int32)
        zero = jnp.int32(0)
        return x, v, live, pid_new, (ovf_w, zero, zero, n_valid, zero)

    # ---- 5+6. migration of slab-crossers (one hop) + kept-first state
    # repacking, via ONE stable category sort: dn-migrants < kept <
    # up-migrants < dead, so the sorted array IS both direction buffers
    # (prefix / post-kept slice) and the compacted state (the middle block,
    # landed at the front by one dynamic_slice). A particle cannot cross
    # both faces.
    mig_dn, mig_up, mis_mask = _migration_predicates(
        nz, live, cfg, dcfg, z_lo, z_hi, slab_w
    )
    misrouted = jnp.sum(mis_mask).astype(jnp.int32)
    kept = live & ~mig_dn & ~mig_up
    n_dn = jnp.sum(mig_dn).astype(jnp.int32)
    n_up = jnp.sum(mig_up).astype(jnp.int32)
    n_kept = jnp.sum(kept).astype(jnp.int32)
    ovf_mdn = jnp.maximum(n_dn - m_cap, 0)
    ovf_mup = jnp.maximum(n_up - m_cap, 0)

    cat = jnp.where(
        mig_dn, 0, jnp.where(mig_up, 2, jnp.where(kept, 1, 3))
    ).astype(jnp.int32)
    # pad the sort with m_cap dead rows so the kept/up dynamic_slices below
    # stay in bounds for ANY capacity combination whenever the overflow
    # flags are clean (n_dn ≤ m_cap ⇒ kept fits; n_dn + n_kept ≤ c_dev ⇒
    # up fits) — cheaper than constraining m_cap against h_cap
    mpad = lambda r, v: jnp.concatenate(
        [r, jnp.full((m_cap,), v, r.dtype)]
    )
    ops = (nx, ny, nz, nvx, nvy, nvz, tag_s)
    deads = (0.0, 0.0, 0.0, 0.0, 0.0, 0.0, jnp.int32(-2))

    def _mig_sort(rows):
        srt = lax.sort(
            (mpad(cat, 3),)
            + tuple(mpad(r, v) for r, v in zip(rows, deads)),
            num_keys=1, is_stable=True,
        )
        return tuple(srt[1:])

    if _aligned(cfg, dcfg) and not _force_migsort():
        # Migration-free steps SKIP the full-width category sort (lax.cond
        # executes one branch on TPU — measured round-2c): in the aligned
        # splice layout the kept block is already contiguous, [n_lo,
        # n_lo + n_kept) of the comb array (_device_build §3), and n_lo is
        # recoverable from the PRE-step keys alone — lo-halo rows are
        # exactly those keyed below the slab's first cell plane (live
        # locals are inside their slab at build time; invalid rows carry
        # the sentinel). With zero migrants the stable category sort is a
        # pure rotation of that layout, so slicing at n_lo reproduces its
        # kept block bit-exactly; the dn/up send windows then read garbage
        # lanes that their valid masks (lane < n_dn = 0) discard. The
        # dam-break trajectory crosses z-cuts ~never (scaling/census_*),
        # so this elides the second full-width sort on ~every step of a
        # real multi-device run.
        C = cfg.num_cells_per_dim
        d = lax.axis_index(dcfg.axis_name)
        k_div = _plane_array(cfg, dcfg)[d] * C * C
        n_lo = jnp.sum(key_s < k_div).astype(jnp.int32)
        n_pad = key_s.shape[0] + m_cap - c_dev

        def _mig_skip(rows):
            return tuple(
                jnp.concatenate(
                    [
                        lax.dynamic_slice(r, (n_lo,), (c_dev,)),
                        jnp.full((n_pad,), v, r.dtype),
                    ]
                )
                for r, v in zip(rows, deads)
            )

        mx, my, mz, mvx, mvy, mvz, mtag = lax.cond(
            n_dn + n_up > 0, _mig_sort, _mig_skip, ops
        )
    else:
        mx, my, mz, mvx, mvy, mvz, mtag = _mig_sort(ops)
    srows = (mx, my, mz, mvx, mvy, mvz)
    lane = jnp.arange(m_cap, dtype=jnp.int32)
    mdn = jnp.stack([r[:m_cap] for r in srows], axis=1)
    mdn_tag = mtag[:m_cap]
    mdn_valid = lane < n_dn
    up0 = n_dn + n_kept
    mup = jnp.stack(
        [lax.dynamic_slice(r, (up0,), (m_cap,)) for r in srows], axis=1
    )
    mup_tag = lax.dynamic_slice(mtag, (up0,), (m_cap,))
    mup_valid = lane < n_up

    in_lo = pshift(mup, True)  # arrivals from below
    in_lo_tag = pshift(mup_tag, True)
    in_lo_valid = pshift(mup_valid, True)
    in_hi = pshift(mdn, False)  # arrivals from above
    in_hi_tag = pshift(mdn_tag, False)
    in_hi_valid = pshift(mdn_valid, False)

    inc = jnp.concatenate([in_lo, in_hi])
    inc_tag = jnp.concatenate([in_lo_tag, in_hi_tag])
    inc_valid = jnp.concatenate([in_lo_valid, in_hi_valid])
    # pack arrivals so arrival j pairs with the j-th free slot (tiny sort)
    (inc, inc_tag), inc_valid, _, _ = _compact(
        inc_valid, (inc, inc_tag), 2 * m_cap
    )

    # kept block → front c_dev slots; arrivals scatter into the free tail
    ox, oy, oz, ovx, ovy, ovz = (
        lax.dynamic_slice(r, (n_dn,), (c_dev,)) for r in srows
    )
    otag = lax.dynamic_slice(mtag, (n_dn,), (c_dev,))
    valid_new = jnp.arange(c_dev, dtype=jnp.int32) < n_kept

    idx = n_kept + jnp.arange(2 * m_cap, dtype=jnp.int32)
    write = inc_valid & (idx < c_dev)
    dev_overflow = jnp.sum(inc_valid & (idx >= c_dev)).astype(jnp.int32)
    widx = jnp.where(write, idx, c_dev)  # OOB → dropped by mode="drop"
    put = lambda row, val: row.at[widx].set(val, mode="drop")
    ox = put(ox, inc[:, 0])
    oy = put(oy, inc[:, 1])
    oz = put(oz, inc[:, 2])
    ovx = put(ovx, inc[:, 3])
    ovy = put(ovy, inc[:, 4])
    ovz = put(ovz, inc[:, 5])
    otag = put(otag, inc_tag)
    valid_new = valid_new.at[widx].set(True, mode="drop")

    x = jnp.stack([ox, oy, oz], axis=1)
    v = jnp.stack([ovx, ovy, ovz], axis=1)
    pid_new = jnp.where(valid_new, otag, jnp.int32(-1))

    scalars = (
        ovf_w,
        ovf_mdn + ovf_mup + dev_overflow,
        misrouted,
        jnp.sum(valid_new).astype(jnp.int32),
        jnp.maximum(n_dn, n_up),
    )
    return x, v, valid_new, pid_new, scalars


def _device_step(
    pos, vel, valid, pid, click_cell, click_active, cfg: SimConfig,
    dcfg: DistConfig, use_pallas: bool = False, interpret: bool = False,
    with_click: bool = True,
):
    """One timestep on one device's slab (runs under shard_map):
    _device_build (halo exchange + sort) composed with _device_update
    (kernels + integrate + migration), counters psummed into a DistAux."""
    ax = dcfg.axis_name
    (key_s, sx, sy, sz, svx, svy, svz, tag_s, halo_ovf, oob,
     halo_send) = _device_build(pos, vel, valid, pid, cfg, dcfg)
    (x, v, valid_new, pid_new,
     (ovf_w, mig_ovf, misrouted, n_valid, mig_send)) = _device_update(
        key_s, sx, sy, sz, svx, svy, svz, tag_s, click_cell,
        click_active, cfg, dcfg, use_pallas, interpret,
        with_click=with_click,
    )
    aux = DistAux(
        halo_overflow=lax.psum(halo_ovf, ax),
        migration_overflow=lax.psum(mig_ovf, ax),
        window_overflow=lax.psum(ovf_w, ax),
        oob_count=lax.psum(oob, ax),
        misrouted=lax.psum(misrouted, ax),
        num_particles=lax.psum(n_valid, ax),
        max_dev_particles=lax.pmax(n_valid, ax),
        max_halo_send=lax.pmax(halo_send, ax),
        max_migration_send=lax.pmax(mig_send, ax),
    )
    return x, v, valid_new, pid_new, aux


def make_sharded_step(
    cfg: SimConfig, dcfg: DistConfig, mesh: Mesh,
    use_pallas: bool = False, interpret: bool = False,
):
    """Jitted sharded `DistState -> (DistState, DistAux)`. use_pallas runs the
    fused megakernels per device (the TPU multi-chip production path)."""
    dcfg.validate()
    _check_slab_width(cfg, dcfg)
    ax = dcfg.axis_name
    spec = P(ax)

    fn = partial(
        _device_step, cfg=cfg, dcfg=dcfg, use_pallas=use_pallas,
        interpret=interpret,
    )
    sharded = shard_map(
        fn,
        mesh=mesh,
        in_specs=(spec, spec, spec, spec, P(), P()),
        out_specs=(spec, spec, spec, spec, P()),
        # pallas_call outputs carry no varying-mesh-axis metadata; the specs
        # above fully describe the sharding, so skip the vma check
        check_vma=False,
    )

    @partial(jax.jit, compiler_options=compiler_opts(cfg))
    def _step(state: DistState, click_cell, click_active):
        x, v, valid, pid, aux = sharded(
            state.position, state.velocity, state.valid, state.pid,
            click_cell, click_active,
        )
        return DistState(x, v, valid, pid), aux

    def step(state: DistState, click_px=None, click_active=None):
        """click_px: concrete host pixel coords (or None). The pixel→cell
        conversion is host-side f32 (see impulse.click_cell_from_px); cells
        enter the jitted step as a traced int32[2] — no retrace per click."""
        import numpy as np

        from tpusph.interact.impulse import click_cell_from_px

        if click_px is None or (click_active is not None and not bool(click_active)):
            cell = jnp.zeros((2,), jnp.int32)
            active = jnp.zeros((), bool)
        else:
            px, py = (int(v) for v in np.asarray(click_px))
            cell = jnp.asarray(click_cell_from_px(px, py, cfg), jnp.int32)
            active = jnp.ones((), bool)
        return _step(state, cell, active)

    return step


def make_sharded_timed(
    cfg: SimConfig, dcfg: DistConfig, mesh: Mesh,
    use_pallas: bool = False, interpret: bool = False,
):
    """Two-stage jitted step for the TIMED protocol (the reference's
    per-phase report, times.h:12-36, applied to the sharded engine):

      build(state)  -> (sorted-rows intermediate, halo_ovf, oob)
          — halo exchange + payload sort, the "grid construction" phase
      update(inter, state, click_cell, click_active) -> (DistState, DistAux)
          — kernels + integrate + click + migration, the "SPH update" phase

    The production loop (make_sharded_step / make_sharded_run) fuses both in
    one dispatch; this split exists so DistSimulator.simulate_and_time can
    fence each phase separately, exactly like the single-chip
    Simulator.simulate_and_time. Returns (build_fn, update_fn)."""
    dcfg.validate()
    _check_slab_width(cfg, dcfg)
    ax = dcfg.axis_name
    spec = P(ax)

    def dev_build(pos, vel, valid, pid):
        (key_s, sx, sy, sz, svx, svy, svz, tag_s, halo_ovf, oob,
         halo_send) = _device_build(pos, vel, valid, pid, cfg, dcfg)
        return (
            key_s, sx, sy, sz, svx, svy, svz, tag_s,
            lax.psum(halo_ovf, ax), lax.psum(oob, ax),
            lax.pmax(halo_send, ax),
        )

    def dev_update(key_s, sx, sy, sz, svx, svy, svz, tag_s, cc, ca):
        (x, v, valid_new, pid_new,
         (ovf_w, mig_ovf, misrouted, n_valid, mig_send)) = _device_update(
            key_s, sx, sy, sz, svx, svy, svz, tag_s, cc, ca, cfg, dcfg,
            use_pallas, interpret,
            # the reference's simulateAndTime runs the step minus mouse
            # handling (simulator.cu:499-546) — same here, statically
            with_click=False,
        )
        return x, v, valid_new, pid_new, (
            lax.psum(ovf_w, ax), lax.psum(mig_ovf, ax),
            lax.psum(misrouted, ax), lax.psum(n_valid, ax),
            lax.pmax(n_valid, ax), lax.pmax(mig_send, ax),
        )

    build_sharded = shard_map(
        dev_build, mesh=mesh,
        in_specs=(spec,) * 4,
        out_specs=(spec,) * 8 + (P(), P(), P()),
        check_vma=False,
    )
    update_sharded = shard_map(
        dev_update, mesh=mesh,
        in_specs=(spec,) * 8 + (P(), P()),
        out_specs=(spec,) * 4 + (P(),),
        check_vma=False,
    )

    @partial(jax.jit, compiler_options=compiler_opts(cfg))
    def build(state: DistState):
        out = build_sharded(
            state.position, state.velocity, state.valid, state.pid
        )
        return out[:8], out[8], out[9], out[10]

    @partial(jax.jit, compiler_options=compiler_opts(cfg))
    def update(inter, halo_ovf, oob, halo_send, click_cell, click_active):
        (x, v, valid, pid,
         (ovf_w, mig_ovf, misrouted, n_valid, max_dev, mig_send)) = (
            update_sharded(*inter, click_cell, click_active)
        )
        aux = DistAux(
            halo_overflow=halo_ovf,
            migration_overflow=mig_ovf,
            window_overflow=ovf_w,
            oob_count=oob,
            misrouted=misrouted,
            num_particles=n_valid,
            max_dev_particles=max_dev,
            max_halo_send=halo_send,
            max_migration_send=mig_send,
        )
        return DistState(x, v, valid, pid), aux

    return build, update


def make_sharded_run(
    cfg: SimConfig, dcfg: DistConfig, mesh: Mesh, steps: int,
    use_pallas: bool = False, interpret: bool = False,
):
    """Scan-chained multi-chip production loop: ONE jitted dispatch runs
    `steps` sharded timesteps (lax.scan INSIDE shard_map, so the whole chain
    compiles to a single per-device program with its ICI collectives — no
    per-step host round-trip, the multi-chip analog of the bench's
    single-chip lax.scan chain). Aux counters are accumulated in-graph:
    overflow/misrouting/oob summed over the chain, num_particles from the
    final step. Returns jitted `DistState -> (DistState, DistAux)`."""
    dcfg.validate()
    _check_slab_width(cfg, dcfg)
    ax = dcfg.axis_name
    spec = P(ax)
    zero_cell = jnp.zeros((2,), jnp.int32)
    inactive = jnp.zeros((), bool)

    def device_run(pos, vel, valid, pid):
        def body(carry, _):
            pos, vel, valid, pid = carry
            x, v, valid2, pid2, aux = _device_step(
                pos, vel, valid, pid, zero_cell, inactive, cfg, dcfg,
                use_pallas=use_pallas, interpret=interpret,
                with_click=False,  # production chain: no click surface
            )
            return (x, v, valid2, pid2), aux
        carry, auxs = lax.scan(body, (pos, vel, valid, pid), None, length=steps)
        aux = DistAux(
            halo_overflow=jnp.sum(auxs.halo_overflow),
            migration_overflow=jnp.sum(auxs.migration_overflow),
            window_overflow=jnp.sum(auxs.window_overflow),
            oob_count=jnp.sum(auxs.oob_count),
            misrouted=jnp.sum(auxs.misrouted),
            num_particles=auxs.num_particles[-1],
            max_dev_particles=jnp.max(auxs.max_dev_particles),
            max_halo_send=jnp.max(auxs.max_halo_send),
            max_migration_send=jnp.max(auxs.max_migration_send),
        )
        return carry[0], carry[1], carry[2], carry[3], aux

    sharded = shard_map(
        device_run,
        mesh=mesh,
        in_specs=(spec, spec, spec, spec),
        out_specs=(spec, spec, spec, spec, P()),
        check_vma=False,
    )

    @partial(jax.jit, compiler_options=compiler_opts(cfg))
    def run(state: DistState):
        x, v, valid, pid, aux = sharded(
            state.position, state.velocity, state.valid, state.pid
        )
        return DistState(x, v, valid, pid), aux

    return run


# --------------------------------------------------------------------- host IO
def slab_owner(z: np.ndarray, cfg: SimConfig, dcfg: DistConfig) -> np.ndarray:
    """Host-side owning-device index per z — the exact mirror of the device
    step's migration predicate (_migration_predicates): cell-space with
    explicit slab planes, float equal-width otherwise."""
    d_count = dcfg.n_devices
    if dcfg.slab_planes is not None:
        zc = np.clip(
            (np.asarray(z, np.float32) / np.float32(cfg.h)).astype(np.int32),
            0, cfg.num_cells_per_dim - 1,
        )
        interior = np.asarray(dcfg.slab_planes[1:-1], np.int64)
        return np.searchsorted(interior, zc, side="right")
    slab_w = cfg.box_dim / d_count
    return np.clip((np.asarray(z) / slab_w).astype(np.int64), 0, d_count - 1)


def balanced_slab_planes(
    z: np.ndarray, cfg: SimConfig, n_devices: int
) -> tuple:
    """Cell-aligned slab edges that equalize per-slab occupancy for the
    given z snapshot (host-side; DistSimulator.setup applies this to the
    initial state by default). Equal-width slabs carry a STRUCTURAL
    imbalance — e.g. random init fills [1, box−1] only, leaving edge slabs
    half-empty (λ = 1.25 at D ≥ 4, scaling/census_n2097152.json) — and
    any D whose equal-width faces miss cell planes pays a full-width merge
    sort per step. Occupancy-quantile edges snapped to cell planes fix
    both. Gaps are clamped to ≥ 2 cells (the 2h ghost layer's minimum)."""
    C, D = cfg.num_cells_per_dim, n_devices
    zc = np.clip(
        (np.asarray(z, np.float32) / np.float32(cfg.h)).astype(np.int32),
        0, C - 1,
    )
    cdf = np.cumsum(np.bincount(zc, minlength=C))  # cdf[c] = #(zc ≤ c)
    n = int(cdf[-1])
    planes = [0]
    for k in range(1, D):
        # smallest plane p with count(zc < p) ≥ k·n/D
        p = int(np.searchsorted(cdf, k * n / D) + 1)
        p = min(max(p, planes[-1] + 2), C - 2 * (D - k))
        planes.append(p)
    planes.append(C)
    return tuple(planes)


def distribute_state(
    state: FluidState, cfg: SimConfig, dcfg: DistConfig, mesh: Mesh
) -> DistState:
    """Host-side: assign each valid particle to its z-slab owner and build the
    padded per-device blocks, then device_put with the slab sharding."""
    pos = np.asarray(state.position)
    vel = np.asarray(state.velocity)
    valid = np.asarray(state.valid)
    d_count, c_dev = dcfg.n_devices, dcfg.dev_capacity

    gx = np.zeros((d_count, c_dev, 3), np.float32)
    gv = np.zeros((d_count, c_dev, 3), np.float32)
    gvalid = np.zeros((d_count, c_dev), bool)
    gpid = np.full((d_count, c_dev), -1, np.int32)

    owner = slab_owner(pos[:, 2], cfg, dcfg)
    for dev in range(d_count):
        idx = np.nonzero(valid & (owner == dev))[0]
        if len(idx) > c_dev:
            raise ValueError(
                f"device {dev} needs {len(idx)} slots > dev_capacity {c_dev}"
            )
        k = len(idx)
        gx[dev, :k] = pos[idx]
        gv[dev, :k] = vel[idx]
        gvalid[dev, :k] = True
        gpid[dev, :k] = idx

    sharding = NamedSharding(mesh, P(dcfg.axis_name))
    put = lambda a: jax.device_put(a.reshape(d_count * c_dev, *a.shape[2:]), sharding)
    return DistState(put(gx), put(gv), put(gvalid), put(gpid))


def collect_state(dist: DistState, num_particles: int) -> dict:
    """Host-side: gather and re-order by pid → {position, velocity} f32[N,3]."""
    pos = np.asarray(jax.device_get(dist.position))
    vel = np.asarray(jax.device_get(dist.velocity))
    valid = np.asarray(jax.device_get(dist.valid))
    pid = np.asarray(jax.device_get(dist.pid))
    out_p = np.full((num_particles, 3), np.nan, np.float32)
    out_v = np.full((num_particles, 3), np.nan, np.float32)
    live = valid & (pid >= 0)
    out_p[pid[live]] = pos[live]
    out_v[pid[live]] = vel[live]
    return {"position": out_p, "velocity": out_v}
