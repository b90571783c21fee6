"""Spatial domain sharding — scaling SPH past one chip.

The reference is strictly single-GPU (SURVEY.md §2.5: no MPI/NCCL, its only
parallelism is one CUDA thread per particle). This module is the TPU-native
scaling layer the survey specifies: the 10×10×10 box is split into z-slabs
across a 1-D `jax.sharding.Mesh`; each device owns the particles resident in
its slab in fixed-capacity padded arrays. Per step, under `shard_map`:

  1. **Halo exchange** — each device packs the particles within **2h** of its
     slab faces and `lax.ppermute`s position+velocity to the adjacent devices
     over ICI (the boundary reads the reference does freely through HBM,
     simulator.cu:163-185, become explicit neighbor collectives). The ghost
     layer is TWO smoothing radii deep so that every halo copy within h of
     the boundary sees ALL of its own neighbors locally (they live within 2h
     of the boundary) — its locally-computed density/pressure is exact, and
     the round-2 "authoritative ρ/p" exchange of the earlier design
     disappears: one collective round instead of two, and nothing downstream
     ever needs results in pre-sort particle order. Halo rows deeper than h
     get wrong densities but are never read: force targets are local rows
     only, and their sources lie within h of the boundary. Requires
     slab_width ≥ 2h (checked at step-build time).
  2. **Physics, fields-native** — the SAME hot path as the tuned single-chip
     engine (engine/step.py:step_pallas_fields): ONE stable payload
     `lax.sort` carries the six field rows plus a pid/ownership tag with the
     cell keys; the fused Pallas density+force megakernels (with the full
     tuned-preset machinery — qrank prep, descriptor loops, streamed
     records, slim force layout) run per device inside `shard_map`, each
     chip on its own kernel grid. No argsort, no (N,3) gathers, no
     histogram starts table (rank prep makes it dead code).
  3. **Integration + click impulse** — local targets only, in sorted order.
  4. **Migration** — particles whose new z crossed a slab face are packed
     (one category payload sort yields both direction buffers), `ppermute`d
     one hop, and merged into the free tail of the kept-compacted state.

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

    def validate(self) -> None:
        for f in ("dev_capacity", "halo_capacity", "migration_capacity"):
            v = getattr(self, f)
            if v <= 0 or v % 8:
                raise ValueError(f"{f} must be a positive multiple of 8, got {v}")


def _check_slab_width(cfg: SimConfig, dcfg: DistConfig) -> None:
    """The 2h ghost layer needs slabs at least 2h wide (a halo copy's
    neighborhood must close inside the adjacent device's slab; see module
    docstring)."""
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
    """(z_lo, z_hi, slab_w, pshift) for this device's slab."""
    d_count = dcfg.n_devices
    d = lax.axis_index(dcfg.axis_name)
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


def _halo_buffers(x, y, z, vx, vy, vz, send_dn, send_up, h_cap: int,
                  disjoint: bool):
    """Pack the two 2h face layers into (h_cap, 6) send matrices. When the
    slab is ≥ 4h wide the dn/up sets are DISJOINT, so ONE stable category
    payload sort yields both buffers (dn rows sort to the front, up rows to
    the back) — replacing two argsort+gather compacts with one sort.
    Narrower slabs (< 4h, only at ≥ 25 z-devices in the reference scene)
    fall back to the two compacts. Returns
    (dn6, dn_valid, up6, up_valid, overflow)."""
    n_dn = jnp.sum(send_dn).astype(jnp.int32)
    n_up = jnp.sum(send_up).astype(jnp.int32)
    overflow = jnp.maximum(n_dn - h_cap, 0) + jnp.maximum(n_up - h_cap, 0)
    lane = jnp.arange(h_cap, dtype=jnp.int32)
    if disjoint:
        cat = jnp.where(send_dn, 0, jnp.where(send_up, 2, 1)).astype(
            jnp.int32
        )
        _, hx, hy, hz, hvx, hvy, hvz = lax.sort(
            (cat, x, y, z, vx, vy, vz), num_keys=1, is_stable=True
        )
        dn6 = jnp.stack(
            [hx[:h_cap], hy[:h_cap], hz[:h_cap],
             hvx[:h_cap], hvy[:h_cap], hvz[:h_cap]], axis=1
        )
        t0 = x.shape[0] - h_cap
        up6 = jnp.stack(
            [hx[t0:], hy[t0:], hz[t0:], hvx[t0:], hvy[t0:], hvz[t0:]],
            axis=1,
        )
        dn_valid = lane < n_dn
        up_valid = lane >= (h_cap - jnp.minimum(n_up, h_cap))
        return dn6, dn_valid, up6, up_valid, overflow
    (dn_rows), dn_valid, _, _ = _compact(
        send_dn, (x, y, z, vx, vy, vz), h_cap
    )
    (up_rows), up_valid, _, _ = _compact(
        send_up, (x, y, z, vx, vy, vz), h_cap
    )
    return (
        jnp.stack(dn_rows, axis=1), dn_valid,
        jnp.stack(up_rows, axis=1), up_valid, overflow,
    )


def _device_build(pos, vel, valid, pid, cfg: SimConfig, dcfg: DistConfig):
    """Phase 1 on one device's slab: 2h halo exchange + cell-key payload
    sort — the sharded "grid construction" phase (the reference's timed
    kernelBuildGrid bracket, simulator.cu:505-513, plus the boundary
    collective that replaces its free HBM reads). Returns the sorted comb
    rows + per-device (halo_overflow, oob_count) scalars (not yet psummed).
    """
    h_cap = dcfg.halo_capacity
    halo_w = jnp.float32(2.0 * cfg.h)  # 2h ghost layer (module docstring)
    z_lo, z_hi, _slab_w, pshift = _slab_geometry(cfg, dcfg)

    # ---- halo selection (2h layer) + exchange (positions, velocities),
    # fields-native: state is sliced to 1-D rows ONCE here and never
    # re-materialized as (N, 3) downstream
    x, y, z = pos[:, 0], pos[:, 1], pos[:, 2]
    vx, vy, vz = vel[:, 0], vel[:, 1], vel[:, 2]
    send_dn = valid & (z < z_lo + halo_w)
    send_up = valid & (z >= z_hi - halo_w)
    disjoint = cfg.box_dim / dcfg.n_devices >= 4 * cfg.h  # static
    dn6, dn_valid, up6, up_valid, halo_ovf = _halo_buffers(
        x, y, z, vx, vy, vz, send_dn, send_up, h_cap, disjoint
    )
    lo6 = pshift(up6, True)  # halo from the device below
    lo_valid = pshift(up_valid, True)
    hi6 = pshift(dn6, False)  # halo from the device above
    hi_valid = pshift(dn_valid, False)

    # ---- combined local ∪ halo rows
    comb_valid = jnp.concatenate([valid, lo_valid, hi_valid])
    rows = [
        jnp.concatenate([r, lo6[:, j], hi6[:, j]])
        for j, r in enumerate((x, y, z, vx, vy, vz))
    ]
    # stale/invalid slots must sit at the origin: the Pallas key mask can
    # coincidentally match sentinel-keyed rows, and only the ≥0.17 gap from
    # any clamped-valid position makes them physically inert
    for j in range(3):
        rows[j] = jnp.where(comb_valid, rows[j], 0.0)
    # ownership tag travels with the sort: local valid rows carry their pid
    # (≥ 0), local invalid slots −1, halo copies −2 — `tag ≥ 0` is the
    # "live local" mask in sorted space
    tag = jnp.concatenate([
        jnp.where(valid, pid, jnp.int32(-1)),
        jnp.full((2 * h_cap,), -2, jnp.int32),
    ])
    key, oob_count = compute_keys_fields(rows[0], rows[1], rows[2],
                                         comb_valid, cfg)
    key_s, sx, sy, sz, svx, svy, svz, tag_s = lax.sort(
        (key, *rows, tag), num_keys=1, is_stable=True
    )
    return key_s, sx, sy, sz, svx, svy, svz, tag_s, halo_ovf, oob_count


def _device_update(
    key_s, sx, sy, sz, svx, svy, svz, tag_s, click_cell, click_active,
    cfg: SimConfig, dcfg: DistConfig, use_pallas: bool, interpret: bool,
    with_click: bool = True,
):
    """Phase 2 on one device's slab: fused density/force megakernels +
    integration + click impulse + migration + state repacking (the sharded
    "SPH update" phase). Consumes _device_build's sorted rows; returns
    (x, v, valid_new, pid_new, (window_ovf, migration_ovf, misrouted,
    n_valid)) with the scalars not yet psummed."""
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

    # ---- 5. migration of slab-crossers (one hop). A particle cannot cross
    # both faces, so ONE stable category sort packs both direction buffers:
    # dn-senders to the front, up-senders to the back.
    mig_dn = live & (nz < z_lo)
    mig_up = live & (nz >= z_hi)
    misrouted = jnp.sum(
        live & ((nz < z_lo - slab_w) | (nz >= z_hi + slab_w))
    ).astype(jnp.int32)
    kept = live & ~mig_dn & ~mig_up
    n_dn = jnp.sum(mig_dn).astype(jnp.int32)
    n_up = jnp.sum(mig_up).astype(jnp.int32)
    ovf_mdn = jnp.maximum(n_dn - m_cap, 0)
    ovf_mup = jnp.maximum(n_up - m_cap, 0)

    cat = jnp.where(mig_dn, 0, jnp.where(mig_up, 2, 1)).astype(jnp.int32)
    _, mx, my, mz, mvx, mvy, mvz, mtag = lax.sort(
        (cat, nx, ny, nz, nvx, nvy, nvz, tag_s), num_keys=1, is_stable=True
    )
    lane = jnp.arange(m_cap, dtype=jnp.int32)
    mdn = jnp.stack(
        [mx[:m_cap], my[:m_cap], mz[:m_cap],
         mvx[:m_cap], mvy[:m_cap], mvz[:m_cap]], axis=1
    )
    mdn_tag = mtag[:m_cap]
    mdn_valid = lane < n_dn
    ncomb = nx.shape[0]
    t0 = ncomb - m_cap
    mup = jnp.stack(
        [mx[t0:], my[t0:], mz[t0:], mvx[t0:], mvy[t0:], mvz[t0:]], axis=1
    )
    mup_tag = mtag[t0:]
    mup_valid = lane >= (m_cap - jnp.minimum(n_up, m_cap))

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

    # ---- 6. new local state: kept rows compacted to the front (one stable
    # payload sort), arrivals scattered into the free tail at n_kept
    skey = jnp.where(kept, 0, 1).astype(jnp.int32)
    _, ox, oy, oz, ovx, ovy, ovz, otag = lax.sort(
        (skey, nx, ny, nz, nvx, nvy, nvz, tag_s), num_keys=1, is_stable=True
    )
    ox, oy, oz = ox[:c_dev], oy[:c_dev], oz[:c_dev]
    ovx, ovy, ovz = ovx[:c_dev], ovy[:c_dev], ovz[:c_dev]
    otag = otag[:c_dev]
    n_kept = jnp.sum(kept).astype(jnp.int32)
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
    key_s, sx, sy, sz, svx, svy, svz, tag_s, halo_ovf, oob = _device_build(
        pos, vel, valid, pid, cfg, dcfg
    )
    x, v, valid_new, pid_new, (ovf_w, mig_ovf, misrouted, n_valid) = (
        _device_update(
            key_s, sx, sy, sz, svx, svy, svz, tag_s, click_cell,
            click_active, cfg, dcfg, use_pallas, interpret,
            with_click=with_click,
        )
    )
    aux = DistAux(
        halo_overflow=lax.psum(halo_ovf, ax),
        migration_overflow=lax.psum(mig_ovf, ax),
        window_overflow=lax.psum(ovf_w, ax),
        oob_count=lax.psum(oob, ax),
        misrouted=lax.psum(misrouted, ax),
        num_particles=lax.psum(n_valid, ax),
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
        key_s, sx, sy, sz, svx, svy, svz, tag_s, halo_ovf, oob = (
            _device_build(pos, vel, valid, pid, cfg, dcfg)
        )
        return (
            key_s, sx, sy, sz, svx, svy, svz, tag_s,
            lax.psum(halo_ovf, ax), lax.psum(oob, ax),
        )

    def dev_update(key_s, sx, sy, sz, svx, svy, svz, tag_s, cc, ca):
        x, v, valid_new, pid_new, (ovf_w, mig_ovf, misrouted, n_valid) = (
            _device_update(
                key_s, sx, sy, sz, svx, svy, svz, tag_s, cc, ca, cfg, dcfg,
                use_pallas, interpret,
                # the reference's simulateAndTime runs the step minus mouse
                # handling (simulator.cu:499-546) — same here, statically
                with_click=False,
            )
        )
        return x, v, valid_new, pid_new, (
            lax.psum(ovf_w, ax), lax.psum(mig_ovf, ax),
            lax.psum(misrouted, ax), lax.psum(n_valid, ax),
        )

    build_sharded = shard_map(
        dev_build, mesh=mesh,
        in_specs=(spec,) * 4,
        out_specs=(spec,) * 8 + (P(), P()),
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
        return out[:8], out[8], out[9]

    @partial(jax.jit, compiler_options=compiler_opts(cfg))
    def update(inter, halo_ovf, oob, click_cell, click_active):
        x, v, valid, pid, (ovf_w, mig_ovf, misrouted, n_valid) = (
            update_sharded(*inter, click_cell, click_active)
        )
        aux = DistAux(
            halo_overflow=halo_ovf,
            migration_overflow=mig_ovf,
            window_overflow=ovf_w,
            oob_count=oob,
            misrouted=misrouted,
            num_particles=n_valid,
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
def distribute_state(
    state: FluidState, cfg: SimConfig, dcfg: DistConfig, mesh: Mesh
) -> DistState:
    """Host-side: assign each valid particle to its z-slab owner and build the
    padded per-device blocks, then device_put with the slab sharding."""
    pos = np.asarray(state.position)
    vel = np.asarray(state.velocity)
    valid = np.asarray(state.valid)
    d_count, c_dev = dcfg.n_devices, dcfg.dev_capacity
    slab_w = cfg.box_dim / d_count

    gx = np.zeros((d_count, c_dev, 3), np.float32)
    gv = np.zeros((d_count, c_dev, 3), np.float32)
    gvalid = np.zeros((d_count, c_dev), bool)
    gpid = np.full((d_count, c_dev), -1, np.int32)

    owner = np.clip((pos[:, 2] / slab_w).astype(np.int64), 0, d_count - 1)
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
