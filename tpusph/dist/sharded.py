"""Spatial domain sharding — scaling SPH past one chip.

The reference is strictly single-GPU (SURVEY.md §2.5: no MPI/NCCL, its only
parallelism is one CUDA thread per particle). This module is the TPU-native
scaling layer the survey specifies: the 10×10×10 box is split into z-slabs
across a 1-D `jax.sharding.Mesh`; each device owns the particles resident in
its slab in fixed-capacity padded arrays. Per step, under `shard_map`:

  1. **Halo exchange (round 1)** — each device packs the particles within one
     smoothing radius h of its slab faces and `lax.ppermute`s position+velocity
     to the adjacent devices over ICI (the boundary reads the reference does
     freely through HBM, simulator.cu:163-185, become explicit neighbor
     collectives).
  2. **Density pass** — local cell-list + windowed gather over local ∪ halo
     sources (identical physics to the single-chip path).
  3. **Halo exchange (round 2)** — densities/pressures of the *same* halo
     particles, computed by their home device, replace the locally-(wrongly-)
     computed values on the halo copies, so the force pass sees exact ρ/p.
  4. **Force pass + integration** — local targets only.
  5. **Migration** — particles whose new z crossed a slab face are packed,
     `ppermute`d one hop, and merged into free slots on the receiving device.

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

from tpusph.core.config import SimConfig
from tpusph.core.state import FluidState
from tpusph.engine.step import _density_pass_sorted, _force_pass_sorted
from tpusph.interact.impulse import click_kick
from tpusph.neighbors.cell_list import build_cell_list
from tpusph.physics.integrate import integrate

try:  # jax ≥ 0.6 exposes shard_map at top level
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map  # type: ignore


@dataclasses.dataclass(frozen=True)
class DistConfig:
    """Static capacities for the sharded engine (all per-device)."""

    n_devices: int
    dev_capacity: int  # particle slots per device
    halo_capacity: int  # per-direction halo buffer rows
    migration_capacity: int  # per-direction migration buffer rows
    axis_name: str = "z"

    def validate(self) -> None:
        for f in ("dev_capacity", "halo_capacity", "migration_capacity"):
            v = getattr(self, f)
            if v <= 0 or v % 8:
                raise ValueError(f"{f} must be a positive multiple of 8, got {v}")


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


def _local_physics(comb_pos, comb_vel, comb_valid, cfg, use_pallas, interpret):
    """Density/pressure/force over the local∪halo particle set. Returns
    (rho, prs, force_local_order_fn) pieces in *unsorted* (comb) order via the
    cell-list machinery; `use_pallas` swaps the XLA tile passes for the fused
    Pallas megakernels (per-device, inside shard_map — each chip runs its own
    kernel grid)."""
    cl = build_cell_list(comb_pos, comb_valid, cfg, interpret=interpret)
    sp = comb_pos[cl.perm]
    sv = comb_vel[cl.perm]
    if use_pallas:
        from tpusph.pallas.fused import density_pallas, supertile_columns
        from tpusph.physics.kernels import pressure_from_density

        cols_info = supertile_columns(
            cl.key_sorted, cl.valid_sorted, cl.starts, cfg, interpret
        )
        raw = density_pallas(
            (sp[:, 0], sp[:, 1], sp[:, 2]), cl.key_sorted, cols_info, cfg,
            interpret=interpret,
        )
        rho_s, p_s = pressure_from_density(raw, cfg)
        rho_s = jnp.where(cl.valid_sorted, rho_s, 1.0)
        p_s = jnp.where(cl.valid_sorted, p_s, 0.0)
        ovf = cols_info.overflow
        extra = cols_info
    else:
        rho_s, p_s, ovf = _density_pass_sorted(
            sp, cl.key_sorted, cl.valid_sorted, cl.starts, cfg
        )
        extra = None
    return cl, sp, sv, rho_s, p_s, ovf + cl.starts_overflow, extra


def _device_step(
    pos, vel, valid, pid, click_cell, click_active, cfg: SimConfig,
    dcfg: DistConfig, use_pallas: bool = False, interpret: bool = False,
):
    """One timestep on one device's slab (runs under shard_map)."""
    ax = dcfg.axis_name
    d_count = dcfg.n_devices
    c_dev = dcfg.dev_capacity
    h_cap = dcfg.halo_capacity
    m_cap = dcfg.migration_capacity
    h = jnp.float32(cfg.h)

    d = lax.axis_index(ax)
    slab_w = jnp.float32(cfg.box_dim) / d_count
    z_lo = d.astype(jnp.float32) * slab_w
    z_hi = z_lo + slab_w

    perm_up = [(i, i + 1) for i in range(d_count - 1)]  # data flows d → d+1
    perm_dn = [(i + 1, i) for i in range(d_count - 1)]  # data flows d → d−1

    def pshift(x, perm):
        if not perm:  # single device: nothing to exchange
            return jnp.zeros_like(x)
        return lax.ppermute(x, ax, perm)

    # ---- 1. halo selection + exchange round 1 (positions, velocities)
    z = pos[:, 2]
    send_dn = valid & (z < z_lo + h)
    send_up = valid & (z >= z_hi - h)
    (dn_pos, dn_vel), dn_valid, take_dn, ovf_dn = _compact(
        send_dn, (pos, vel), h_cap
    )
    (up_pos, up_vel), up_valid, take_up, ovf_up = _compact(
        send_up, (pos, vel), h_cap
    )
    lo_pos = pshift(up_pos, perm_up)  # halo from the device below
    lo_vel = pshift(up_vel, perm_up)
    lo_valid = pshift(up_valid, perm_up)
    hi_pos = pshift(dn_pos, perm_dn)  # halo from the device above
    hi_vel = pshift(dn_vel, perm_dn)
    hi_valid = pshift(dn_valid, perm_dn)

    # ---- 2. density over local ∪ halo sources
    comb_pos = jnp.concatenate([pos, lo_pos, hi_pos])
    comb_vel = jnp.concatenate([vel, lo_vel, hi_vel])
    comb_valid = jnp.concatenate([valid, lo_valid, hi_valid])
    # stale/invalid slots must sit at the origin: the Pallas key mask can
    # coincidentally match sentinel-keyed rows, and only the ≥0.17 gap from
    # any clamped-valid position makes them physically inert
    comb_pos = jnp.where(comb_valid[:, None], comb_pos, 0.0)
    cl, sp, sv, rho_s, p_s, ovf_w, cols_info = _local_physics(
        comb_pos, comb_vel, comb_valid, cfg, use_pallas, interpret
    )
    nc = comb_pos.shape[0]
    rho = jnp.ones((nc,), jnp.float32).at[cl.perm].set(rho_s)
    prs = jnp.zeros((nc,), jnp.float32).at[cl.perm].set(p_s)

    # ---- 3. exchange round 2: authoritative ρ/p of the same halo sets
    rho_loc, prs_loc = rho[:c_dev], prs[:c_dev]
    lo_rho = pshift(rho_loc[take_up], perm_up)
    lo_prs = pshift(prs_loc[take_up], perm_up)
    hi_rho = pshift(rho_loc[take_dn], perm_dn)
    hi_prs = pshift(prs_loc[take_dn], perm_dn)
    rho = rho.at[c_dev : c_dev + h_cap].set(jnp.maximum(lo_rho, cfg.eps))
    rho = rho.at[c_dev + h_cap :].set(jnp.maximum(hi_rho, cfg.eps))
    prs = prs.at[c_dev : c_dev + h_cap].set(lo_prs)
    prs = prs.at[c_dev + h_cap :].set(hi_prs)

    # ---- 4. forces for local targets, integrate
    if use_pallas:
        from tpusph.pallas.fused import force_pallas

        f_s = force_pallas(
            (sp[:, 0], sp[:, 1], sp[:, 2]), (sv[:, 0], sv[:, 1], sv[:, 2]),
            rho[cl.perm], prs[cl.perm], cl.key_sorted, cols_info, cfg,
            interpret=interpret,
        ).T
        f_s = jnp.where(cl.valid_sorted[:, None], f_s, 0.0)
    else:
        f_s = _force_pass_sorted(
            sp, sv, rho[cl.perm], prs[cl.perm], cl.key_sorted, cl.valid_sorted,
            cl.starts, cfg,
        )
    force = jnp.zeros((nc, 3), jnp.float32).at[cl.perm].set(f_s)[:c_dev]
    x, v = integrate(pos, vel, force, rho_loc, cfg)
    x = jnp.where(valid[:, None], x, pos)
    v = jnp.where(valid[:, None], v, vel)

    # ---- 4b. click impulse (free-mode parity, simulator.cu:482-489):
    # applied after integration from PRE-step cells, exactly like the
    # single-chip engine; elementwise per particle, before migration so
    # kicked slab-crossers carry their kick to the new owner.
    kick = click_kick(pos, valid, click_cell, cfg)
    v = v + kick * click_active.astype(jnp.float32)

    # ---- 5. migration of slab-crossers (one hop)
    zn = x[:, 2]
    mig_dn = valid & (zn < z_lo)
    mig_up = valid & (zn >= z_hi)
    misrouted = jnp.sum(
        valid & ((zn < z_lo - slab_w) | (zn >= z_hi + slab_w))
    ).astype(jnp.int32)
    (mdn_x, mdn_v, mdn_pid), mdn_valid, _, ovf_mdn = _compact(
        mig_dn, (x, v, pid), m_cap
    )
    (mup_x, mup_v, mup_pid), mup_valid, _, ovf_mup = _compact(
        mig_up, (x, v, pid), m_cap
    )
    valid_kept = valid & ~mig_dn & ~mig_up

    in_lo_x = pshift(mup_x, perm_up)  # arrivals from below
    in_lo_v = pshift(mup_v, perm_up)
    in_lo_pid = pshift(mup_pid, perm_up)
    in_lo_valid = pshift(mup_valid, perm_up)
    in_hi_x = pshift(mdn_x, perm_dn)  # arrivals from above
    in_hi_v = pshift(mdn_v, perm_dn)
    in_hi_pid = pshift(mdn_pid, perm_dn)
    in_hi_valid = pshift(mdn_valid, perm_dn)

    inc_valid = jnp.concatenate([in_lo_valid, in_hi_valid])
    inc_x = jnp.concatenate([in_lo_x, in_hi_x])
    inc_v = jnp.concatenate([in_lo_v, in_hi_v])
    inc_pid = jnp.concatenate([in_lo_pid, in_hi_pid])
    # globally pack arrivals so arrival j pairs with the j-th free slot
    (inc_x, inc_v, inc_pid), inc_valid, _, _ = _compact(
        inc_valid, (inc_x, inc_v, inc_pid), 2 * m_cap
    )

    free_order = jnp.argsort(valid_kept, stable=True).astype(jnp.int32)
    slots = free_order[: 2 * m_cap]
    slot_free = ~valid_kept[slots]
    write = inc_valid & slot_free
    dev_overflow = jnp.sum(inc_valid & ~slot_free).astype(jnp.int32)

    x = x.at[slots].set(jnp.where(write[:, None], inc_x, x[slots]))
    v = v.at[slots].set(jnp.where(write[:, None], inc_v, v[slots]))
    pid = pid.at[slots].set(jnp.where(write, inc_pid, pid[slots]))
    valid_new = valid_kept.at[slots].set(valid_kept[slots] | write)

    aux = DistAux(
        halo_overflow=lax.psum(ovf_dn + ovf_up, ax),
        migration_overflow=lax.psum(ovf_mdn + ovf_mup + dev_overflow, ax),
        window_overflow=lax.psum(ovf_w, ax),
        oob_count=lax.psum(cl.oob_count, ax),
        misrouted=lax.psum(misrouted, ax),
        num_particles=lax.psum(jnp.sum(valid_new).astype(jnp.int32), ax),
    )
    return x, v, valid_new, pid, aux


def make_sharded_step(
    cfg: SimConfig, dcfg: DistConfig, mesh: Mesh,
    use_pallas: bool = False, interpret: bool = False,
):
    """Jitted sharded `DistState -> (DistState, DistAux)`. use_pallas runs the
    fused megakernels per device (the TPU multi-chip production path)."""
    dcfg.validate()
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

    @jax.jit
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

    @jax.jit
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
