"""3-D brick-mesh spatial sharding — the full generalization of the z-slab
layer in dist/sharded.py (SURVEY.md §7.10: "1-D (then 3-D) mesh").

The box is split into bricks over a (z, y, x) `jax.sharding.Mesh`; each device
owns the particles resident in its brick. The 27-neighborhood communication
uses the STAGED-AXIS scheme — three face exchanges instead of 26 point-to-point
sends, with edge/corner data forwarded transitively:

  halo round 1 (positions+velocities):
    phase z: pack local particles within h of the brick's z faces, ppermute
             along the z axis → halo set Hz.
    phase y: pack from local ∪ Hz within h of the y faces, ppermute along y
             → Hy (z-corner particles ride along).
    phase x: pack from local ∪ Hz ∪ Hy within h of the x faces → Hx.
  density over local ∪ Hz ∪ Hy ∪ Hx (targets local only — same cell-list
  machinery as the slab layer).
  halo round 2 (authoritative ρ/p): re-send along the SAME routes in the SAME
  z→y→x order, so a halo copy's home-computed ρ/p arrives before later phases
  forward it (corner copies would otherwise propagate locally-mis-computed
  values).
  force + integrate local.
  migration: three one-hop phases (z, then y, then x), each operating on the
  merged set, so a diagonal brick-corner crosser reaches its owner within one
  step via axis-by-axis hops.

All buffers fixed-capacity with overflow DETECTION (never silent drop), and a
per-axis misrouting counter for the one-hop-per-axis invariant — identical
philosophy to the slab layer. Replaces the reference's free HBM boundary reads
(/root/reference/src/simulator.cu:163-185) with explicit ICI collectives.
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
from tpusph.dist.sharded import DistAux, DistState, _compact, _local_physics
from tpusph.interact.impulse import click_kick
from tpusph.physics.integrate import integrate

try:
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map  # type: ignore

AXES = ("z", "y", "x")
AXIS_DIM = {"z": 2, "y": 1, "x": 0}  # position column per axis name


@dataclasses.dataclass(frozen=True)
class Mesh3DConfig:
    """Static capacities for the brick-sharded engine (all per-device)."""

    mesh_shape: tuple[int, int, int]  # devices along (z, y, x)
    dev_capacity: int
    halo_capacity: tuple[int, int, int]  # per-direction rows, per axis phase
    migration_capacity: tuple[int, int, int]

    def validate(self) -> None:
        if len(self.mesh_shape) != 3 or any(m < 1 for m in self.mesh_shape):
            raise ValueError(f"mesh_shape must be 3 positive ints, got {self.mesh_shape}")
        if self.dev_capacity <= 0 or self.dev_capacity % 8:
            raise ValueError("dev_capacity must be a positive multiple of 8")
        for name, caps in (("halo", self.halo_capacity),
                           ("migration", self.migration_capacity)):
            for v in caps:
                if v <= 0 or v % 8:
                    raise ValueError(
                        f"{name}_capacity entries must be positive multiples of 8"
                    )


def _axis_perms(n: int):
    up = [(i, i + 1) for i in range(n - 1)]
    dn = [(i + 1, i) for i in range(n - 1)]
    return up, dn


def _pshift(x, axis, perm):
    if not perm:
        return jnp.zeros_like(x)
    return lax.ppermute(x, axis, perm)


def _device_step3d(
    pos, vel, valid, pid, click_cell, click_active,
    cfg: SimConfig, mcfg: Mesh3DConfig,
    use_pallas: bool = False, interpret: bool = False,
):
    """One timestep on one device's brick (runs under shard_map over AXES)."""
    h = jnp.float32(cfg.h)
    c_dev = mcfg.dev_capacity

    # brick bounds per axis
    lo = {}
    hi = {}
    widths = {}
    for ax_i, ax in enumerate(AXES):
        m = mcfg.mesh_shape[ax_i]
        w = jnp.float32(cfg.box_dim) / m
        d = lax.axis_index(ax)
        lo[ax] = d.astype(jnp.float32) * w
        hi[ax] = lo[ax] + w
        widths[ax] = w

    # ---- halo round 1: staged z → y → x face exchanges
    comb_pos, comb_vel, comb_valid = pos, vel, valid
    takes = []  # (ax, take_dn, take_up, n_before) for round 2 replay
    halo_ovf = jnp.int32(0)
    for ax_i, ax in enumerate(AXES):
        m = mcfg.mesh_shape[ax_i]
        h_cap = mcfg.halo_capacity[ax_i]
        perm_up, perm_dn = _axis_perms(m)
        coord = comb_pos[:, AXIS_DIM[ax]]
        send_dn = comb_valid & (coord < lo[ax] + h)
        send_up = comb_valid & (coord >= hi[ax] - h)
        (dn_pos, dn_vel), dn_valid, take_dn, ovf_dn = _compact(
            send_dn, (comb_pos, comb_vel), h_cap
        )
        (up_pos, up_vel), up_valid, take_up, ovf_up = _compact(
            send_up, (comb_pos, comb_vel), h_cap
        )
        lo_pos = _pshift(up_pos, ax, perm_up)   # halo from the device below
        lo_vel = _pshift(up_vel, ax, perm_up)
        lo_valid = _pshift(up_valid, ax, perm_up)
        hi_pos = _pshift(dn_pos, ax, perm_dn)   # halo from the device above
        hi_vel = _pshift(dn_vel, ax, perm_dn)
        hi_valid = _pshift(dn_valid, ax, perm_dn)
        takes.append((ax, take_dn, take_up, comb_pos.shape[0]))
        comb_pos = jnp.concatenate([comb_pos, lo_pos, hi_pos])
        comb_vel = jnp.concatenate([comb_vel, lo_vel, hi_vel])
        comb_valid = jnp.concatenate([comb_valid, lo_valid, hi_valid])
        halo_ovf = halo_ovf + ovf_dn + ovf_up

    # invalid/stale slots parked at origin (physically inert — see sharded.py)
    comb_pos = jnp.where(comb_valid[:, None], comb_pos, 0.0)

    # ---- density over local ∪ halos
    cl, sp, sv, rho_s, p_s, ovf_w, cols_info = _local_physics(
        comb_pos, comb_vel, comb_valid, cfg, use_pallas, interpret
    )
    nc = comb_pos.shape[0]
    rho = jnp.ones((nc,), jnp.float32).at[cl.perm].set(rho_s)
    prs = jnp.zeros((nc,), jnp.float32).at[cl.perm].set(p_s)

    # ---- halo round 2: authoritative ρ/p along the same routes, same order
    for ax_i, (ax, take_dn, take_up, n_before) in enumerate(takes):
        m = mcfg.mesh_shape[ax_i]
        h_cap = mcfg.halo_capacity[ax_i]
        perm_up, perm_dn = _axis_perms(m)
        # ρ/p of the round-1 send sets, drawn from the prefix that existed
        # when the send was packed (later phases' halo slots come after it)
        lo_rho = _pshift(rho[take_up], ax, perm_up)
        lo_prs = _pshift(prs[take_up], ax, perm_up)
        hi_rho = _pshift(rho[take_dn], ax, perm_dn)
        hi_prs = _pshift(prs[take_dn], ax, perm_dn)
        s0 = n_before
        rho = rho.at[s0 : s0 + h_cap].set(jnp.maximum(lo_rho, cfg.eps))
        rho = rho.at[s0 + h_cap : s0 + 2 * h_cap].set(jnp.maximum(hi_rho, cfg.eps))
        prs = prs.at[s0 : s0 + h_cap].set(lo_prs)
        prs = prs.at[s0 + h_cap : s0 + 2 * h_cap].set(hi_prs)

    # ---- forces for local targets, integrate
    if use_pallas:
        from tpusph.pallas.fused import force_pallas

        f_s = force_pallas(
            (sp[:, 0], sp[:, 1], sp[:, 2]), (sv[:, 0], sv[:, 1], sv[:, 2]),
            rho[cl.perm], prs[cl.perm], cl.key_sorted, cols_info, cfg,
            interpret=interpret,
        ).T
        f_s = jnp.where(cl.valid_sorted[:, None], f_s, 0.0)
    else:
        from tpusph.engine.step import _force_pass_sorted

        f_s = _force_pass_sorted(
            sp, sv, rho[cl.perm], prs[cl.perm], cl.key_sorted, cl.valid_sorted,
            cl.starts, cfg,
        )
    force = jnp.zeros((nc, 3), jnp.float32).at[cl.perm].set(f_s)[:c_dev]
    rho_loc = rho[:c_dev]
    x, v = integrate(pos, vel, force, rho_loc, cfg)
    x = jnp.where(valid[:, None], x, pos)
    v = jnp.where(valid[:, None], v, vel)

    # click impulse (free-mode parity): pre-step cells, before migration
    kick = click_kick(pos, valid, click_cell, cfg)
    v = v + kick * click_active.astype(jnp.float32)

    # ---- migration: one hop per axis, z → y → x
    mig_ovf = jnp.int32(0)
    misrouted = jnp.int32(0)
    for ax_i, ax in enumerate(AXES):
        m = mcfg.mesh_shape[ax_i]
        m_cap = mcfg.migration_capacity[ax_i]
        w = widths[ax]
        perm_up, perm_dn = _axis_perms(m)
        coord = x[:, AXIS_DIM[ax]]
        mig_dn = valid & (coord < lo[ax])
        mig_up = valid & (coord >= hi[ax])
        misrouted = misrouted + jnp.sum(
            valid & ((coord < lo[ax] - w) | (coord >= hi[ax] + w))
        ).astype(jnp.int32)
        (mdn_x, mdn_v, mdn_pid), mdn_valid, _, ovf_dn = _compact(
            mig_dn, (x, v, pid), m_cap
        )
        (mup_x, mup_v, mup_pid), mup_valid, _, ovf_up = _compact(
            mig_up, (x, v, pid), m_cap
        )
        valid = valid & ~mig_dn & ~mig_up

        in_x = jnp.concatenate([
            _pshift(mup_x, ax, perm_up), _pshift(mdn_x, ax, perm_dn)])
        in_v = jnp.concatenate([
            _pshift(mup_v, ax, perm_up), _pshift(mdn_v, ax, perm_dn)])
        in_pid = jnp.concatenate([
            _pshift(mup_pid, ax, perm_up), _pshift(mdn_pid, ax, perm_dn)])
        in_valid = jnp.concatenate([
            _pshift(mup_valid, ax, perm_up), _pshift(mdn_valid, ax, perm_dn)])
        (in_x, in_v, in_pid), in_valid, _, _ = _compact(
            in_valid, (in_x, in_v, in_pid), 2 * m_cap
        )

        free_order = jnp.argsort(valid, stable=True).astype(jnp.int32)
        slots = free_order[: 2 * m_cap]
        slot_free = ~valid[slots]
        write = in_valid & slot_free
        mig_ovf = mig_ovf + ovf_dn + ovf_up + jnp.sum(
            in_valid & ~slot_free
        ).astype(jnp.int32)
        x = x.at[slots].set(jnp.where(write[:, None], in_x, x[slots]))
        v = v.at[slots].set(jnp.where(write[:, None], in_v, v[slots]))
        pid = pid.at[slots].set(jnp.where(write, in_pid, pid[slots]))
        valid = valid.at[slots].set(valid[slots] | write)

    aux = DistAux(
        halo_overflow=lax.psum(halo_ovf, AXES),
        migration_overflow=lax.psum(mig_ovf, AXES),
        window_overflow=lax.psum(ovf_w, AXES),
        oob_count=lax.psum(cl.oob_count, AXES),
        misrouted=lax.psum(misrouted, AXES),
        num_particles=lax.psum(jnp.sum(valid).astype(jnp.int32), AXES),
    )
    return x, v, valid, pid, aux


def make_mesh3d_step(
    cfg: SimConfig, mcfg: Mesh3DConfig, mesh: Mesh,
    use_pallas: bool = False, interpret: bool = False,
):
    """Jitted brick-sharded `DistState -> (DistState, DistAux)`."""
    mcfg.validate()
    spec = P(("z", "y", "x"))

    fn = partial(
        _device_step3d, cfg=cfg, mcfg=mcfg, use_pallas=use_pallas,
        interpret=interpret,
    )
    sharded = shard_map(
        fn,
        mesh=mesh,
        in_specs=(spec, spec, spec, spec, P(), P()),
        out_specs=(spec, spec, spec, spec, P()),
        check_vma=False,
    )

    @jax.jit
    def _step(state: DistState, click_cell, click_active):
        xx, v, valid, pid, aux = sharded(
            state.position, state.velocity, state.valid, state.pid,
            click_cell, click_active,
        )
        return DistState(xx, v, valid, pid), aux

    def step(state: DistState, click_px=None, click_active=None):
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


def make_mesh3d_run(
    cfg: SimConfig, mcfg: Mesh3DConfig, mesh: Mesh, steps: int,
    use_pallas: bool = False, interpret: bool = False,
):
    """Scan-chained brick-mesh production loop (the 3-D analog of
    sharded.make_sharded_run): one jitted dispatch runs `steps` timesteps,
    aux accumulated in-graph (overflow/misrouting summed, census from the
    final step)."""
    mcfg.validate()
    spec = P(AXES)
    zero_cell = jnp.zeros((2,), jnp.int32)
    inactive = jnp.zeros((), bool)

    def device_run(pos, vel, valid, pid):
        def body(carry, _):
            pos, vel, valid, pid = carry
            x, v, valid2, pid2, aux = _device_step3d(
                pos, vel, valid, pid, zero_cell, inactive, cfg, mcfg,
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


def make_mesh(devices, mesh_shape: tuple[int, int, int]) -> Mesh:
    mz, my, mx = mesh_shape
    return Mesh(np.asarray(devices).reshape(mz, my, mx), AXES)


def distribute_state_3d(
    state: FluidState, cfg: SimConfig, mcfg: Mesh3DConfig, mesh: Mesh
) -> DistState:
    """Host-side: assign each valid particle to its brick owner and build the
    padded per-device blocks with the (z,y,x)-major device order of the mesh."""
    pos = np.asarray(state.position)
    vel = np.asarray(state.velocity)
    valid = np.asarray(state.valid)
    mz, my, mx = mcfg.mesh_shape
    c_dev = mcfg.dev_capacity
    n_dev = mz * my * mx

    def owner_of(col, m):
        w = cfg.box_dim / m
        return np.clip((pos[:, col] / w).astype(np.int64), 0, m - 1)

    owner = (owner_of(2, mz) * my + owner_of(1, my)) * mx + owner_of(0, mx)

    gx = np.zeros((n_dev, c_dev, 3), np.float32)
    gv = np.zeros((n_dev, c_dev, 3), np.float32)
    gvalid = np.zeros((n_dev, c_dev), bool)
    gpid = np.full((n_dev, c_dev), -1, np.int32)
    for dev in range(n_dev):
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

    sharding = NamedSharding(mesh, P(("z", "y", "x")))
    put = lambda a: jax.device_put(
        a.reshape(n_dev * c_dev, *a.shape[2:]), sharding
    )
    return DistState(put(gx), put(gv), put(gvalid), put(gpid))
