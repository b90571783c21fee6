"""3-D brick-mesh spatial sharding — the full generalization of the z-slab
layer in dist/sharded.py (SURVEY.md §7.10: "1-D (then 3-D) mesh").

The box is split into bricks over a (z, y, x) `jax.sharding.Mesh`; each device
owns the particles resident in its brick. The 27-neighborhood communication
uses the STAGED-AXIS scheme — three face exchanges instead of 26 point-to-point
sends, with edge/corner data forwarded transitively:

  staged 2h halo exchange (positions+velocities, ONE round):
    phase z: pack local particles within 2h of the brick's z faces, ppermute
             along the z axis → halo set Hz.
    phase y: pack from local ∪ Hz within 2h of the y faces, ppermute along y
             → Hy (z-edge/corner particles ride along).
    phase x: pack from local ∪ Hz ∪ Hy within 2h of the x faces → Hx.
  The final set covers the full L∞-2h shell, so every halo copy within h of
  the brick sees ALL of its own neighbors locally — its locally-computed
  ρ/p is exact and no second "authoritative ρ/p" round is needed (same
  argument as the 1-D slab layer, dist/sharded.py). Requires brick width
  ≥ 2h per axis (checked at build).
  density + force on the tuned fields-native hot path (one payload sort +
  fused megakernels, _compute_sorted_fields); integrate local rows.
  migration: three one-hop phases (z, then y, then x), each packing both
  direction buffers from ONE category sort with arrivals APPENDED, so a
  diagonal brick-corner crosser reaches its owner within one step via
  axis-by-axis hops; a final kept-first sort compacts the state.

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

from tpusph.core.config import SimConfig, compiler_opts
from tpusph.core.state import FluidState
from tpusph.dist.sharded import (
    DistAux,
    DistState,
    _compute_sorted_fields,
    _halo_buffers,
)
from tpusph.interact.impulse import click_kick_fields
from tpusph.neighbors.grid import compute_keys_fields
from tpusph.physics.integrate import integrate_fields

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


def _check_brick_widths(cfg: SimConfig, mcfg: Mesh3DConfig) -> None:
    """The 2h ghost layer needs bricks at least 2h wide per axis (see
    sharded.py's slab-width check)."""
    for ax_i, m in enumerate(mcfg.mesh_shape):
        if cfg.box_dim / m < 2 * cfg.h:
            raise ValueError(
                f"brick width {cfg.box_dim / m:.4f} along {AXES[ax_i]} < "
                f"2h = {2 * cfg.h:.4f}: at most "
                f"{int(cfg.box_dim // (2 * cfg.h))} devices per axis"
            )


def _device_step3d(
    pos, vel, valid, pid, click_cell, click_active,
    cfg: SimConfig, mcfg: Mesh3DConfig,
    use_pallas: bool = False, interpret: bool = False,
    with_click: bool = True,
):
    """One timestep on one device's brick (runs under shard_map over AXES) —
    the fields-native 2h-ghost-layer design of the 1-D slab step
    (dist/sharded.py), generalized with staged per-axis exchanges:

      * staged 2h halos: phase z packs local rows within 2h of the z faces;
        phase y packs from local ∪ Hz (corner rows ride along); phase x
        from local ∪ Hz ∪ Hy. The final set covers the full L∞-2h shell,
        so every halo copy within h of the brick has ALL its neighbors
        present — its locally-computed ρ/p is exact and the old
        "authoritative ρ/p" second round disappears.
      * physics on the tuned fields-native hot path (one payload sort +
        fused megakernels, _compute_sorted_fields).
      * migration: one hop per axis z → y → x on the sorted rows; each
        axis packs both direction buffers from ONE category sort, marks
        departures (tag −2), and APPENDS arrivals so diagonal crossers
        join the later axes' hops. A final kept-first sort compacts the
        state back to dev_capacity rows.
    """
    halo_w = jnp.float32(2.0 * cfg.h)
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

    # ---- staged 2h halo exchange (z → y → x), fields-native
    rows = [pos[:, 0], pos[:, 1], pos[:, 2], vel[:, 0], vel[:, 1], vel[:, 2]]
    cvalid = valid
    tag = jnp.where(valid, pid, jnp.int32(-1))
    halo_ovf = jnp.int32(0)
    for ax_i, ax in enumerate(AXES):
        m = mcfg.mesh_shape[ax_i]
        h_cap = mcfg.halo_capacity[ax_i]
        perm_up, perm_dn = _axis_perms(m)
        coord = rows[AXIS_DIM[ax]]
        send_dn = cvalid & (coord < lo[ax] + halo_w)
        send_up = cvalid & (coord >= hi[ax] - halo_w)
        disjoint = cfg.box_dim / m >= 4 * cfg.h  # static
        dn6, dn_valid, up6, up_valid, ovf = _halo_buffers(
            *rows, send_dn, send_up, h_cap, disjoint
        )
        lo6 = _pshift(up6, ax, perm_up)  # halo from the device below
        lo_valid = _pshift(up_valid, ax, perm_up)
        hi6 = _pshift(dn6, ax, perm_dn)  # halo from the device above
        hi_valid = _pshift(dn_valid, ax, perm_dn)
        rows = [
            jnp.concatenate([r, lo6[:, j], hi6[:, j]])
            for j, r in enumerate(rows)
        ]
        cvalid = jnp.concatenate([cvalid, lo_valid, hi_valid])
        tag = jnp.concatenate([tag, jnp.full((2 * h_cap,), -2, jnp.int32)])
        halo_ovf = halo_ovf + ovf

    # invalid/stale slots parked at origin (physically inert — sharded.py)
    for j in range(3):
        rows[j] = jnp.where(cvalid, rows[j], 0.0)

    # ---- physics on the tuned fields-native hot path
    key, oob_count = compute_keys_fields(rows[0], rows[1], rows[2], cvalid,
                                         cfg)
    key_s, sx, sy, sz, svx, svy, svz, tag_s = lax.sort(
        (key, *rows, tag), num_keys=1, is_stable=True
    )
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

    # click impulse (free-mode parity): pre-step cells, before migration;
    # the scan-chained run skips it statically (see sharded.py)
    if with_click:
        kx, ky, kz = click_kick_fields(sx, sy, sz, live, click_cell, cfg)
        ca = click_active.astype(jnp.float32)
        nvx = nvx + kx * ca
        nvy = nvy + ky * ca
        nvz = nvz + kz * ca

    # ---- migration: one hop per axis, z → y → x, on sorted rows
    cr = [nx, ny, nz, nvx, nvy, nvz]
    ctag = tag_s
    mig_ovf = jnp.int32(0)
    misrouted = jnp.int32(0)
    for ax_i, ax in enumerate(AXES):
        m = mcfg.mesh_shape[ax_i]
        m_cap = mcfg.migration_capacity[ax_i]
        w = widths[ax]
        perm_up, perm_dn = _axis_perms(m)
        lv = ctag >= 0
        coord = cr[AXIS_DIM[ax]]
        mig_dn = lv & (coord < lo[ax])
        mig_up = lv & (coord >= hi[ax])
        misrouted = misrouted + jnp.sum(
            lv & ((coord < lo[ax] - w) | (coord >= hi[ax] + w))
        ).astype(jnp.int32)
        n_dn = jnp.sum(mig_dn).astype(jnp.int32)
        n_up = jnp.sum(mig_up).astype(jnp.int32)
        mig_ovf = mig_ovf + jnp.maximum(n_dn - m_cap, 0) + jnp.maximum(
            n_up - m_cap, 0
        )
        # one category sort: dn-senders to the front, up-senders to the back
        cat = jnp.where(mig_dn, 0, jnp.where(mig_up, 2, 1)).astype(jnp.int32)
        _, m0, m1, m2, m3, m4, m5, mtag = lax.sort(
            (cat, *cr, ctag), num_keys=1, is_stable=True
        )
        srows = [m0, m1, m2, m3, m4, m5]
        total = m0.shape[0]
        lane = jnp.arange(m_cap, dtype=jnp.int32)
        dn6 = jnp.stack([r[:m_cap] for r in srows], axis=1)
        dn_tag = mtag[:m_cap]
        dn_valid = lane < n_dn
        t0 = total - m_cap
        up6 = jnp.stack([r[t0:] for r in srows], axis=1)
        up_tag = mtag[t0:]
        up_valid = lane >= (m_cap - jnp.minimum(n_up, m_cap))
        # departures become invalid locally (front n_dn / back n_up rows)
        pos_i = jnp.arange(total, dtype=jnp.int32)
        mtag = jnp.where(
            (pos_i < n_dn) | (pos_i >= total - n_up), jnp.int32(-2), mtag
        )

        in_lo6 = _pshift(up6, ax, perm_up)  # arrivals from below
        in_lo_tag = _pshift(up_tag, ax, perm_up)
        in_lo_valid = _pshift(up_valid, ax, perm_up)
        in_hi6 = _pshift(dn6, ax, perm_dn)  # arrivals from above
        in_hi_tag = _pshift(dn_tag, ax, perm_dn)
        in_hi_valid = _pshift(dn_valid, ax, perm_dn)
        inc6 = jnp.concatenate([in_lo6, in_hi6])
        inc_tag = jnp.concatenate([in_lo_tag, in_hi_tag])
        inc_valid = jnp.concatenate([in_lo_valid, in_hi_valid])
        inc_tag = jnp.where(inc_valid, inc_tag, jnp.int32(-2))
        inc6 = jnp.where(inc_valid[:, None], inc6, 0.0)
        # APPEND arrivals: they participate in the later axes' hops
        cr = [jnp.concatenate([srows[j], inc6[:, j]]) for j in range(6)]
        ctag = jnp.concatenate([mtag, inc_tag])

    # ---- final state: kept rows compacted to the front c_dev slots
    kept = ctag >= 0
    skey = jnp.where(kept, 0, 1).astype(jnp.int32)
    _, o0, o1, o2, o3, o4, o5, otag = lax.sort(
        (skey, *cr, ctag), num_keys=1, is_stable=True
    )
    n_kept = jnp.sum(kept).astype(jnp.int32)
    mig_ovf = mig_ovf + jnp.maximum(n_kept - c_dev, 0)
    valid_new = jnp.arange(c_dev, dtype=jnp.int32) < jnp.minimum(
        n_kept, c_dev
    )
    x = jnp.stack([o0[:c_dev], o1[:c_dev], o2[:c_dev]], axis=1)
    v = jnp.stack([o3[:c_dev], o4[:c_dev], o5[:c_dev]], axis=1)
    pid_new = jnp.where(valid_new, otag[:c_dev], jnp.int32(-1))

    aux = DistAux(
        halo_overflow=lax.psum(halo_ovf, AXES),
        migration_overflow=lax.psum(mig_ovf, AXES),
        window_overflow=lax.psum(ovf_w, AXES),
        oob_count=lax.psum(oob_count, AXES),
        misrouted=lax.psum(misrouted, AXES),
        num_particles=lax.psum(jnp.sum(valid_new).astype(jnp.int32), AXES),
    )
    return x, v, valid_new, pid_new, aux


def make_mesh3d_step(
    cfg: SimConfig, mcfg: Mesh3DConfig, mesh: Mesh,
    use_pallas: bool = False, interpret: bool = False,
):
    """Jitted brick-sharded `DistState -> (DistState, DistAux)`."""
    mcfg.validate()
    _check_brick_widths(cfg, mcfg)
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

    @partial(jax.jit, compiler_options=compiler_opts(cfg))
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
    _check_brick_widths(cfg, mcfg)
    spec = P(AXES)
    zero_cell = jnp.zeros((2,), jnp.int32)
    inactive = jnp.zeros((), bool)

    def device_run(pos, vel, valid, pid):
        def body(carry, _):
            pos, vel, valid, pid = carry
            x, v, valid2, pid2, aux = _device_step3d(
                pos, vel, valid, pid, zero_cell, inactive, cfg, mcfg,
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
