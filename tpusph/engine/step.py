"""One SPH timestep — the TPU-native equivalent of the reference's four-kernel
launch sequence (kernelBuildGrid → kernelUpdatePressureAndDensity →
kernelUpdateForces → kernelUpdatePositions → kernelResetGrid,
/root/reference/src/simulator.cu:462-497), fused into a single jitted function.

Interchangeable backends with identical physics:
  * step_allpairs      — O(N²) oracle (tests / small N).
  * step_cell_list     — sort-based cell lists, XLA tile passes (runs anywhere).
  * step_pallas        — fused Pallas megakernels (the TPU production path).
  * step_pallas_sorted — same, returning state in sorted order (fastest for
    chained loops; physics is permutation-invariant).

The sorted paths compute in *sorted* particle order (gather once, work on
contiguous data); step_cell_list/step_pallas scatter results back to the
caller's particle order, keeping stable particle identity exactly like the
reference's fixed particle array.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from tpusph.core.config import SimConfig
from tpusph.core.state import FluidState
from tpusph.neighbors.allpairs import density_allpairs, forces_allpairs
from tpusph.neighbors.cell_list import CellList, build_cell_list
from tpusph.physics.integrate import integrate
from tpusph.utils.chunking import pick_chunk
from tpusph.physics.kernels import pair_density, pair_force, pressure_from_density


class StepAux(NamedTuple):
    """Per-step diagnostics (the TPU analog of the reference's device-printf
    OOB warnings, simulator.cu:60-73, plus capacity-overflow accounting that
    the fixed-shape design requires)."""

    oob_count: jnp.ndarray  # int32[] — particles outside the grid
    window_overflow: jnp.ndarray  # int32[] — candidates beyond window capacity


def _tile_shape(n: int, cfg: SimConfig) -> tuple[int, int]:
    """(tile_size, candidate_capacity) with tile_size dividing n."""
    t = pick_chunk(n, cfg.tile_size)
    return t, cfg.tile_cand_capacity


def _tile_ranges(tkey, tvalid, offset: int, starts, cfg: SimConfig, cap: int):
    """Contiguous sorted-array range holding ALL candidates at flat-key offset
    `offset` for every valid target in the tile: keys span [kmin−1+off,
    kmax+2+off) in flat-cell space, which is one contiguous slice after the
    row-major sort. Returns (start, cnt, full_cnt)."""
    nc = cfg.num_cells
    big = jnp.int32(nc)
    kmin = jnp.min(jnp.where(tvalid, tkey, big))
    kmax = jnp.max(jnp.where(tvalid, tkey, -1))
    lo_cell = jnp.clip(kmin + offset - 1, 0, nc)
    hi_cell = jnp.clip(kmax + offset + 2, lo_cell, nc)
    start = starts[lo_cell]
    full_cnt = starts[hi_cell] - start
    return start, jnp.minimum(full_cnt, cap), full_cnt


def _column_offsets_py(cfg: SimConfig) -> list[int]:
    c = cfg.num_cells_per_dim
    return [dy * c + dz * c * c for dz in (-1, 0, 1) for dy in (-1, 0, 1)]


def _density_pass_sorted(sp, key_s, valid_s, starts, cfg: SimConfig):
    """Density + pressure for sorted targets (kernelUpdatePressureAndDensity,
    simulator.cu:149-190), tile formulation: each tile's 9 neighbor columns
    are contiguous dynamic slices shared by all targets in the tile (DMA
    traffic instead of per-element gathers). Returns (rho, p, overflow)."""
    n = sp.shape[0]
    t, cap = _tile_shape(n, cfg)
    offsets = _column_offsets_py(cfg)
    # pad so dynamic_slice never clamps (start ≤ n always holds)
    sp_pad = jnp.concatenate([sp, jnp.zeros((cap, 3), sp.dtype)])
    key_pad = jnp.concatenate(
        [key_s, jnp.full((cap,), jnp.int32(2**30), jnp.int32)]
    )
    lane = jnp.arange(cap, dtype=jnp.int32)

    def tile(args):
        tpos, tkey, tvalid = args
        rho = jnp.zeros((t,), jnp.float32)
        ovf = jnp.int32(0)
        for off in offsets:
            start, cnt, full = _tile_ranges(tkey, tvalid, off, starts, cfg, cap)
            cand = jax.lax.dynamic_slice(sp_pad, (start, 0), (cap, 3))
            ckey = jax.lax.dynamic_slice(key_pad, (start,), (cap,))
            # Tile slices can overlap across columns when the tile spans ≥C
            # cells; the key-difference mask assigns each stencil pair to
            # exactly one column (the 27 accepted diffs are disjoint).
            diff = ckey[None, :] - tkey[:, None]
            hit = (diff >= off - 1) & (diff <= off + 1) & (lane < cnt)[None, :]
            disp = tpos[:, None, :] - cand[None, :, :]
            w = pair_density(disp, cfg)  # [T, cap]
            rho += jnp.sum(jnp.where(hit, w, 0.0), axis=1)
            ovf += jnp.maximum(full - cap, 0)
        rho, p = pressure_from_density(rho, cfg)
        rho = jnp.where(tvalid, rho, 1.0)
        return rho, jnp.where(tvalid, p, 0.0), ovf

    rho, p, ovf = jax.lax.map(
        tile, (sp.reshape(-1, t, 3), key_s.reshape(-1, t), valid_s.reshape(-1, t))
    )
    return rho.reshape(-1), p.reshape(-1), jnp.sum(ovf).astype(jnp.int32)


def _force_pass_sorted(sp, sv, rho_s, p_s, key_s, valid_s, starts, cfg: SimConfig):
    """Pressure + viscosity forces for sorted targets (kernelUpdateForces,
    simulator.cu:192-256), tile formulation. Candidate fields are packed into
    one f32[n, 8] array so each column is a single dynamic slice."""
    n = sp.shape[0]
    t, cap = _tile_shape(n, cfg)
    offsets = _column_offsets_py(cfg)
    packed = jnp.concatenate([sp, sv, rho_s[:, None], p_s[:, None]], axis=1)
    pad = jnp.zeros((cap, 8), packed.dtype).at[:, 6].set(1.0)  # padding ρ=1
    packed = jnp.concatenate([packed, pad])
    key_pad = jnp.concatenate(
        [key_s, jnp.full((cap,), jnp.int32(2**30), jnp.int32)]
    )
    lane = jnp.arange(cap, dtype=jnp.int32)

    def tile(args):
        tpos, tvel, tp, tkey, tvalid = args
        f = jnp.zeros((t, 3), jnp.float32)
        for off in offsets:
            start, cnt, _ = _tile_ranges(tkey, tvalid, off, starts, cfg, cap)
            cand = jax.lax.dynamic_slice(packed, (start, 0), (cap, 8))
            ckey = jax.lax.dynamic_slice(key_pad, (start,), (cap,))
            diff = ckey[None, :] - tkey[:, None]
            hit = (diff >= off - 1) & (diff <= off + 1) & (lane < cnt)[None, :]
            disp = tpos[:, None, :] - cand[None, :, :3]
            dv = cand[None, :, 3:6] - tvel[:, None, :]
            fij = pair_force(
                disp, dv, tp[:, None], cand[None, :, 7], cand[None, :, 6], cfg
            )
            f += jnp.sum(jnp.where(hit[..., None], fij, 0.0), axis=1)
        return jnp.where(tvalid[:, None], f, 0.0)

    f = jax.lax.map(
        tile,
        (
            sp.reshape(-1, t, 3),
            sv.reshape(-1, t, 3),
            p_s.reshape(-1, t),
            key_s.reshape(-1, t),
            valid_s.reshape(-1, t),
        ),
    )
    return f.reshape(-1, 3)


def _finish(state: FluidState, force, density, pressure, cfg: SimConfig):
    """Integrate valid particles; freeze invalid padding slots."""
    x, v = integrate(state.position, state.velocity, force, density, cfg)
    valid3 = state.valid[:, None]
    return FluidState(
        position=jnp.where(valid3, x, state.position),
        velocity=jnp.where(valid3, v, state.velocity),
        force=force,
        density=density,
        pressure=pressure,
        valid=state.valid,
    )


def step_allpairs(state: FluidState, cfg: SimConfig):
    """Oracle timestep: O(N²) masked pairs, same physics and integration."""
    rho, p = density_allpairs(state.position, state.valid, cfg)
    f = forces_allpairs(state.position, state.velocity, rho, p, state.valid, cfg)
    new_state = _finish(state, f, rho, p, cfg)
    aux = StepAux(
        oob_count=jnp.int32(0),
        window_overflow=jnp.int32(0),
    )
    return new_state, aux


def build_phase(
    state: FluidState, cfg: SimConfig, interpret: bool = False
) -> CellList:
    """Neighbor-structure build — the timed "grid construction" phase
    (kernelBuildGrid, simulator.cu:505-513). Also subsumes kernelResetGrid:
    the structure is rebuilt from scratch each step."""
    return build_cell_list(state.position, state.valid, cfg, interpret)


def update_phase(state: FluidState, cl: CellList, cfg: SimConfig):
    """Density → forces → integrate — the timed "SPH update" phase
    (simulator.cu:516-529). Returns (new_state, aux)."""
    sp = state.position[cl.perm]
    sv = state.velocity[cl.perm]

    rho_s, p_s, ovf = _density_pass_sorted(
        sp, cl.key_sorted, cl.valid_sorted, cl.starts, cfg
    )
    f_s = _force_pass_sorted(
        sp, sv, rho_s, p_s, cl.key_sorted, cl.valid_sorted, cl.starts, cfg
    )

    # Scatter back to original order: sorted[i] corresponds to original[perm[i]].
    n = state.num_slots
    force = jnp.zeros((n, 3), jnp.float32).at[cl.perm].set(f_s)
    density = jnp.ones((n,), jnp.float32).at[cl.perm].set(rho_s)
    pressure = jnp.zeros((n,), jnp.float32).at[cl.perm].set(p_s)

    new_state = _finish(state, force, density, pressure, cfg)
    aux = StepAux(
        oob_count=cl.oob_count,
        window_overflow=ovf + cl.starts_overflow,
    )
    return new_state, aux


def step_cell_list(state: FluidState, cfg: SimConfig):
    """Production timestep: sort → cell ranges → windowed density/force →
    integrate → scatter back to original particle order."""
    cl = build_phase(state, cfg)
    return update_phase(state, cl, cfg)


def update_phase_pallas(state: FluidState, cl: CellList, cfg: SimConfig, interpret=False):
    """SPH-update phase with the Pallas megakernels (pallas/fused.py) in place
    of the XLA tile passes — identical math and masks."""
    from tpusph.pallas.fused import density_pallas, force_pallas, supertile_columns

    sp = state.position[cl.perm]
    sv = state.velocity[cl.perm]
    cols_info = supertile_columns(
        cl.key_sorted, cl.valid_sorted, cl.starts, cfg, interpret
    )
    ovf = cols_info.overflow
    xyz = (sp[:, 0], sp[:, 1], sp[:, 2])
    raw_rho = density_pallas(xyz, cl.key_sorted, cols_info, cfg, interpret=interpret)
    rho_s, p_s = pressure_from_density(raw_rho, cfg)
    rho_s = jnp.where(cl.valid_sorted, rho_s, 1.0)
    p_s = jnp.where(cl.valid_sorted, p_s, 0.0)
    f_s = force_pallas(
        xyz, (sv[:, 0], sv[:, 1], sv[:, 2]), rho_s, p_s, cl.key_sorted,
        cols_info, cfg, interpret=interpret,
    ).T
    f_s = jnp.where(cl.valid_sorted[:, None], f_s, 0.0)

    n = state.num_slots
    force = jnp.zeros((n, 3), jnp.float32).at[cl.perm].set(f_s)
    density = jnp.ones((n,), jnp.float32).at[cl.perm].set(rho_s)
    pressure = jnp.zeros((n,), jnp.float32).at[cl.perm].set(p_s)
    new_state = _finish(state, force, density, pressure, cfg)
    aux = StepAux(
        oob_count=cl.oob_count,
        window_overflow=ovf + cl.starts_overflow,
    )
    return new_state, aux


def step_pallas(state: FluidState, cfg: SimConfig, interpret=False):
    """Fused-megakernel timestep (BASELINE.json config #4)."""
    cl = build_phase(state, cfg, interpret=interpret)
    return update_phase_pallas(state, cl, cfg, interpret=interpret)


class FieldsState(NamedTuple):
    """Hot-loop particle state as 1-D field rows — the layout the fields-
    native step carries across chained steps. No (N,3) array is ever
    materialized inside the loop: payload sort emits rows, the Pallas kernels
    consume and produce rows, integration runs per axis. Convert with
    fields_from_state / state_from_fields at the loop boundary."""

    x: jnp.ndarray  # f32[N]
    y: jnp.ndarray
    z: jnp.ndarray
    vx: jnp.ndarray
    vy: jnp.ndarray
    vz: jnp.ndarray
    valid: jnp.ndarray  # bool[N]


def fields_from_state(state: FluidState) -> FieldsState:
    p, v = state.position, state.velocity
    return FieldsState(
        p[:, 0], p[:, 1], p[:, 2], v[:, 0], v[:, 1], v[:, 2], state.valid
    )


def state_from_fields(fs: FieldsState, density=None, pressure=None) -> FluidState:
    n = fs.x.shape[0]
    return FluidState(
        position=jnp.stack([fs.x, fs.y, fs.z], axis=1),
        velocity=jnp.stack([fs.vx, fs.vy, fs.vz], axis=1),
        force=jnp.zeros((n, 3), jnp.float32),
        density=density if density is not None else jnp.ones((n,), jnp.float32),
        pressure=pressure if pressure is not None else jnp.zeros((n,), jnp.float32),
        valid=fs.valid,
    )


def step_pallas_fields(fs: FieldsState, cfg: SimConfig, interpret=False):
    """Fields-native fused-megakernel timestep, returning state in SORTED
    order (physics is permutation-invariant; the valid mask travels with the
    particles). This is the production chained-loop path: state stays as 1-D
    field rows end to end — payload sort (one lax.sort carrying the six field
    lanes with the keys), row-consuming/row-producing kernels, per-axis
    integration — so no (N,3) relayout ever happens inside the loop.
    Returns ((FieldsState, rho_s, p_s, force_rows), aux)."""
    from tpusph.neighbors.cell_list import build_sorted_fields_1d
    from tpusph.pallas.fused import density_pallas, force_pallas, supertile_columns
    from tpusph.physics.integrate import integrate_fields

    sf = build_sorted_fields_1d(
        fs.x, fs.y, fs.z, fs.vx, fs.vy, fs.vz, fs.valid, cfg,
        interpret=interpret,
    )
    valid_s = sf.valid_sorted
    cols_info = supertile_columns(sf.key_sorted, valid_s, sf.starts, cfg,
                                  interpret)
    ovf = cols_info.overflow + sf.starts_overflow
    xyz = (sf.x, sf.y, sf.z)
    raw_rho = density_pallas(xyz, sf.key_sorted, cols_info, cfg, interpret=interpret)
    rho_s, p_s = pressure_from_density(raw_rho, cfg)
    rho_s = jnp.where(valid_s, rho_s, 1.0)
    p_s = jnp.where(valid_s, p_s, 0.0)
    f_rows = force_pallas(
        xyz, (sf.vx, sf.vy, sf.vz), rho_s, p_s, sf.key_sorted, cols_info, cfg,
        interpret=interpret,
    )
    fx = jnp.where(valid_s, f_rows[0], 0.0)
    fy = jnp.where(valid_s, f_rows[1], 0.0)
    fz = jnp.where(valid_s, f_rows[2], 0.0)

    x, y, z, vx, vy, vz = integrate_fields(
        sf.x, sf.y, sf.z, sf.vx, sf.vy, sf.vz, fx, fy, fz, rho_s, cfg
    )
    x = jnp.where(valid_s, x, sf.x)
    y = jnp.where(valid_s, y, sf.y)
    z = jnp.where(valid_s, z, sf.z)
    vx = jnp.where(valid_s, vx, sf.vx)
    vy = jnp.where(valid_s, vy, sf.vy)
    vz = jnp.where(valid_s, vz, sf.vz)
    out = FieldsState(x, y, z, vx, vy, vz, valid_s)
    aux = StepAux(oob_count=sf.oob_count, window_overflow=ovf)
    return (out, rho_s, p_s, (fx, fy, fz)), aux


def step_pallas_sorted(state: FluidState, cfg: SimConfig, interpret=False):
    """Fused-megakernel timestep that RETURNS STATE IN SORTED ORDER instead of
    scattering back to the caller's particle order (the reference draws
    unordered blue points, display.cpp:52-57 — identity is irrelevant for
    rendering). Use step_pallas when stable identity matters (golden
    trajectories, checkpoints). (N,3) wrapper around step_pallas_fields; for
    chained loops carry FieldsState directly and skip the relayouts."""
    (fs, rho_s, p_s, f_rows), aux = step_pallas_fields(
        fields_from_state(state), cfg, interpret=interpret
    )
    new_state = state_from_fields(fs, density=rho_s, pressure=p_s)
    new_state = new_state._replace(force=jnp.stack(f_rows, axis=1))
    return new_state, aux


BACKENDS = {
    "allpairs": step_allpairs,
    "cell_list": step_cell_list,
    "pallas": step_pallas,
}


def make_step(cfg: SimConfig, backend: str = "cell_list"):
    """Jitted `state -> (state, aux)` with cfg baked in as a static constant
    (the analog of CUDA __constant__ deviceSettings, simulator.cu:19)."""
    from functools import partial

    from tpusph.core.config import compiler_opts

    fn = BACKENDS[backend]

    @partial(jax.jit, compiler_options=compiler_opts(cfg))
    def step(state: FluidState):
        return fn(state, cfg)

    return step
