"""Pallas TPU megakernels for the SPH density and force passes.

These are the speed-of-light replacements for the XLA tile passes in
engine/step.py (same math, same masks — kernelUpdatePressureAndDensity and
kernelUpdateForces, /root/reference/src/simulator.cu:149-256). Design:

  * Particles sorted by row-major cell key (neighbors/cell_list.py); candidate
    fields live in HBM as small *field-major* matrices (fields × particles) so
    a tile's stencil column is ONE contiguous dynamic slice per column.
  * Grid = one program per tile of PT sorted targets. The 9 (dy,dz) stencil
    columns are DMA'd HBM→VMEM with double buffering (column c+1 in flight
    while column c computes).
  * Column candidate counts are dynamic: the kernel loops over ceil(cnt/128)
    live 128-lane blocks only — dead blocks are skipped, so compute scales
    with occupancy instead of with the static capacity (the waste that bounds
    the pure-XLA path).
  * Per-pair flat-key-difference masking assigns every stencil pair to exactly
    one column (the 27 accepted diffs are disjoint), so overlapping column
    ranges never double-count (same invariant as the XLA tile path).

Capacity (col_cap) overflow is detected in the jnp prep step (tile_columns),
never inside the kernel, and the driver re-traces larger.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpusph.core.config import SimConfig

LANES = 128


def _offsets(cfg: SimConfig) -> list[int]:
    c = cfg.num_cells_per_dim
    return [dy * c + dz * c * c for dz in (-1, 0, 1) for dy in (-1, 0, 1)]


def tile_columns(key_s, valid_s, starts, cfg: SimConfig, pt: int, col_cap: int):
    """Per-tile stencil-column ranges (jnp prep, cheap).
    Returns (col_start i32[ntiles,9], col_cnt i32[ntiles,9], overflow i32)."""
    n = key_s.shape[0]
    nc = cfg.num_cells
    ntiles = n // pt
    tk = key_s.reshape(ntiles, pt)
    tv = valid_s.reshape(ntiles, pt)
    kmin = jnp.min(jnp.where(tv, tk, nc), axis=1)
    kmax = jnp.max(jnp.where(tv, tk, -1), axis=1)
    offs = jnp.asarray(_offsets(cfg), jnp.int32)
    lo = jnp.clip(kmin[:, None] + offs[None, :] - 1, 0, nc)
    hi = jnp.clip(kmax[:, None] + offs[None, :] + 2, lo, nc)
    start = starts[lo]
    end = starts[hi]
    # 128-align the DMA start: leading extra lanes hold particles from cells
    # below `lo`, which the per-pair key mask rejects exactly, so alignment
    # costs nothing but lanes.
    astart = (start // 128) * 128
    cnt = end - astart
    overflow = jnp.sum(jnp.maximum(cnt - col_cap, 0)).astype(jnp.int32)
    # flattened [ntiles*9] so the SMEM prefetch buffers aren't lane-padded
    return (
        astart.astype(jnp.int32).reshape(-1),
        jnp.minimum(cnt, col_cap).astype(jnp.int32).reshape(-1),
        overflow,
    )


def _pad_cols(mat: jnp.ndarray, col_cap: int, rho_row: int | None = None):
    """Pad the field-major candidate matrix with col_cap junk columns so a
    dynamic slice starting at n never clamps. Padding ρ is 1 (never hit, but
    keeps the divide finite)."""
    rows, _ = mat.shape
    pad = jnp.zeros((rows, col_cap), mat.dtype)
    if rho_row is not None:
        pad = pad.at[rho_row].set(1.0)
    return jnp.concatenate([mat, pad], axis=1)


# ---------------------------------------------------------------- density

def _density_kernel(
    col_start_ref, col_cnt_ref, tgt_ref, cols_hbm, rho_ref, cand, sem, *, cfg, col_cap
):
    i = pl.program_id(0)
    pt = tgt_ref.shape[0]
    h2 = jnp.float32(cfg.h2)
    dk = jnp.float32(cfg.d_kernel_coeff)
    cdim = jnp.float32(cfg.num_cells_per_dim)

    tx = tgt_ref[:, 0:1]
    ty = tgt_ref[:, 1:2]
    tz = tgt_ref[:, 2:3]
    tkey = tgt_ref[:, 3:4]

    def get_dma(c):
        return pltpu.make_async_copy(
            cols_hbm.at[:, pl.ds(pl.multiple_of(col_start_ref[i * 9 + c], 128), col_cap)],
            cand.at[c],
            sem.at[c],
        )

    for c0 in range(9):  # issue all column DMAs upfront (deep pipeline)
        get_dma(c0).start()
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1).astype(jnp.float32)

    def col_body(c, acc):
        slot = c
        get_dma(c).wait()
        cnt = col_cnt_ref[i * 9 + c].astype(jnp.float32)
        cf = c.astype(jnp.float32)
        off = (jnp.mod(cf, 3.0) - 1.0) * cdim + (jnp.floor(cf / 3.0) - 1.0) * cdim * cdim

        def blk(b, acc):
            s = pl.multiple_of(b * LANES, LANES)
            cx = cand[slot, 0, pl.ds(s, LANES)][None, :]
            cy = cand[slot, 1, pl.ds(s, LANES)][None, :]
            cz = cand[slot, 2, pl.ds(s, LANES)][None, :]
            ck = cand[slot, 3, pl.ds(s, LANES)][None, :]
            dx = tx - cx
            dy = ty - cy
            dz = tz - cz
            r2 = dx * dx + dy * dy + dz * dz
            diff = ck - tkey  # f32-exact: keys < 2^24
            live = (
                (diff >= off - 1.0)
                & (diff <= off + 1.0)
                & (lane + s.astype(jnp.float32) < cnt)
                & (r2 <= h2)
            )
            w = h2 - r2
            w = w * w * w
            return acc + jnp.where(live, w, 0.0)

        nb = pl.cdiv(col_cnt_ref[i * 9 + c], LANES)
        return jax.lax.fori_loop(0, nb, blk, acc)

    acc = jax.lax.fori_loop(0, 9, col_body, jnp.zeros((pt, LANES), jnp.float32))
    rho_ref[0, 0, :] = jnp.float32(cfg.mass) * dk * jnp.sum(acc, axis=1)


def density_pallas(sp, key_s, starts_cols, cfg: SimConfig, *, interpret=False):
    """sp f32[n,3] sorted positions; starts_cols = (col_start, col_cnt) from
    tile_columns. Returns raw density f32[n] (pre-clamp)."""
    n = sp.shape[0]
    pt = cfg.pallas_tile
    col_cap = cfg.pallas_col_capacity
    ntiles = n // pt
    col_start, col_cnt = starts_cols

    cols = jnp.concatenate([sp.T, key_s[None, :].astype(jnp.float32)])
    cols = jnp.concatenate(
        [cols, jnp.zeros((8 - cols.shape[0], cols.shape[1]), cols.dtype)]
    )
    cols = _pad_cols(cols, col_cap)  # (8, n+cap)
    tgts = jnp.concatenate([sp, key_s[:, None].astype(jnp.float32)], axis=1)  # (n,4)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(ntiles,),
        in_specs=[
            pl.BlockSpec((pt, 4), lambda i, *_: (i, 0)),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec((1, 1, pt), lambda i, *_: (i, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((9, 8, col_cap), jnp.float32),
            pltpu.SemaphoreType.DMA((9,)),
        ],
    )
    rho = pl.pallas_call(
        functools.partial(_density_kernel, cfg=cfg, col_cap=col_cap),
        out_shape=jax.ShapeDtypeStruct((ntiles, 1, pt), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(col_start, col_cnt, tgts, cols)
    return rho.reshape(n)


# ---------------------------------------------------------------- forces

def _force_kernel(
    col_start_ref, col_cnt_ref, tgt_ref, cols_hbm, f_ref, cand, sem, *, cfg, col_cap
):
    i = pl.program_id(0)
    pt = tgt_ref.shape[0]
    h = jnp.float32(cfg.h)
    h2 = jnp.float32(cfg.h2)
    eps = jnp.float32(cfg.eps)
    m = jnp.float32(cfg.mass)
    vk = jnp.float32(cfg.v_kernel_coeff)
    mu = jnp.float32(cfg.viscosity)
    cdim = jnp.float32(cfg.num_cells_per_dim)

    tx = tgt_ref[:, 0:1]
    ty = tgt_ref[:, 1:2]
    tz = tgt_ref[:, 2:3]
    tvx = tgt_ref[:, 3:4]
    tvy = tgt_ref[:, 4:5]
    tvz = tgt_ref[:, 5:6]
    tp = tgt_ref[:, 6:7]
    tkey = tgt_ref[:, 7:8]

    def get_dma(c):
        return pltpu.make_async_copy(
            cols_hbm.at[:, pl.ds(pl.multiple_of(col_start_ref[i * 9 + c], 128), col_cap)],
            cand.at[c],
            sem.at[c],
        )

    for c0 in range(9):  # issue all column DMAs upfront (deep pipeline)
        get_dma(c0).start()
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1).astype(jnp.float32)

    def col_body(c, carry):
        fx, fy, fz = carry
        slot = c
        get_dma(c).wait()
        cnt = col_cnt_ref[i * 9 + c].astype(jnp.float32)
        cf = c.astype(jnp.float32)
        off = (jnp.mod(cf, 3.0) - 1.0) * cdim + (jnp.floor(cf / 3.0) - 1.0) * cdim * cdim

        def blk(b, carry):
            fx, fy, fz = carry
            s = pl.multiple_of(b * LANES, LANES)
            row = lambda r: cand[slot, r, pl.ds(s, LANES)][None, :]
            cx, cy, cz = row(0), row(1), row(2)
            cvx, cvy, cvz = row(3), row(4), row(5)
            crho, cp, ck = row(6), row(7), row(8)
            dx = tx - cx
            dy = ty - cy
            dz = tz - cz
            r2 = dx * dx + dy * dy + dz * dz
            r = jnp.sqrt(r2)
            diff = ck - tkey
            hit = (
                (diff >= off - 1.0)
                & (diff <= off + 1.0)
                & (lane + s.astype(jnp.float32) < cnt)
            )
            # pressure: −m(p_i+p_j)/(2ρ_j)·∇W_spiky  (cu:224-235, 99-117)
            live_p = hit & (r2 <= h2) & (r >= eps)
            safe_r = jnp.where(live_p, r, 1.0)
            hr = h - safe_r
            scale = (-vk) * hr * hr / safe_r
            s_p = (-m) * (tp + cp) / (2.0 * crho) * scale
            s_p = jnp.where(live_p, s_p, 0.0)
            fx = fx + s_p * dx
            fy = fy + s_p * dy
            fz = fz + s_p * dz
            # viscosity: μ m (v_j−v_i)·∇²W_visc/ρ_j  (cu:237-250, 119-130)
            live_v = hit & (r <= h) & (r >= eps)
            s_v = jnp.where(live_v, mu * m * vk * (h - r) / crho, 0.0)
            fx = fx + s_v * (cvx - tvx)
            fy = fy + s_v * (cvy - tvy)
            fz = fz + s_v * (cvz - tvz)
            return fx, fy, fz

        nb = pl.cdiv(col_cnt_ref[i * 9 + c], LANES)
        return jax.lax.fori_loop(0, nb, blk, (fx, fy, fz))

    zero = jnp.zeros((pt, LANES), jnp.float32)
    fx, fy, fz = jax.lax.fori_loop(0, 9, col_body, (zero, zero, zero))
    f_ref[0, :, 0] = jnp.sum(fx, axis=1)
    f_ref[0, :, 1] = jnp.sum(fy, axis=1)
    f_ref[0, :, 2] = jnp.sum(fz, axis=1)


def force_pallas(sp, sv, rho_s, p_s, key_s, starts_cols, cfg, *, interpret=False):
    """Returns force f32[n,3] for sorted targets."""
    n = sp.shape[0]
    pt = cfg.pallas_tile
    col_cap = cfg.pallas_col_capacity
    ntiles = n // pt
    col_start, col_cnt = starts_cols

    cols = jnp.concatenate(
        [sp.T, sv.T, rho_s[None, :], p_s[None, :], key_s[None, :].astype(jnp.float32)]
    )
    cols = jnp.concatenate(  # pad field rows 9→16 for sublane tiling
        [cols, jnp.zeros((16 - cols.shape[0], cols.shape[1]), cols.dtype)]
    )
    cols = _pad_cols(cols, col_cap, rho_row=6)  # (16, n+cap)
    tgts = jnp.concatenate(
        [sp, sv, p_s[:, None], key_s[:, None].astype(jnp.float32)], axis=1
    )  # (n, 8)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(ntiles,),
        in_specs=[
            pl.BlockSpec((pt, 8), lambda i, *_: (i, 0)),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec((1, pt, 3), lambda i, *_: (i, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((9, 16, col_cap), jnp.float32),
            pltpu.SemaphoreType.DMA((9,)),
        ],
    )
    f = pl.pallas_call(
        functools.partial(_force_kernel, cfg=cfg, col_cap=col_cap),
        out_shape=jax.ShapeDtypeStruct((ntiles, pt, 3), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(col_start, col_cnt, tgts, cols)
    return f.reshape(n, 3)
