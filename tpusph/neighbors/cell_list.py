"""Sort-based cell lists — the one TPU-native neighbor structure that replaces
all three CUDA variants (lock-free CAS linked lists on `main`, index sort,
Morton z-index sort; /root/reference/README.md:5).

Design (no atomics, no pointer chasing, fully static shapes):

  1. key[i] = x + C·y + C²·z  (row-major, x fastest — the reference's own
     flatten, simulator.cu:78-82). Invalid slots get sentinel `num_cells`.
  2. Stable argsort of keys → particles of the same cell are contiguous, and
     the 3 x-adjacent cells of a (y,z) column are contiguous too.
  3. starts[k] = #particles with key < k (bincount + exclusive cumsum) — the
     TPU analog of the per-cell list heads (simulator.cu:133-147), rebuilt
     every step, which also subsumes kernelResetGrid (simulator.cu:321-326).
  4. The 27-cell stencil (simulator.cu:163-185) becomes **9 contiguous
     windows**: for neighbor column (dy,dz), candidates live in the flat-key
     range [key−1+dy·C+dz·C², key+2+dy·C+dz·C²) — a fixed-capacity dynamic
     slice of the sorted arrays, masked by the true range length.

Boundary note: at domain edges a window can wrap into cells on the far side of
the box (flat-key arithmetic wraps rows). Those candidates are ≥ (C−2)·h away,
so the exact r ≤ h kernel masks zero them — correctness never depends on the
window contents, only on the distance test, mirroring how the reference's
27-cell walk over-scans and relies on the same cutoff.

Window capacity is static (cfg.window_capacity); occupancy beyond it is
*detected* (overflow count in the step aux) so the engine can re-trace with a
larger capacity instead of silently dropping interactions.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from tpusph.core.config import SimConfig
from tpusph.neighbors.grid import compute_keys, compute_keys_fields


def starts_table(key, cfg: SimConfig) -> jnp.ndarray:
    """starts[k] = #particles with key < k, as an int32[num_cells + 2] table,
    via bincount scatter-add + exclusive cumsum.

    The scatter-add costs ~1.8 ms at 262k on v5e — the entire build-phase
    cost (the 7-lane payload sort is 0.05 ms) — and every alternative
    measured WORSE on this stack (scripts/build_bench.py, slope method):
    `indices_are_sorted` hint 2.3, boundary-scatter + reverse-cummin 2.5,
    two-sort merge with the cell boundaries 3.9, jnp.searchsorted on just
    the ~26k needed window bounds 11.7 (default scan lowering) / 1.84
    (method="sort"). Scatter cost scales with the INDEX count, not the
    table size (32k indices ≈ free, 4k-bin table still 1.7 ms), so coarse
    tables don't help either. The histogram stays."""
    counts = jnp.zeros((cfg.num_cells + 1,), jnp.int32).at[key].add(1)
    return jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts, dtype=jnp.int32)]
    )


def starts_from_sorted(key, key_sorted, cfg: SimConfig, interpret=False):
    """(starts, overflow) for API symmetry with the retired table-rank
    kernel. The histogram is DEAD CODE in the tuned production step —
    pallas_rank_prep resolves every lookup by rank and XLA DCEs the table
    — and live only for the XLA tile fallback. (A Pallas table-rank
    kernel, the old pallas/starts.py, measured NEGATIVE here: 0.13 ms
    @262k for the nearly-sorted production scatter vs the kernel's 2.4+;
    its chunked outer-compare design lives on as pallas/qrank.py, which
    ranks the ~0.3·N explicit window queries instead of all table cells.)
    """
    return starts_table(key, cfg), jnp.int32(0)


class CellList(NamedTuple):
    perm: jnp.ndarray  # int32[Np] — sorted[i] = original[perm[i]]
    key_sorted: jnp.ndarray  # int32[Np]
    starts: jnp.ndarray  # int32[num_cells + 2] — exclusive prefix counts
    valid_sorted: jnp.ndarray  # bool[Np]
    oob_count: jnp.ndarray  # int32[] diagnostic (reference printf, cu:60-73)
    starts_overflow: jnp.ndarray  # int32[] rank-kernel kcap overflow


def build_cell_list(
    position: jnp.ndarray, valid: jnp.ndarray, cfg: SimConfig,
    interpret: bool = False,
) -> CellList:
    """One sorted pass replaces kernelBuildGrid + kernelResetGrid."""
    keys = compute_keys(position, valid, cfg)
    perm = jnp.argsort(keys.key, stable=True).astype(jnp.int32)
    key_sorted = keys.key[perm]
    starts, s_ovf = starts_from_sorted(keys.key, key_sorted, cfg, interpret)
    return CellList(
        perm=perm,
        key_sorted=key_sorted,
        starts=starts,
        valid_sorted=key_sorted < cfg.num_cells,
        oob_count=keys.oob_count,
        starts_overflow=s_ovf,
    )


class SortedFields(NamedTuple):
    """Cell-sorted particle fields as 1-D arrays — the payload-sort fast path
    for order-free steps (step_pallas_sorted). One lax.sort moves the six
    field lanes through the sort network alongside the keys, replacing
    argsort + two (N,3) gathers (measured ~7 ms at 262k on v5e: XLA's
    element-wise gather path) and the kernel-input transposes (sorted fields
    arrive as rows already)."""

    key_sorted: jnp.ndarray  # int32[Np]
    x: jnp.ndarray  # f32[Np]
    y: jnp.ndarray
    z: jnp.ndarray
    vx: jnp.ndarray
    vy: jnp.ndarray
    vz: jnp.ndarray
    starts: jnp.ndarray  # int32[num_cells + 2]
    valid_sorted: jnp.ndarray  # bool[Np]
    oob_count: jnp.ndarray  # int32[]
    starts_overflow: jnp.ndarray  # int32[] rank-kernel kcap overflow


def build_sorted_fields_1d(
    x, y, z, vx, vy, vz, valid, cfg: SimConfig, interpret: bool = False
) -> SortedFields:
    """Payload sort on 1-D field rows: one stable lax.sort carries
    (key, x, y, z, vx, vy, vz)."""
    key, oob_count = compute_keys_fields(x, y, z, valid, cfg)
    key_sorted, x, y, z, vx, vy, vz = jax.lax.sort(
        (key, x, y, z, vx, vy, vz), num_keys=1, is_stable=True
    )
    starts, s_ovf = starts_from_sorted(key, key_sorted, cfg, interpret)
    return SortedFields(
        key_sorted=key_sorted, x=x, y=y, z=z, vx=vx, vy=vy, vz=vz,
        starts=starts,
        valid_sorted=key_sorted < cfg.num_cells,
        oob_count=oob_count,
        starts_overflow=s_ovf,
    )


def build_sorted_fields(
    position: jnp.ndarray, velocity: jnp.ndarray, valid: jnp.ndarray,
    cfg: SimConfig, interpret: bool = False,
) -> SortedFields:
    """(N,3) wrapper around build_sorted_fields_1d."""
    return build_sorted_fields_1d(
        position[:, 0], position[:, 1], position[:, 2],
        velocity[:, 0], velocity[:, 1], velocity[:, 2], valid, cfg,
        interpret=interpret,
    )


def _column_offsets(cfg: SimConfig) -> jnp.ndarray:
    """Flat-key offsets of the 9 (dy,dz) neighbor columns."""
    c = cfg.num_cells_per_dim
    offs = [dy * c + dz * c * c for dz in (-1, 0, 1) for dy in (-1, 0, 1)]
    return jnp.asarray(offs, jnp.int32)


def window_candidates(
    target_key: jnp.ndarray, starts: jnp.ndarray, n_sorted: int, cfg: SimConfig
):
    """Candidate neighbor indices (into the *sorted* arrays) for each target.

    target_key: int32[B]; n_sorted = total sorted slots (for index clamping).
    Returns (idx int32[B, 9, W], mask bool[B, 9, W], overflow int32[]) where
    W = cfg.window_capacity. Sentinel-keyed (invalid) targets produce
    fully-masked junk that callers discard.
    """
    w = cfg.window_capacity
    nc = cfg.num_cells
    base = target_key[:, None] + _column_offsets(cfg)[None, :] - 1  # [B, 9]
    lo = jnp.clip(base, 0, nc)
    hi = jnp.clip(base + 3, 0, nc)  # exclusive of the sentinel bucket
    hi = jnp.maximum(hi, lo)
    start = starts[lo]
    cnt = jnp.minimum(starts[hi] - start, w)  # truncate; excess is counted below
    full_cnt = starts[hi] - start
    lane = jnp.arange(w, dtype=jnp.int32)
    idx = jnp.minimum(start[..., None] + lane, n_sorted - 1)  # [B, 9, W]
    mask = lane < cnt[..., None]
    overflow = jnp.sum(jnp.maximum(full_cnt - w, 0)).astype(jnp.int32)
    return idx, mask, overflow
