"""Uniform-grid cell assignment — TPU equivalent of getGridCell /
flattenGridCoord (/root/reference/src/simulator.cu:57-82).

cell = (int)(position / h) per axis (truncation; positions are non-negative
after the boundary clamp so this equals floor). The reference prints an OOB
warning without clamping (simulator.cu:60-73); we count OOB particles into a
diagnostic and clamp the cell for safety (contributions remain correct because
every pair interaction is re-masked on r ≤ h).

Flat key = x + C·y + C²·z, row-major with **x fastest** — exactly the
reference's layout (simulator.cu:78-82). After sorting by this key, the three
x-adjacent cells of any (y,z) column are contiguous, which turns the 27-cell
stencil into 9 contiguous windows (see cell_list.py).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from tpusph.core.config import SimConfig
from tpusph.neighbors.morton import morton_encode


def cell_coords(position: jnp.ndarray, cfg: SimConfig) -> jnp.ndarray:
    """position f32[...,3] → int32[...,3] grid cell, truncated like the
    reference's (int)(p / h) cast."""
    return (position / jnp.float32(cfg.h)).astype(jnp.int32)


def flatten_rowmajor(cell: jnp.ndarray, cfg: SimConfig) -> jnp.ndarray:
    c = jnp.int32(cfg.num_cells_per_dim)
    return cell[..., 0] + c * cell[..., 1] + c * c * cell[..., 2]


class GridKeys(NamedTuple):
    key: jnp.ndarray  # int32[N] flat cell key; == num_cells sentinel if invalid
    cell: jnp.ndarray  # int32[N,3] clamped cell coords
    oob_count: jnp.ndarray  # int32[] — valid particles outside [0, C)³


def compute_keys(
    position: jnp.ndarray, valid: jnp.ndarray, cfg: SimConfig, mode: str = "rowmajor"
) -> GridKeys:
    """Cell keys for every particle slot. Invalid slots get the out-of-range
    sentinel `num_cells` so they sort to the end and join no cell. Mode
    'rowmajor' (the engine's sort key — makes stencil columns contiguous) or
    'morton' (the z_index_sort-style space-filling key)."""
    c = cfg.num_cells_per_dim
    raw = cell_coords(position, cfg)
    oob = jnp.any((raw < 0) | (raw >= c), axis=-1)
    oob_count = jnp.sum(oob & valid).astype(jnp.int32)
    cell = jnp.clip(raw, 0, c - 1)
    if mode == "rowmajor":
        key = flatten_rowmajor(cell, cfg)
    elif mode == "morton":
        key = morton_encode(cell)
    else:
        raise ValueError(f"unknown key mode {mode!r}")
    sentinel = jnp.int32(cfg.num_cells if mode == "rowmajor" else _morton_span(c))
    key = jnp.where(valid, key, sentinel)
    return GridKeys(key=key, cell=cell, oob_count=oob_count)


def _morton_span(c: int) -> int:
    """Smallest power-of-8 Morton keyspace covering a c³ grid."""
    bits = max(1, (c - 1).bit_length())
    return 1 << (3 * bits)
