"""Morton (Z-order) encoding of 3-D grid cells.

The reference's `z_index_sort` branch sorts particle indices by the
Morton-encoded grid index (/root/reference/README.md:5). On TPU this is the
space-filling-curve key for the sort-based neighbor structure: cells that are
close in 3-D stay close in the sorted order, so tiled kernels touch contiguous
HBM. Pure bit-twiddling on int32 — vectorizes on the VPU and inside Pallas.

Supports up to 10 bits per axis (grids ≤ 1024³; the reference grid is 100³).
"""

from __future__ import annotations

import jax.numpy as jnp


def _part1by2(x: jnp.ndarray) -> jnp.ndarray:
    """Spread the low 10 bits of x so there are two zero bits between each
    (0b abc → 0b a00b00c)."""
    x = x.astype(jnp.uint32) & 0x3FF
    x = (x | (x << 16)) & jnp.uint32(0x030000FF)
    x = (x | (x << 8)) & jnp.uint32(0x0300F00F)
    x = (x | (x << 4)) & jnp.uint32(0x030C30C3)
    x = (x | (x << 2)) & jnp.uint32(0x09249249)
    return x


def _compact1by2(x: jnp.ndarray) -> jnp.ndarray:
    x = x.astype(jnp.uint32) & jnp.uint32(0x09249249)
    x = (x | (x >> 2)) & jnp.uint32(0x030C30C3)
    x = (x | (x >> 4)) & jnp.uint32(0x0300F00F)
    x = (x | (x >> 8)) & jnp.uint32(0x030000FF)
    x = (x | (x >> 16)) & jnp.uint32(0x000003FF)
    return x


def morton_encode(cell: jnp.ndarray) -> jnp.ndarray:
    """cell: int[..., 3] (x, y, z) → int32[...] Morton key
    (x bits at positions 0,3,6,…; y at 1,4,7,…; z at 2,5,8,…)."""
    x = _part1by2(cell[..., 0])
    y = _part1by2(cell[..., 1])
    z = _part1by2(cell[..., 2])
    return (x | (y << 1) | (z << 2)).astype(jnp.int32)


def morton_decode(key: jnp.ndarray) -> jnp.ndarray:
    """int32[...] Morton key → int32[..., 3] (x, y, z)."""
    k = key.astype(jnp.uint32)
    x = _compact1by2(k)
    y = _compact1by2(k >> 1)
    z = _compact1by2(k >> 2)
    return jnp.stack([x, y, z], axis=-1).astype(jnp.int32)
