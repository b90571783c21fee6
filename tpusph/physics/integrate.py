"""Symplectic (semi-implicit) Euler integration with reflective box boundaries.

Parity with kernelUpdatePositions (/root/reference/src/simulator.cu:258-318):
  1. v += dt · f/ρ, with gravity added as an *acceleration* on y
     (v.y += dt·(f.y/ρ + g), simulator.cu:269-272).
  2. x += dt · v.
  3. Per-axis clamp to [h, box−h]; on clamp, v *= −elasticity (= −0.5).
  4. Per-component velocity deadband: |v_c| < EPS_F → 0 (simulator.cu:306-314).

Purely elementwise → fuses into one VPU pass under XLA.
"""

from __future__ import annotations

import jax.numpy as jnp

from tpusph.core.config import SimConfig


def integrate(
    position: jnp.ndarray,
    velocity: jnp.ndarray,
    force: jnp.ndarray,
    density: jnp.ndarray,
    cfg: SimConfig,
):
    """Returns (new_position, new_velocity). Shapes [N,3],[N,3],[N,3],[N]."""
    dt = jnp.float32(cfg.dt)
    g = jnp.zeros((3,), jnp.float32).at[1].set(jnp.float32(cfg.gravity))
    v = velocity + dt * (force / density[:, None] + g)
    x = position + dt * v

    lo = jnp.float32(cfg.h)
    hi = jnp.float32(cfg.box_dim) - jnp.float32(cfg.h)
    out = (x < lo) | (x > hi)
    x = jnp.clip(x, lo, hi)
    v = jnp.where(out, v * jnp.float32(-cfg.elasticity), v)

    v = jnp.where(jnp.abs(v) < jnp.float32(cfg.eps), 0.0, v)
    return x, v
