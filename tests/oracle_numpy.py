"""Independent NumPy oracle — a direct scalar-semantics transcription of the
reference physics (float32 throughout), used to validate both jnp backends.

All-pairs is mathematically identical to the reference's 27-cell walk because
cell edge == h: every pair with r ≤ h lies within the stencil and every pair
outside contributes exactly zero through the kernel cutoffs
(/root/reference/src/simulator.cu:84-130, 149-318).
"""

import numpy as np

F = np.float32


def oracle_step(position, velocity, cfg):
    """One timestep. position/velocity: f32[N,3]. Returns dict of arrays."""
    pos = position.astype(F)
    vel = velocity.astype(F)
    n = pos.shape[0]
    h = F(cfg.h)
    h2 = h * h
    eps = F(cfg.eps)
    mass = F(cfg.mass)
    vk = F(cfg.v_kernel_coeff)
    dk = F(cfg.d_kernel_coeff)

    disp = pos[:, None, :] - pos[None, :, :]  # [N,N,3]
    r2 = np.sum(disp * disp, axis=-1, dtype=F)
    r = np.sqrt(r2, dtype=F)

    # density: poly6, self included (cu:161-189)
    w_poly6 = np.where(r2 <= h2, dk * (h2 - r2) ** 3, F(0))
    rho = np.maximum(np.sum(mass * w_poly6, axis=1, dtype=F), eps).astype(F)
    p = np.maximum(F(0), F(cfg.gas_constant) * (rho - F(cfg.rest_density))).astype(F)

    # forces (cu:192-256)
    live_p = (r2 <= h2) & (r >= eps)
    safe_r = np.where(live_p, r, F(1))
    scale = np.where(live_p, (-vk) * (h - safe_r) ** 2 / safe_r, F(0))
    grad = disp * scale[..., None]  # spiky gradient
    f_press = (
        (-mass) * (p[:, None] + p[None, :]) / (F(2) * rho[None, :])
    )[..., None] * grad

    live_v = (r <= h) & (r >= eps)
    w_visc = np.where(live_v, vk * (h - r), F(0))
    dv = vel[None, :, :] - vel[:, None, :]
    f_visc = (F(cfg.viscosity) * mass * w_visc / rho[None, :])[..., None] * dv

    force = np.sum(f_press + f_visc, axis=1, dtype=F)

    # integrate (cu:258-318)
    dt = F(cfg.dt)
    new_v = vel + dt * force / rho[:, None]
    new_v[:, 1] += dt * F(cfg.gravity)
    new_x = pos + dt * new_v

    lo, hi = h, F(cfg.box_dim) - h
    for ax in range(3):
        out_lo = new_x[:, ax] < lo
        out_hi = new_x[:, ax] > hi
        new_x[out_lo, ax] = lo
        new_x[out_hi, ax] = hi
        new_v[out_lo | out_hi, ax] *= F(-cfg.elasticity)
    new_v[np.abs(new_v) < eps] = F(0)

    return {
        "density": rho,
        "pressure": p,
        "force": force,
        "position": new_x,
        "velocity": new_v,
    }
