"""Probe whether the kernels' fast/slow lax.cond actually branches on device:
time density_pallas with prep's fast flags, all-slow, and all-fast. The flag
vector is runtime prefetch data, so all three share one compiled program.
Also times hybrid vs slab3 at the same state.

Usage: python scripts/branch_probe.py [N] [advance_steps]
"""

from __future__ import annotations

import dataclasses
import sys

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

import jax.numpy as jnp
import numpy as np

from tpusph.core.config import default_config
from tpusph.core.init import init_state
from tpusph.engine.step import step_pallas_sorted
from tpusph.neighbors.cell_list import build_cell_list
from tpusph.pallas.fused import density_pallas, force_pallas, supertile_columns
from tpusph.physics.kernels import pressure_from_density

sys.path.insert(0, "scripts")
from profile_step import fence, slope_bench  # noqa: E402


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 262_144
    adv = int(sys.argv[2]) if len(sys.argv) > 2 else 60
    cfg0 = default_config(n)
    state = init_state(cfg0)
    if adv:
        @jax.jit
        def go(state):
            def body(s, _):
                s2, _ = step_pallas_sorted(s, cfg0)
                return s2, None
            return jax.lax.scan(body, state, None, length=adv)[0]
        state = go(state)
        fence(state)

    for stencil in ("slab3", "hybrid"):
        cfg = dataclasses.replace(cfg0, pallas_stencil=stencil)
        cl = jax.jit(lambda s: build_cell_list(s.position, s.valid, cfg))(state)
        sp = jax.jit(lambda s, cl: s.position[cl.perm])(state, cl)
        cols = jax.jit(
            lambda cl: supertile_columns(
                cl.key_sorted, cl.valid_sorted, cl.starts, cfg
            )
        )(cl)
        frac_fast = float(np.asarray(cols.sub_fast).mean())
        variants = {
            "prep": cols,
            "slow": cols._replace(sub_fast=jnp.zeros_like(cols.sub_fast)),
            "fast": cols._replace(sub_fast=jnp.ones_like(cols.sub_fast)),
        }
        t_prep = slope_bench(
            lambda key_s, valid_s, starts, z32: supertile_columns(
                key_s + z32, valid_s, starts, cfg
            ),
            lambda a, z: (a[0], a[1], a[2], z.astype(jnp.int32)),
            cl.key_sorted, cl.valid_sorted, cl.starts, jnp.int32(0),
        )
        t_full = slope_bench(
            lambda s: step_pallas_sorted(s, cfg)[0],
            lambda a, z: (a[0]._replace(position=a[0].position + z),),
            state,
        )
        print(f"{stencil:6s} prep={t_prep*1e3:6.2f}ms FULL={t_full*1e3:6.2f}ms",
              flush=True)
        sv = jax.jit(lambda s, cl: s.velocity[cl.perm])(state, cl)
        raw = jax.jit(lambda sp, cl, cols: density_pallas(
            (sp[:, 0], sp[:, 1], sp[:, 2]), cl.key_sorted, cols, cfg))(sp, cl, cols)
        rho_s, p_s = jax.jit(
            lambda raw, cl: (
                jnp.where(cl.valid_sorted, pressure_from_density(raw, cfg)[0], 1.0),
                jnp.where(cl.valid_sorted, pressure_from_density(raw, cfg)[1], 0.0),
            )
        )(raw, cl)
        t_force = slope_bench(
            lambda sp, sv, r, pp, key_s, cols: force_pallas(
                (sp[:, 0], sp[:, 1], sp[:, 2]), (sv[:, 0], sv[:, 1], sv[:, 2]),
                r, pp, key_s, cols, cfg),
            lambda a, z: (a[0] + z, a[1], a[2], a[3], a[4], a[5]),
            sp, sv, rho_s, p_s, cl.key_sorted, cols,
        )
        print(f"{stencil:6s} force={t_force*1e3:6.2f}ms", flush=True)
        out = []
        for name, cv in variants.items():
            t = slope_bench(
                lambda sp, key_s, cols: density_pallas(
                    (sp[:, 0], sp[:, 1], sp[:, 2]), key_s, cols, cfg),
                lambda a, z: (a[0] + z, a[1], a[2]),
                sp, cl.key_sorted, cv,
            )
            out.append(f"{name}={t*1e3:6.2f}ms")
        print(f"{stencil:6s} (fast frac {frac_fast:4.2f}): " + "  ".join(out),
              flush=True)


if __name__ == "__main__":
    main()
