"""Slope-timed breakdown of the PRODUCTION fields-native step
(step_pallas_fields — exactly what bench.py chains) at selected trajectory
steps: build (keys + payload sort + starts), prep (supertile_columns),
density, pressure+masks, force, integrate+masks, and FULL, so the
FULL-minus-sum residual isolates the XLA glue the wrapper-path profiler
(scripts/profile_step.py) cannot see.

Usage: python scripts/fields_profile.py [N] [steps...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

import jax.numpy as jnp

from scripts.profile_step import fence, slope_bench  # noqa: E402
from tpusph.core.config import default_config
from tpusph.core.init import init_state
from tpusph.engine.step import fields_from_state, step_pallas_fields
from tpusph.neighbors.cell_list import build_sorted_fields_1d
from tpusph.pallas.fused import density_pallas, force_pallas, supertile_columns
from tpusph.physics.integrate import integrate_fields
from tpusph.physics.kernels import pressure_from_density


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 262_144
    probe_steps = [int(s) for s in sys.argv[2:]] or [0, 60, 90]
    from bench import config_overrides

    from functools import partial

    import scripts.profile_step as _ps
    from tpusph.core.config import compiler_opts

    cfg = default_config(n, **config_overrides(n, os.environ))
    _ps.COMPILER_OPTS = compiler_opts(cfg)
    jit = partial(jax.jit, compiler_options=compiler_opts(cfg))
    random_init = n > 1_295_029  # grid-lattice ceiling
    fs = fields_from_state(init_state(cfg, random_init=random_init))

    def advance(fs, k):
        @jit
        def go(fs):
            def body(f, _):
                (f2, _, _, _), _aux = step_pallas_fields(f, cfg)
                return f2, None
            return jax.lax.scan(body, fs, None, length=k)[0]
        return go(fs)

    prev = 0
    for target in probe_steps:
        if target > prev:
            fs = advance(fs, target - prev)
            fence(fs)
            prev = target
        print(f"--- step {target} (N={n}) ---", flush=True)

        sf = jit(
            lambda f: build_sorted_fields_1d(
                f.x, f.y, f.z, f.vx, f.vy, f.vz, f.valid, cfg
            )
        )(fs)
        cols = jit(
            lambda sf: supertile_columns(sf.key_sorted, sf.valid_sorted,
                                         sf.starts, cfg)
        )(sf)
        raw = jit(
            lambda sf, cols: density_pallas(
                (sf.x, sf.y, sf.z), sf.key_sorted, cols, cfg)
        )(sf, cols)
        rho_s, p_s = jit(
            lambda raw, sf: (
                jnp.where(sf.valid_sorted,
                          pressure_from_density(raw, cfg)[0], 1.0),
                jnp.where(sf.valid_sorted,
                          pressure_from_density(raw, cfg)[1], 0.0),
            )
        )(raw, sf)
        fence((rho_s, p_s))

        t = {}
        t["build"] = slope_bench(
            lambda f: build_sorted_fields_1d(
                f.x, f.y, f.z, f.vx, f.vy, f.vz, f.valid, cfg),
            lambda a, z: (a[0]._replace(x=a[0].x + z),),
            fs,
        )
        t["prep"] = slope_bench(
            lambda key_s, valid_s, starts, z32: supertile_columns(
                key_s + z32, valid_s, starts, cfg),
            lambda a, z: (a[0], a[1], a[2], z.astype(jnp.int32)),
            sf.key_sorted, sf.valid_sorted, sf.starts, jnp.int32(0),
        )
        t["density"] = slope_bench(
            lambda sf, cols: density_pallas(
                (sf.x, sf.y, sf.z), sf.key_sorted, cols, cfg),
            lambda a, z: (a[0]._replace(x=a[0].x + z), a[1]),
            sf, cols,
        )
        t["press"] = slope_bench(
            lambda raw, valid: (
                jnp.where(valid, pressure_from_density(raw, cfg)[0], 1.0),
                jnp.where(valid, pressure_from_density(raw, cfg)[1], 0.0),
            ),
            lambda a, z: (a[0] + z, a[1]),
            raw, sf.valid_sorted,
        )
        t["force"] = slope_bench(
            lambda sf, rho, p, cols: force_pallas(
                (sf.x, sf.y, sf.z), (sf.vx, sf.vy, sf.vz), rho, p,
                sf.key_sorted, cols, cfg),
            lambda a, z: (a[0]._replace(x=a[0].x + z), a[1], a[2], a[3]),
            sf, rho_s, p_s, cols,
        )
        t["integ"] = slope_bench(
            lambda sf, rho: integrate_fields(
                sf.x, sf.y, sf.z, sf.vx, sf.vy, sf.vz,
                jnp.zeros_like(sf.x), jnp.zeros_like(sf.x),
                jnp.zeros_like(sf.x), rho, cfg),
            lambda a, z: (a[0]._replace(x=a[0].x + z), a[1]),
            sf, rho_s,
        )
        t["FULL"] = slope_bench(
            lambda f: step_pallas_fields(f, cfg)[0][0],
            lambda a, z: (a[0]._replace(x=a[0].x + z),),
            fs,
        )
        parts = "  ".join(f"{k}={v*1e3:7.2f}" for k, v in t.items())
        named = sum(v for k, v in t.items() if k != "FULL")
        print(f"{parts}  | sum={named*1e3:7.2f} ms "
              f"(glue={max(t['FULL']-named,0)*1e3:.2f})", flush=True)


if __name__ == "__main__":
    main()
