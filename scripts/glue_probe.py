"""Cumulative-composition slope probe: where does the fields-native step's
FULL−sum(parts) glue (scripts/fields_profile.py: ~2.5–3.9 ms at 262k, ~30%
of the step) actually attach?

Each stage Sk slope-times the PIPELINE PREFIX build→…→k composed in one jit
(inputs perturbed by a carry-derived zero, output reduced to a scalar), so
Sk − Sk−1 is the IN-CONTEXT cost of piece k — fusion/layout/scheduling
interactions included, unlike the isolated per-piece probes.

Usage: python scripts/glue_probe.py [N] [steps...]
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


def _stage(upto: str, cfg):
    """Pipeline prefix as a single fs→scalar function."""

    def run(fs):
        sf = build_sorted_fields_1d(
            fs.x, fs.y, fs.z, fs.vx, fs.vy, fs.vz, fs.valid, cfg
        )
        if upto == "build":
            return sf.key_sorted[0].astype(jnp.float32) + sf.x[0]
        cols = supertile_columns(sf.key_sorted, sf.valid_sorted, sf.starts, cfg)
        if upto == "prep":
            return sf.x[0] + cols.sup_cnt[0].astype(jnp.float32)
        raw = density_pallas((sf.x, sf.y, sf.z), sf.key_sorted, cols, cfg)
        if upto == "density":
            return raw[0]
        rho_s, p_s = pressure_from_density(raw, cfg)
        rho_s = jnp.where(sf.valid_sorted, rho_s, 1.0)
        p_s = jnp.where(sf.valid_sorted, p_s, 0.0)
        if upto == "press":
            return rho_s[0] + p_s[0]
        f = force_pallas(
            (sf.x, sf.y, sf.z), (sf.vx, sf.vy, sf.vz), rho_s, p_s,
            sf.key_sorted, cols, cfg,
        )
        if upto == "force":
            return f[0][0]
        x, y, z, vx, vy, vz = integrate_fields(
            sf.x, sf.y, sf.z, sf.vx, sf.vy, sf.vz,
            jnp.where(sf.valid_sorted, f[0], 0.0),
            jnp.where(sf.valid_sorted, f[1], 0.0),
            jnp.where(sf.valid_sorted, f[2], 0.0), rho_s, cfg,
        )
        return x[0] + y[0] + z[0] + vx[0] + vy[0] + vz[0]

    return run


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 262_144
    probe_steps = [int(s) for s in sys.argv[2:]] or [60]
    from bench import config_overrides

    cfg = default_config(n, **config_overrides(n, os.environ))
    fs = fields_from_state(init_state(cfg))

    def advance(fs, k):
        @jax.jit
        def go(fs):
            def body(f, _):
                (f2, _, _, _), _aux = step_pallas_fields(f, cfg)
                return f2, None
            return jax.lax.scan(body, fs, None, length=k)[0]
        return go(fs)

    stages = ["build", "prep", "density", "press", "force", "integrate"]
    prev = 0
    for target in probe_steps:
        if target > prev:
            fs = advance(fs, target - prev)
            fence(fs)
            prev = target
        print(f"--- step {target} (N={n}) ---", flush=True)
        t, last = {}, 0.0
        for st in stages:
            run = _stage(st, cfg)
            cum = slope_bench(
                run,
                lambda a, z: (a[0]._replace(x=a[0].x + z),),
                fs,
            )
            t[st] = cum - last
            last = cum
        full = slope_bench(
            lambda f: step_pallas_fields(f, cfg)[0][0],
            lambda a, z: (a[0]._replace(x=a[0].x + z),),
            fs,
        )
        parts = "  ".join(f"{k}={v*1e3:7.2f}" for k, v in t.items())
        print(f"{parts}  cum={last*1e3:7.2f}  FULL={full*1e3:7.2f} ms",
              flush=True)


if __name__ == "__main__":
    main()
