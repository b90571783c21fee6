"""A/B the flat DESCRIPTOR loop (cfg.pallas_desc) against the select-chain
flat block loop on the real TPU: slope-timed density/force/prep at chosen
trajectory steps, both modes, same advance programs.

Usage: python scripts/desc_ab.py [N] [steps...]   (env TPUSPH_AB_STENCIL,
TPUSPH_AB_MB override stencil / desc block capacity; TPUSPH_AB_VARIANTS a
comma list restricting which variants run — each is a fresh multi-minute
remote compile, so sweeps should name only what they need)
"""

from __future__ import annotations

import dataclasses
import os
import sys

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from scripts.profile_step import fence, slope_bench  # noqa: E402

from tpusph.core.config import default_config
from tpusph.core.init import init_state
from tpusph.engine.step import step_pallas_sorted
from tpusph.neighbors.cell_list import build_cell_list
from tpusph.pallas.fused import density_pallas, force_pallas, supertile_columns
from tpusph.physics.kernels import pressure_from_density


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 262_144
    probe_steps = [int(s) for s in sys.argv[2:]] or [30, 60]
    from bench import config_overrides

    # per-N base presets (stencil/geometry/capacities) minus the desc knobs
    # the variants sweep themselves
    kw = {
        k: v
        for k, v in config_overrides(n, os.environ).items()
        if not k.startswith("pallas_desc") and k != "pallas_force_fold"
    }
    if os.environ.get("TPUSPH_AB_STENCIL"):
        kw["pallas_stencil"] = os.environ["TPUSPH_AB_STENCIL"]
    cfg0 = default_config(n, **kw)
    mb = int(os.environ.get("TPUSPH_AB_MB", "32"))
    desc_kw = dict(pallas_desc=True, pallas_desc_blocks=mb)
    variants = {
        "u2": dataclasses.replace(cfg0, pallas_desc_unroll=2, **desc_kw),
        "u2_fold": dataclasses.replace(
            cfg0, pallas_desc_unroll=2, pallas_force_fold=True, **desc_kw
        ),
        "u4d_u2f": dataclasses.replace(
            cfg0, pallas_desc_unroll=4, pallas_desc_unroll_force=2, **desc_kw
        ),
        "u4d_u2f_fold": dataclasses.replace(
            cfg0, pallas_desc_unroll=4, pallas_desc_unroll_force=2,
            pallas_force_fold=True, **desc_kw
        ),
        "u4both_fold": dataclasses.replace(
            cfg0, pallas_desc_unroll=4, pallas_desc_unroll_force=4,
            pallas_force_fold=True, **desc_kw
        ),
        "split": dataclasses.replace(
            cfg0, pallas_desc_unroll=4, pallas_desc_unroll_force=2,
            pallas_force_fold=True, pallas_force_split=True, **desc_kw
        ),
        "split_nofold": dataclasses.replace(
            cfg0, pallas_desc_unroll=4, pallas_desc_unroll_force=2,
            pallas_force_split=True, **desc_kw
        ),
        "split_u4f": dataclasses.replace(
            cfg0, pallas_desc_unroll=4, pallas_desc_unroll_force=4,
            pallas_force_fold=True, pallas_force_split=True, **desc_kw
        ),
    }
    if os.environ.get("TPUSPH_AB_VARIANTS"):
        names = os.environ["TPUSPH_AB_VARIANTS"].split(",")
        variants = {k: v for k, v in variants.items() if k in names}

    state = init_state(cfg0)
    prev = 0
    for target in probe_steps:
        if target > prev:
            @jax.jit
            def adv(s):
                def body(s, _):
                    s2, _ = step_pallas_sorted(s, cfg0)
                    return s2, None
                return jax.lax.scan(body, s, None, length=target - prev)[0]
            state = adv(state)
            fence(state)
            prev = target
        cl = jax.jit(lambda s: build_cell_list(s.position, s.valid, cfg0))(state)
        sp, sv = jax.jit(
            lambda s, cl: (s.position[cl.perm], s.velocity[cl.perm])
        )(state, cl)
        import jax.numpy as jnp

        base_rho = None
        for name, cfg in variants.items():
            cols = jax.jit(
                lambda cl: supertile_columns(
                    cl.key_sorted, cl.valid_sorted, cl.starts, cfg
                )
            )(cl)
            ovf = int(jax.device_get(cols.overflow))
            raw = jax.jit(
                lambda sp, cl, cols: density_pallas(
                    (sp[:, 0], sp[:, 1], sp[:, 2]), cl.key_sorted, cols, cfg
                )
            )(sp, cl, cols)
            rho_s, p_s = jax.jit(
                lambda raw, cl: (
                    jnp.where(cl.valid_sorted,
                              pressure_from_density(raw, cfg)[0], 1.0),
                    jnp.where(cl.valid_sorted,
                              pressure_from_density(raw, cfg)[1], 0.0),
                )
            )(raw, cl)
            fence((rho_s, p_s))
            t = {}
            t["prep"] = slope_bench(
                lambda key_s, valid_s, starts, z32: supertile_columns(
                    key_s + z32, valid_s, starts, cfg
                ),
                lambda a, z: (a[0], a[1], a[2], z.astype(jnp.int32)),
                cl.key_sorted, cl.valid_sorted, cl.starts, jnp.int32(0),
            )
            t["density"] = slope_bench(
                lambda sp, key_s, cols: density_pallas(
                    (sp[:, 0], sp[:, 1], sp[:, 2]), key_s, cols, cfg),
                lambda a, z: (a[0] + z, a[1], a[2]),
                sp, cl.key_sorted, cols,
            )
            t["force"] = slope_bench(
                lambda sp, sv, r, p, key_s, cols: force_pallas(
                    (sp[:, 0], sp[:, 1], sp[:, 2]),
                    (sv[:, 0], sv[:, 1], sv[:, 2]),
                    r, p, key_s, cols, cfg),
                lambda a, z: (a[0] + z, a[1], a[2], a[3], a[4], a[5]),
                sp, sv, rho_s, p_s, cl.key_sorted, cols,
            )
            parts = "  ".join(f"{k}={v*1e3:6.2f}" for k, v in t.items())
            print(f"step {target} {name:5s}: {parts} ms  overflow={ovf}",
                  flush=True)
            # parity across variants at this step
            if base_rho is None:
                base_rho = np.asarray(jax.device_get(raw))
            else:
                np.testing.assert_allclose(
                    np.asarray(jax.device_get(raw)), base_rho, rtol=1e-6
                )
                print(f"step {target}: {name} density parity OK", flush=True)


if __name__ == "__main__":
    main()
