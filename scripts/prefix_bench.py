"""Incremental-prefix timing of step_pallas_sorted at N=262k on TPU: measures
jit(prefix_k) for growing prefixes of the step pipeline via the slope method,
so the cost of each stage appears as the delta between consecutive prefixes —
including any scheduling/stall cost that only shows up in composition.
"""

from __future__ import annotations

import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

import jax.numpy as jnp

from tpusph.core.config import default_config
from tpusph.core.init import init_state
from tpusph.engine.step import step_pallas_sorted
from tpusph.neighbors.cell_list import build_sorted_fields
from tpusph.pallas.fused import density_pallas, force_pallas, supertile_columns
from tpusph.physics.integrate import integrate
from tpusph.physics.kernels import pressure_from_density

K = 16


def fence(x):
    jax.device_get(jax.tree_util.tree_leaves(x)[0].ravel()[0])


def slope(fn, state, reps=4):
    def chained(k):
        @jax.jit
        def run(state):
            def body(carry, _):
                z = jnp.where(jnp.isnan(carry), jnp.float32(1), jnp.float32(0))
                out = fn(state._replace(position=state.position + z))
                s = sum(jnp.sum(l).astype(jnp.float32)
                        for l in jax.tree_util.tree_leaves(out))
                return s, None
            c, _ = jax.lax.scan(body, jnp.float32(0), None, length=k)
            return c
        return run

    ts = {}
    for k in (1, K):
        run = chained(k)
        out = run(state)
        fence(out)
        best = 1e9
        for _ in range(reps):
            t0 = time.perf_counter()
            out = run(state)
            fence(out)
            best = min(best, time.perf_counter() - t0)
        ts[k] = best
    return (ts[K] - ts[1]) / (K - 1)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 262_144
    steps_fwd = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    cfg = default_config(n)
    state = init_state(cfg)

    @jax.jit
    def advance(state):
        def body(s, _):
            s2, _ = step_pallas_sorted(s, cfg)
            return s2, None
        s2, _ = jax.lax.scan(body, state, None, length=steps_fwd)
        return s2

    state = advance(state)
    fence(state)

    def p_build(s):
        return build_sorted_fields(s.position, s.velocity, s.valid, cfg)

    def p_prep(s):
        sf = p_build(s)
        return sf, supertile_columns(sf.key_sorted, sf.valid_sorted, sf.starts, cfg)

    def p_density(s):
        sf, cols = p_prep(s)
        raw = density_pallas((sf.x, sf.y, sf.z), sf.key_sorted, cols, cfg)
        return sf, cols, raw

    def p_post(s):
        sf, cols, raw = p_density(s)
        rho_s, ps = pressure_from_density(raw, cfg)
        rho_s = jnp.where(sf.valid_sorted, rho_s, 1.0)
        ps = jnp.where(sf.valid_sorted, ps, 0.0)
        return sf, cols, rho_s, ps

    def p_force(s):
        sf, cols, rho_s, ps = p_post(s)
        f = force_pallas((sf.x, sf.y, sf.z), (sf.vx, sf.vy, sf.vz), rho_s, ps,
                         sf.key_sorted, cols, cfg)
        return sf, rho_s, ps, f

    def p_full(s):
        return step_pallas_sorted(s, cfg)[0]

    prev = 0.0
    for name, fn in [("build", p_build), ("prep", p_prep),
                     ("density", p_density), ("post", p_post), ("force", p_force),
                     ("full", p_full)]:
        t = slope(fn, state)
        print(f"  prefix {name:8s}: {t*1e3:7.2f} ms  (delta {1e3*(t-prev):+7.2f})",
              flush=True)
        prev = t


if __name__ == "__main__":
    main()
