"""Component-level timing of the sorted Pallas step at selected trajectory
steps on the real TPU.

The axon relay adds a ~25-40 ms host round-trip to every dispatch+fetch, so
single-shot timings are useless. Each component is therefore measured by the
SLOPE method: run it K times chained inside one jit (with a carry-derived
zero injected into an input to defeat loop-invariant code motion), time that
and a 1-rep version, and report (tK - t1)/(K - 1).

Usage: python scripts/profile_step.py [N] [steps...]
"""

from __future__ import annotations

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

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
from tpusph.physics.integrate import integrate
from tpusph.physics.kernels import pressure_from_density

K = 16


def fence(x):
    jax.device_get(jax.tree_util.tree_leaves(x)[0].ravel()[0])


def _fzero(carry):
    """A float 0 XLA cannot constant-fold (carry is a runtime value)."""
    return jnp.where(jnp.isnan(carry), jnp.float32(1.0), jnp.float32(0.0))


# scripts probing raised-scoped-VMEM presets (the 4M tier) must set this to
# tpusph.core.config.compiler_opts(cfg) — every probe jit forwards it
# (without it the remote compiler OOMs scoped VMEM and 500s)
COMPILER_OPTS = None


def slope_bench(fn, inject, *args, reps=4):
    """fn(*args) -> out; inject(args, z) perturbs one input by float zero z.
    Returns per-call seconds via the K-vs-1 slope."""
    from functools import partial

    def chained(k):
        @partial(jax.jit, compiler_options=COMPILER_OPTS)
        def run(*args):
            def body(carry, _):
                out = fn(*inject(args, _fzero(carry)))
                leaf = jax.tree_util.tree_leaves(out)[0]
                return leaf.ravel()[0].astype(jnp.float32), None

            c, _ = jax.lax.scan(body, jnp.float32(0), None, length=k)
            return c

        return run

    import os
    dbg = os.environ.get("TPUSPH_SLOPE_DEBUG")
    times = {}
    for k in (1, K):
        run = chained(k)
        if dbg:
            print(f"    [slope] k={k} warmup", flush=True)
        out = run(*args)
        fence(out)
        ts = []
        for r in range(reps):
            if dbg:
                print(f"    [slope] k={k} rep={r}", flush=True)
            t0 = time.perf_counter()
            out = run(*args)
            fence(out)
            ts.append(time.perf_counter() - t0)
        times[k] = min(ts)
    return (times[K] - times[1]) / (K - 1)


def main():
    import os

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 262_144
    probe_steps = [int(s) for s in sys.argv[2:]] or [0, 30, 60, 90]
    # profile the PRODUCTION config: bench per-N presets + TPUSPH_BENCH_* env
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from bench import config_overrides

    cfg = default_config(n, **config_overrides(n, os.environ))
    state0 = init_state(cfg)

    def advance(state, k):
        @jax.jit
        def go(state):
            def body(s, _):
                s2, _ = step_pallas_sorted(s, cfg)
                return s2, None
            s2, _ = jax.lax.scan(body, state, None, length=k)
            return s2
        return go(state)

    # materialize per-probe inputs
    state = state0
    prev = 0
    for target in probe_steps:
        if target > prev:
            state = advance(state, target - prev)
            fence(state)
            prev = target
        print(f"--- step {target} (N={n}) ---", flush=True)

        cl = jax.jit(lambda s: build_cell_list(s.position, s.valid, cfg))(state)
        sp, sv = jax.jit(lambda s, cl: (s.position[cl.perm], s.velocity[cl.perm]))(state, cl)
        cols = jax.jit(
            lambda cl: supertile_columns(cl.key_sorted, cl.valid_sorted, cl.starts, cfg)
        )(cl)
        raw = jax.jit(lambda sp, cl, cols: density_pallas(
            (sp[:, 0], sp[:, 1], sp[:, 2]), cl.key_sorted, cols, cfg))(sp, cl, cols)
        rho_s, p_s = jax.jit(
            lambda raw, cl: (
                jnp.where(cl.valid_sorted, pressure_from_density(raw, cfg)[0], 1.0),
                jnp.where(cl.valid_sorted, pressure_from_density(raw, cfg)[1], 0.0),
            )
        )(raw, cl)
        fence((rho_s, p_s))

        t = {}
        t["build"] = slope_bench(
            lambda pos, valid: build_cell_list(pos, valid, cfg),
            lambda a, z: (a[0] + z, a[1]),
            state.position, state.valid,
        )
        t["gather"] = slope_bench(
            lambda pos, vel, perm: (pos[perm], vel[perm]),
            lambda a, z: (a[0] + z, a[1], a[2]),
            state.position, state.velocity, cl.perm,
        )
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
                (sp[:, 0], sp[:, 1], sp[:, 2]), (sv[:, 0], sv[:, 1], sv[:, 2]),
                r, p, key_s, cols, cfg),
            lambda a, z: (a[0] + z, a[1], a[2], a[3], a[4], a[5]),
            sp, sv, rho_s, p_s, cl.key_sorted, cols,
        )
        t["integrate"] = slope_bench(
            lambda sp, sv, f, r: integrate(sp, sv, f, r, cfg),
            lambda a, z: (a[0] + z, a[1], a[2], a[3]),
            sp, sv, jnp.zeros_like(sp), rho_s,
        )
        # full fused step, slope over the natural state chain
        t["FULL"] = slope_bench(
            lambda s: step_pallas_sorted(s, cfg)[0],
            lambda a, z: (a[0]._replace(position=a[0].position + z),),
            state,
        )

        parts = "  ".join(f"{k_}={v*1e3:7.2f}" for k_, v in t.items())
        named_sum = sum(v for k_, v in t.items() if k_ != "FULL")
        print(f"{parts}  | sum={named_sum*1e3:7.2f} ms", flush=True)
        from tpusph.pallas.fused import _cnt_in_lanes, _sub_slots, _sup_stencil

        nsup = len(_sup_stencil(cfg)[0])
        occ = np.asarray(jax.device_get(cols.sup_cnt)).reshape(-1, nsup)
        sub = np.asarray(jax.device_get(cols.sub_cnt)).reshape(-1, _sub_slots(cfg))
        # sub_cnt unit: lanes (hybrid) vs blocks (col9/slab3)
        blocks = (
            np.ceil(sub / cfg.pallas_block_lanes) if _cnt_in_lanes(cfg) else sub
        )
        print(f"sup_cnt: mean={occ.mean():7.1f} p50={np.percentile(occ,50):7.1f} "
              f"p99={np.percentile(occ,99):7.1f} max={occ.max()}  "
              f"blocks/sub: mean={blocks.sum(axis=1).mean():5.2f} "
              f"max={blocks.sum(axis=1).max():.0f}", flush=True)


if __name__ == "__main__":
    main()
