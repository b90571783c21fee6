"""Predict Pallas stencil-window statistics (col9 vs slab3) along a real
trajectory: scanned 128-lane blocks per sub-tile, required column capacities,
and fast-path coverage. Advances the state on the attached device with the
production step, fetches (key_sorted, starts), and evaluates both stencil
geometries host-side with numpy — no kernel compiles per variant.

Usage: python scripts/stencil_stats.py [N] [steps...]
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
from tpusph.engine.step import step_pallas_sorted, step_cell_list
from tpusph.neighbors.cell_list import build_cell_list


def window_stats(key_s, valid, starts, cfg, tile):
    """numpy re-derivation of fused._column_ranges at `tile` granularity."""
    from tpusph.pallas.fused import _stencil

    offsets, lo_pad, hi_pad = _stencil(cfg)
    nc = cfg.num_cells
    ntiles = key_s.shape[0] // tile
    tk = key_s.reshape(ntiles, tile)
    tv = valid.reshape(ntiles, tile)
    kmin = np.min(np.where(tv, tk, nc), axis=1)
    kmax = np.max(np.where(tv, tk, -1), axis=1)
    offs = np.asarray(offsets)
    lo = np.clip(kmin[:, None] + offs[None, :] - lo_pad, 0, nc)
    hi = np.clip(kmax[:, None] + offs[None, :] + hi_pad, lo, nc)
    start = starts[lo]
    # align down to the production block width so predicted lane counts match
    # fused._geom_ranges exactly (bl=256 by default, not the 128-lane minimum)
    bl = cfg.pallas_block_lanes
    cnt = starts[hi] - (start // bl) * bl
    return cnt  # (ntiles, nwin) lanes incl. alignment lead-in


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 262_144
    probes = [int(s) for s in sys.argv[2:]] or [0, 30, 60, 90]
    import os

    from bench import config_overrides

    cfg = default_config(n, **config_overrides(n, os.environ))
    from functools import partial

    from tpusph.core.config import compiler_opts

    jit = partial(jax.jit, compiler_options=compiler_opts(cfg))
    state = init_state(cfg, random_init=(n > 1_295_029))
    on_tpu = jax.default_backend() not in ("cpu",)
    stepper = step_pallas_sorted if on_tpu else step_cell_list

    # static-length advance: retrace per gap (cached across probes of same gap)
    prev = 0
    for target in probes:
        gap = target - prev
        if gap:
            @jit
            def adv(s):
                def body(s, _):
                    s2, _ = stepper(s, cfg)
                    return s2, None
                s2, _ = jax.lax.scan(body, s, None, length=gap)
                return s2
            state = adv(state)
        prev = target
        cl = jit(lambda s: build_cell_list(s.position, s.valid, cfg))(state)
        key_s = np.asarray(jax.device_get(cl.key_sorted))
        valid = np.asarray(jax.device_get(cl.valid_sorted))
        starts = np.asarray(jax.device_get(cl.starts))

        print(f"--- step {target} (N={n}) ---", flush=True)
        bl = float(cfg.pallas_block_lanes)
        per_sub = {}
        for stencil in ("col9", "slab3"):
            c2 = dataclasses.replace(cfg, pallas_stencil=stencil)
            sub = window_stats(key_s, valid, starts, c2, c2.pallas_tile)
            sup = window_stats(
                key_s, valid, starts, c2, c2.pallas_tile * c2.pallas_group
            )
            blocks = np.ceil(sub / bl)
            per_sub[stencil] = blocks.sum(axis=1)
            print(
                f"{stencil:5s}: blocks/sub sum={blocks.sum(axis=1).mean():6.1f} "
                f"(p99={np.percentile(blocks.sum(axis=1), 99):5.0f}, "
                f"max={blocks.sum(axis=1).max():4.0f})  "
                f"sub_cnt max={sub.max():6d} (p99={np.percentile(sub, 99):7.0f})  "
                f"sup_cnt max={sup.max():6d} (p99={np.percentile(sup, 99):7.0f})",
                flush=True,
            )
        # hybrid: per-sub pick of the cheaper stencil, charging col9 a bias of
        # `lam` block-equivalents for its 6 extra window loops
        for lam in (0.0, 1.0, 2.0):
            cost_col = per_sub["col9"] + lam * 6
            hyb = np.minimum(cost_col, per_sub["slab3"])
            frac_col = float(np.mean(cost_col < per_sub["slab3"]))
            print(
                f"hybrid(lam={lam:3.1f}): blocks/sub sum={hyb.mean():6.1f} "
                f"(p99={np.percentile(hyb, 99):5.0f}) col-mode "
                f"{100 * frac_col:4.1f}% of subs "
                f"[slab-only {per_sub['slab3'].mean():6.1f}]",
                flush=True,
            )


if __name__ == "__main__":
    main()
