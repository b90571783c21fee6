"""Sweep Pallas kernel geometry (pallas_tile × pallas_group) with the real
100-step 262k benchmark protocol. Each variant is a fresh compile (minutes
through the relay; cached afterwards).

Usage: python scripts/variant_sweep.py [N] [steps] [variant ...]
Each variant is pt,g[,col_capacity[,stencil[,sub_blocks[,block_lanes]]]].
e.g.   python scripts/variant_sweep.py 262144 100 128,8 128,8,4096,slab3,20,256
"""

from __future__ import annotations

import dataclasses
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

import jax.numpy as jnp

from tpusph.core.config import default_config
from tpusph.core.init import init_state
from tpusph.engine.step import step_pallas_sorted


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 262_144
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    variants = [tuple(v.split(",")) for v in sys.argv[3:]] or [
        ("64", "4"), ("128", "2"), ("128", "4"), ("256", "1"),
    ]  # each entry: pt,g[,col_capacity[,stencil[,sub_blocks]]]
    base = default_config(n)
    state0 = init_state(base)

    for var in variants:
        pt, g = int(var[0]), int(var[1])
        cap = int(var[2]) if len(var) > 2 else base.pallas_col_capacity
        stencil = var[3] if len(var) > 3 else base.pallas_stencil
        sub_blocks = int(var[4]) if len(var) > 4 else base.pallas_sub_blocks
        bl = int(var[5]) if len(var) > 5 else base.pallas_block_lanes
        bias = float(var[6]) if len(var) > 6 else base.pallas_hybrid_bias
        cfg = dataclasses.replace(
            base, pallas_tile=pt, pallas_group=g, pallas_col_capacity=cap,
            pallas_stencil=stencil, pallas_sub_blocks=sub_blocks,
            pallas_block_lanes=bl, pallas_hybrid_bias=bias)

        @jax.jit
        def run(state, cfg=cfg):
            def body(s, _):
                s2, aux = step_pallas_sorted(s, cfg)
                return s2, aux.window_overflow
            s2, ovf = jax.lax.scan(body, state, None, length=steps)
            return s2, jnp.sum(ovf)

        t0 = time.perf_counter()
        _, ovf = run(state0)
        ovf = int(jax.device_get(ovf))
        warm = time.perf_counter() - t0
        t0 = time.perf_counter()
        _, ovf2 = run(state0)
        jax.device_get(ovf2)
        dt = time.perf_counter() - t0
        print(f"pt={pt:3d} g={g} cap={cfg.pallas_col_capacity} "
              f"{cfg.pallas_stencil} sb={cfg.pallas_sub_blocks} "
              f"bl={cfg.pallas_block_lanes} bias={cfg.pallas_hybrid_bias}  "
              f"{steps/dt:7.2f} steps/s  "
              f"({dt/steps*1e3:6.2f} ms/step, overflow={ovf}, warm={warm:.0f}s)",
              flush=True)


if __name__ == "__main__":
    main()
