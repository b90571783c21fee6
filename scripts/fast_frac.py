"""Fast-path / descriptor coverage along a real trajectory.

The kernels take one of three per-sub branches: fast+desc (flat descriptor
loop, unrolled, mask-free), fast without desc fit (select chain, mask-free),
or slow (select chain + key mask). Step-90 steps cost ~20% more than step-60
at 262k — this probe attributes that between (a) intrinsic block growth and
(b) subs falling off the fast/desc branches.

Usage: python scripts/fast_frac.py [N] [steps...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

import numpy as np

from tpusph.core.config import default_config
from tpusph.core.init import init_state
from tpusph.engine.step import step_pallas_sorted
from tpusph.neighbors.cell_list import build_cell_list
from tpusph.pallas.fused import supertile_columns


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 262_144
    probes = [int(s) for s in sys.argv[2:]] or [0, 30, 60, 90]
    from bench import config_overrides

    cfg = default_config(n, **config_overrides(n, os.environ))
    from functools import partial

    from tpusph.core.config import compiler_opts

    jit = partial(jax.jit, compiler_options=compiler_opts(cfg))
    # past the 1.29M grid-lattice ceiling only random init exists
    state = init_state(cfg, random_init=(n > 1_295_029))

    prev = 0
    for target in probes:
        gap = target - prev
        if gap:
            @jit
            def adv(s):
                def body(s, _):
                    s2, _ = step_pallas_sorted(s, cfg)
                    return s2, None
                return jax.lax.scan(body, s, None, length=gap)[0]
            state = adv(state)
        prev = target

        @jit
        def probe(s):
            cl = build_cell_list(s.position, s.valid, cfg)
            return supertile_columns(cl.key_sorted, cl.valid_sorted, cl.starts, cfg)

        cols = jax.device_get(probe(state))
        fast = np.asarray(cols.sub_fast).astype(bool)
        line = f"step {target:3d}: fast {100 * fast.mean():5.1f}%"
        if cols.desc_cnt is not None:
            dc = np.asarray(cols.desc_cnt).astype(np.int32)
            dcf = np.asarray(cols.desc_cnt_f).astype(np.int32)
            fit = dc >= 0
            line += (
                f"  desc-fit {100 * fit.mean():5.1f}%"
                f"  fast&fit {100 * (fast & fit).mean():5.1f}%"
                f"  padded-blocks mean {dc[fit].mean():5.2f}"
                f"/{dcf[dcf >= 0].mean():5.2f} (d/f)"
                f"  p99 {np.percentile(dc[fit], 99):4.0f}"
            )
        if cols.sub_mode is not None:
            line += f"  col-mode {100 * np.asarray(cols.sub_mode).mean():5.1f}%"
        print(line, flush=True)


if __name__ == "__main__":
    main()
