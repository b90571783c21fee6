"""Full-trajectory A/B: time the EXACT headline loop (100-step scan from
grid init, one dispatch) for a list of config variants back-to-back in one
process. This is the ground truth when step_ab's per-step slopes disagree
in sign across the trajectory (e.g. a variant that wins the sparse early
regime but loses the mid-trajectory one).

Usage: python scripts/traj_ab.py [N] [steps]
  TPUSPH_AB_VARIANTS — comma list from step_ab.VARIANTS (default: base,fs4)
  Each variant is timed REPS (default 3) times; the min is reported.
"""

from __future__ import annotations

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

from scripts.step_ab import VARIANTS  # noqa: E402
from tpusph.core.config import default_config
from tpusph.core.init import init_state
from tpusph.engine.step import fields_from_state, step_pallas_fields


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 262_144
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    reps = int(os.environ.get("TPUSPH_AB_REPS", 3))
    from bench import config_overrides

    cfg0 = default_config(n, **config_overrides(n, os.environ))
    names = (
        os.environ["TPUSPH_AB_VARIANTS"].split(",")
        if os.environ.get("TPUSPH_AB_VARIANTS")
        else ["base", "fs4"]
    )
    state0 = init_state(
        cfg0,
        random_init=(
            os.environ.get("TPUSPH_BENCH_INIT") == "random"
            or n > 1_295_029
        ),
    )
    fs0 = fields_from_state(state0)

    from functools import partial

    from tpusph.core.config import compiler_opts

    for name in names:
        cfg = dataclasses.replace(cfg0, **VARIANTS[name])

        @partial(jax.jit, compiler_options=compiler_opts(cfg))
        def run(fs, cfg=cfg):
            def body(f, _):
                (f2, _, _, _), aux = step_pallas_fields(f, cfg)
                return f2, aux.window_overflow
            f2, ovf = jax.lax.scan(body, fs, None, length=steps)
            return f2, ovf.sum()

        _, ovf = run(fs0)  # compile + warm
        ovf = int(jax.device_get(ovf))
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            _, o = run(fs0)
            jax.device_get(o)
            best = min(best, time.perf_counter() - t0)
        print(
            f"{name}: {steps / best:7.2f} steps/s  {best / steps * 1e3:6.3f} "
            f"ms/step  overflow={ovf}",
            flush=True,
        )


if __name__ == "__main__":
    main()
