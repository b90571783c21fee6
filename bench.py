"""Headline benchmark: SPH timesteps/sec at N=262,144 on one TPU chip.

Protocol mirrors the reference's `-m time` mode (100 timesteps, grid init,
/root/reference/src/main.cpp:68-76) on the BASELINE.json headline config.
Prints ONE JSON line; vs_baseline is relative to the 100 steps/s north-star
target (BASELINE.json: ">=100 timesteps/sec at 262k particles").

Env overrides: TPUSPH_BENCH_N (particle count), TPUSPH_BENCH_STEPS.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    import jax

    from tpusph.core.config import default_config
    from tpusph.core.init import init_state
    from tpusph.engine.step import make_step

    n = int(os.environ.get("TPUSPH_BENCH_N", 262_144))
    steps = int(os.environ.get("TPUSPH_BENCH_STEPS", 100))
    warmup = 3

    cfg = default_config(n)
    state = init_state(cfg)
    step = make_step(cfg, "cell_list")

    # warmup (compile + capacity sanity)
    for _ in range(warmup):
        state, aux = step(state)
    jax.block_until_ready(state)
    if int(aux.window_overflow) > 0:
        print(
            f"warning: window overflow {int(aux.window_overflow)} at warmup",
            file=sys.stderr,
        )

    t0 = time.perf_counter()
    for _ in range(steps):
        state, aux = step(state)
    jax.block_until_ready(state)
    dt = time.perf_counter() - t0

    steps_per_sec = steps / dt
    target = 100.0  # BASELINE.json north star
    print(
        json.dumps(
            {
                "metric": f"sph_timesteps_per_sec_n{n}",
                "value": round(steps_per_sec, 3),
                "unit": "timesteps/s",
                "vs_baseline": round(steps_per_sec / target, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
