"""Measure free-mode frame throughput on the real TPU: double-buffered
(async) readback vs the sequential fetch loop (TPUSPH_VIZ_SYNC=1).

The async loop dispatches step k+1 before waiting on step k's position
transfer, so frame time ≈ max(step, fetch + render) instead of their sum
(the reference stalls on its D2H copy every frame, simulator.cu:479-480).

Usage: python scripts/freemode_bench.py [N] [frames] [mode-substring]
(the optional third arg filters the mode list by substring, e.g. "bitmap")
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tpusph.core.config import tuned_config
from tpusph.engine.simulator import Simulator
from tpusph.viz.render import run_free_mode


def run(n, frames, sync: bool, chunk: int = 0, pack="1"):
    if sync:
        os.environ["TPUSPH_VIZ_SYNC"] = "1"
    else:
        os.environ.pop("TPUSPH_VIZ_SYNC", None)
    if chunk > 1:
        os.environ["TPUSPH_VIZ_CHUNK"] = str(chunk)
        # measure the steady state: no tail-size chunk program (its one-off
        # compile through the remote-compile relay would poison the average)
        frames -= frames % chunk
    else:
        os.environ.pop("TPUSPH_VIZ_CHUNK", None)
    os.environ["TPUSPH_VIZ_PACK"] = pack if isinstance(pack, str) else (
        "1" if pack else "0"
    )
    sim = Simulator(tuned_config(n))
    sim.setup()
    with tempfile.TemporaryDirectory() as d:
        run_free_mode(sim, frames=max(4, chunk), out_dir=d)  # compile + warm
        t0 = time.perf_counter()
        run_free_mode(sim, frames=frames, out_dir=d)
        dt = time.perf_counter() - t0
    return dt / frames


def run_interactive(n, frames, sync: bool):
    """Interactive-window cadence: real FuncAnimation ticks driven under the
    matplotlib Agg backend (tick + full canvas draw — everything the live
    window pays except the OS blit)."""
    import matplotlib

    matplotlib.use("Agg", force=True)
    import matplotlib.pyplot as plt

    from tpusph.viz.render import _build_interactive

    if sync:
        os.environ["TPUSPH_VIZ_SYNC"] = "1"
    else:
        os.environ.pop("TPUSPH_VIZ_SYNC", None)
    sim = Simulator(tuned_config(n))
    sim.setup()
    fig, tick, _pending = _build_interactive(sim)
    try:
        for k in range(3):  # compile + warm the pipeline
            tick(k)
            fig.canvas.draw()
        t0 = time.perf_counter()
        for k in range(frames):
            tick(k)
            fig.canvas.draw()
        dt = time.perf_counter() - t0
    finally:
        plt.close(fig)
    return dt / frames


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
    frames = int(sys.argv[2]) if len(sys.argv) > 2 else 60
    modes = [("sync    ", True, 0, "1"), ("async   ", False, 0, "1")] + [
        (f"chunk{s:<2d}  ", False, s, "1") for s in (4, 8, 16)
    ] + [("chunk8 xyz", False, 8, "0")] + [
        (f"chunk{s:<2d} bitmap", False, s, "bitmap") for s in (8, 16)
    ]
    if len(sys.argv) > 3:
        modes = [m for m in modes if sys.argv[3] in m[0]]
    for name, sync, chunk, pack in modes:
        per = run(n, frames, sync, chunk, pack)
        print(f"{name} frame time: {per * 1e3:7.2f} ms "
              f"({1 / per:6.1f} fps) at N={n}", flush=True)
    if len(sys.argv) > 3 and "interactive" in sys.argv[3]:
        for name, sync in (("interactive sync", True),
                           ("interactive pipe", False)):
            per = run_interactive(n, frames, sync)
            print(f"{name} tick time: {per * 1e3:7.2f} ms "
                  f"({1 / per:6.1f} fps) at N={n}", flush=True)


if __name__ == "__main__":
    main()
