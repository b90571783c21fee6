"""BASELINE config #5 exercise: ≥1M particles sharded over an 8-device mesh
(virtual CPU devices here; same program shape as an 8-chip ICI slice),
asserting the default capacity heuristics hold — zero halo / migration /
window overflow, zero misrouting, exact particle conservation — over several
steps of the dam-break trajectory.

Usage: python scripts/dist_scale_check.py [N] [steps] [n_devices]
"""

from __future__ import annotations

import os
import sys
import time

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_048_576
STEPS = int(sys.argv[2]) if len(sys.argv) > 2 else 5
NDEV = int(sys.argv[3]) if len(sys.argv) > 3 else 8

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + f" --xla_force_host_platform_device_count={NDEV}"
)
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

from tpusph.bench.times import Times
from tpusph.core.config import default_config
from tpusph.dist.simulator import DistSimulator


def main() -> None:
    devs = jax.devices("cpu")[:NDEV]
    assert len(devs) == NDEV, f"need {NDEV} devices, got {len(devs)}"
    cfg = default_config(N)
    sim = DistSimulator(cfg, devices=devs)
    t0 = time.perf_counter()
    sim.setup()
    print(f"setup: N={N} over {NDEV} devices "
          f"(dev_capacity={sim.dcfg.dev_capacity}, halo={sim.dcfg.halo_capacity}, "
          f"migration={sim.dcfg.migration_capacity}) in {time.perf_counter()-t0:.1f}s",
          flush=True)
    times = Times()
    for i in range(STEPS):
        t0 = time.perf_counter()
        sim.simulate()
        aux = sim.last_aux
        assert int(aux.num_particles) == N, f"step {i}: lost particles"
        for f in ("halo_overflow", "migration_overflow", "window_overflow",
                  "misrouted", "oob_count"):
            assert int(getattr(aux, f)) == 0, f"step {i}: {f} nonzero"
        print(f"step {i}: {time.perf_counter()-t0:6.2f}s  "
              f"alive={int(aux.num_particles)}", flush=True)
    print(f"OK: {STEPS} steps at N={N} on {NDEV} devices, zero overflow, "
          f"exact conservation", flush=True)


if __name__ == "__main__":
    main()
