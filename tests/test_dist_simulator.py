"""DistSimulator front-end tests (8 virtual CPU devices)."""

import numpy as np
import pytest

from tpusph.bench.times import Times
from tpusph.core.config import default_config
from tpusph.dist.simulator import DistSimulator
from tpusph.engine.simulator import Simulator

pytestmark = pytest.mark.slow


def test_dist_simulator_matches_single(eight_devices):
    cfg = default_config(512, chunk_size=512)
    dsim = DistSimulator(cfg, devices=eight_devices, random_init=True, seed=21)
    dsim.setup()
    sim = Simulator(cfg, backend="cell_list", random_init=True, seed=21)
    sim.setup()
    for _ in range(5):
        dsim.simulate()
        sim.simulate()
    assert dsim.num_particles_alive() == cfg.num_particles
    np.testing.assert_allclose(
        dsim.get_position(), sim.get_position(), rtol=1e-4, atol=1e-4
    )


def test_dist_simulate_and_time(eight_devices):
    cfg = default_config(512, chunk_size=512)
    dsim = DistSimulator(cfg, devices=eight_devices[:4])
    dsim.setup()
    times = Times()
    dsim.simulate_and_time(times)
    assert times.iters == 1 and times.sph_update > 0


def test_dist_capacity_growth(eight_devices):
    from tpusph.dist.sharded import DistConfig

    cfg = default_config(512, chunk_size=512)
    tiny = DistConfig(
        n_devices=8, dev_capacity=512, halo_capacity=8, migration_capacity=64
    )
    dsim = DistSimulator(cfg, devices=eight_devices, dcfg=tiny, random_init=True, seed=2)
    dsim.setup()
    dsim.simulate()  # must transparently grow the halo buffers
    assert dsim.dcfg.halo_capacity > 8
    assert dsim.num_particles_alive() == cfg.num_particles


def test_dist_simulator_mesh3d(eight_devices):
    """DistSimulator with a 3-D brick mesh matches the single-chip engine."""
    cfg = default_config(512, chunk_size=512)
    dsim = DistSimulator(
        cfg, devices=eight_devices, random_init=True, seed=21,
        mesh_shape=(2, 2, 2),
    )
    dsim.setup()
    sim = Simulator(cfg, backend="cell_list", random_init=True, seed=21)
    sim.setup()
    for _ in range(5):
        dsim.simulate()
        sim.simulate()
    assert dsim.num_particles_alive() == cfg.num_particles
    np.testing.assert_allclose(
        dsim.get_position(), sim.get_position(), rtol=1e-4, atol=1e-4
    )
