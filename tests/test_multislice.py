"""Multi-slice (DCN) topology tests (SURVEY.md §2.5.3): slice-major mesh
ordering, DCN-boundary accounting, and step-equality of the sharded engine
over a multislice-constructed mesh on the 8-way virtual CPU mesh."""

import numpy as np
import pytest

from tpusph.core.config import default_config
from tpusph.core.init import init_state
from tpusph.dist.multislice import (
    SliceTopology,
    halo_bytes_per_boundary,
    make_multislice_mesh,
)
from tpusph.dist.sharded import (
    DistConfig,
    collect_state,
    distribute_state,
    make_sharded_step,
)
from tpusph.engine.step import make_step


class _FakeDev:
    """Mock multi-slice device: only the attributes the topology reads."""

    def __init__(self, did, slice_index):
        self.id = did
        self.slice_index = slice_index

    def __repr__(self):
        return f"dev{self.id}@slice{self.slice_index}"


def test_synthetic_slicing_groups_contiguously(eight_devices):
    topo = make_multislice_mesh(eight_devices, n_slices=2)
    assert topo.slice_of == (0, 0, 0, 0, 1, 1, 1, 1)
    assert topo.n_slices == 2
    assert topo.dcn_boundary_pairs() == [(3, 4)]
    # all 8 devices present, z axis
    assert topo.mesh.devices.shape == (8,)
    assert topo.mesh.axis_names == ("z",)


def test_slice_major_ordering_from_device_attrs():
    """Devices reporting interleaved slice_index must be regrouped
    slice-major, preserving enumeration order within each slice — the
    ordering that puts exactly n_slices−1 ppermute hops on DCN."""
    devs = [_FakeDev(i, slice_index=i % 2) for i in range(8)]
    topo = make_multislice_mesh(devs)
    assert topo.slice_of == (0, 0, 0, 0, 1, 1, 1, 1)
    ids = [d.id for d in topo.mesh.devices.flat]
    assert ids == [0, 2, 4, 6, 1, 3, 5, 7]  # stable within slices
    assert topo.dcn_boundary_pairs() == [(3, 4)]
    # n_slices overrides are ignored when real slice ids exist
    topo2 = make_multislice_mesh(devs, n_slices=4)
    assert topo2.n_slices == 2


def test_uneven_synthetic_slicing_rejected(eight_devices):
    with pytest.raises(ValueError):
        make_multislice_mesh(eight_devices, n_slices=3)


def test_boundary_payload_bound():
    # 256 halo rows, 128 migration rows: ONE 2h halo round (6·f32 + valid
    # = 25 B/row) + migration (+ i32 pid tag = 29 B/row), per direction
    assert halo_bytes_per_boundary(256, 128) == 256 * 25 + 128 * 29


def _collect_ppermute_bytes(jaxpr):
    """Recursively walk a jaxpr (descending into pjit/shard_map/scan inner
    jaxprs), summing operand bytes of every ppermute equation."""
    total = 0
    for eqn in jaxpr.eqns:
        if eqn.primitive.name == "ppermute":
            total += sum(
                v.aval.size * v.aval.dtype.itemsize for v in eqn.invars
            )
        for p in eqn.params.values():
            if hasattr(p, "jaxpr") and hasattr(p.jaxpr, "eqns"):  # ClosedJaxpr
                total += _collect_ppermute_bytes(p.jaxpr)
            elif hasattr(p, "eqns"):  # raw Jaxpr
                total += _collect_ppermute_bytes(p)
    return total


def test_boundary_payload_matches_step_ppermutes(eight_devices):
    """Anti-drift: halo_bytes_per_boundary must equal the bytes the sharded
    step ACTUALLY moves per boundary — computed from the ppermute operand
    shapes in the traced step (each device issues one up-send and one
    dn-send of every buffer per step, so per-device ppermute operand bytes
    = 2 directions × halo_bytes_per_boundary)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    cfg = default_config(512, chunk_size=512)
    dcfg = DistConfig(
        n_devices=8, dev_capacity=512, halo_capacity=256,
        migration_capacity=128,
    )
    mesh = Mesh(np.array(eight_devices), ("z",))
    st = init_state(cfg, random_init=True, seed=13)
    dstate = distribute_state(st, cfg, dcfg, mesh)
    step = make_sharded_step(cfg, dcfg, mesh)
    jaxpr = jax.make_jaxpr(lambda s: step(s))(dstate)
    got = _collect_ppermute_bytes(jaxpr.jaxpr)
    want = 2 * halo_bytes_per_boundary(
        dcfg.halo_capacity, dcfg.migration_capacity
    )
    assert got == want, (got, want)


def test_dcn_boundary_count_scales():
    for n_slices in (1, 2, 4):
        per = 8 // n_slices
        topo = SliceTopology(
            mesh=None,
            slice_of=tuple(i // per for i in range(8)),
        )
        assert len(topo.dcn_boundary_pairs()) == n_slices - 1


def test_dist_simulator_exposes_topology(eight_devices):
    """DistSimulator's default 1-D path must build through the multislice
    topology layer (identity order on single-slice platforms; synthetic
    n_slices splits for validation)."""
    from tpusph.core.config import default_config
    from tpusph.dist.simulator import DistSimulator

    cfg = default_config(512, chunk_size=512)
    sim = DistSimulator(cfg, devices=eight_devices, n_slices=2)
    assert sim.topology.n_slices == 2
    assert sim.topology.dcn_boundary_pairs() == [(3, 4)]
    assert sim.mesh.devices.shape == (8,)


@pytest.mark.slow
def test_sharded_step_over_multislice_mesh(eight_devices):
    """The sharded engine is topology-agnostic: running it over the
    slice-major multislice mesh (2 slices × 4 devices) must match the
    single-device engine exactly like the plain-mesh dist tests."""
    cfg = default_config(512, chunk_size=512)
    st = init_state(cfg, random_init=True, seed=13)
    steps = 6

    s = st
    single = make_step(cfg, "cell_list")
    for _ in range(steps):
        s, _ = single(s)
    ref_pos = np.asarray(s.position)[: cfg.num_particles]

    topo = make_multislice_mesh(eight_devices, n_slices=2)
    dcfg = DistConfig(
        n_devices=8, dev_capacity=512, halo_capacity=256,
        migration_capacity=128,
    )
    dstate = distribute_state(st, cfg, dcfg, topo.mesh)
    step = make_sharded_step(cfg, dcfg, topo.mesh)
    aux = None
    for _ in range(steps):
        dstate, aux = step(dstate)
    assert int(aux.halo_overflow) == 0
    assert int(aux.window_overflow) == 0
    got = collect_state(dstate, cfg.num_particles)
    np.testing.assert_allclose(got["position"], ref_pos, rtol=1e-4, atol=1e-4)
