"""Pallas megakernel tests (interpret mode on CPU — same kernel code the TPU
compiles, executed by the Pallas interpreter; real-hardware parity is also
verified on-device by the bench harness)."""

import jax
import numpy as np
import pytest

from tpusph.core.config import default_config
from tpusph.core.init import init_state
from tpusph.engine.step import step_cell_list, step_pallas, step_pallas_sorted


pytestmark = pytest.mark.slow


@pytest.fixture(
    scope="module",
    params=[
        ("grid", "col9", 128),
        ("random", "col9", 128),
        ("grid", "slab3", 128),
        ("random", "slab3", 128),
        ("random", "slab3", 256),
    ],
    ids=lambda p: f"{p[0]}-{p[1]}-bl{p[2]}",
)
def setup(request):
    init_mode, stencil, bl = request.param
    # small pallas capacities: the interpreter executes every predicated
    # block, so production-size capacities would crawl on CPU
    cfg = default_config(
        512, chunk_size=512, pallas_col_capacity=512, pallas_sub_blocks=4,
        pallas_stencil=stencil, pallas_block_lanes=bl,
    )
    st = init_state(cfg, random_init=(init_mode == "random"), seed=7)
    return cfg, st


def test_pallas_matches_cell_list(setup):
    cfg, st = setup
    a, _ = jax.jit(lambda s: step_cell_list(s, cfg))(st)
    b, aux = jax.jit(lambda s: step_pallas(s, cfg, interpret=True))(st)
    assert int(aux.window_overflow) == 0
    v = np.asarray(st.valid)
    np.testing.assert_allclose(
        np.asarray(b.density)[v], np.asarray(a.density)[v], rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(b.force)[v], np.asarray(a.force)[v], rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(b.position)[v], np.asarray(a.position)[v], rtol=1e-6, atol=1e-6
    )


def test_pallas_sorted_same_physics(setup):
    """The sorted-order variant yields the same particle set (as multisets) —
    identity is permuted, physics identical."""
    cfg, st = setup
    a, _ = jax.jit(lambda s: step_pallas(s, cfg, interpret=True))(st)
    b, _ = jax.jit(lambda s: step_pallas_sorted(s, cfg, interpret=True))(st)
    v_a = np.asarray(a.valid)
    v_b = np.asarray(b.valid)
    assert v_a.sum() == v_b.sum()

    def canon(pos):
        return pos[np.lexsort(pos.T)]

    np.testing.assert_allclose(
        canon(np.asarray(a.position)[v_a]),
        canon(np.asarray(b.position)[v_b]),
        rtol=1e-6,
        atol=1e-6,
    )


def test_pallas_capacity_overflow_detected():
    cfg = default_config(
        512, chunk_size=512, pallas_col_capacity=128, pallas_sub_blocks=1
    )
    st = init_state(cfg, random_init=True, seed=3)
    # 128-aligned starts + tile span exceed 128 capacity for some tile
    _, aux = jax.jit(lambda s: step_pallas(s, cfg, interpret=True))(st)
    assert int(aux.window_overflow) > 0
