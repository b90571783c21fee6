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
        ("grid", "col9", 128, False),
        ("random", "col9", 128, True),
        ("grid", "slab3", 128, False),
        ("random", "slab3", 128, False),
        ("random", "slab3", 256, True),
        ("grid", "slab3", 256, False),
        ("grid", "hybrid", 128, True),
        ("grid", "hybrid", 128, False),
        ("random", "hybrid", 256, True),
    ],
    ids=lambda p: f"{p[0]}-{p[1]}-bl{p[2]}{'-desc' if p[3] else ''}",
)
def setup(request):
    init_mode, stencil, bl, desc = request.param
    # small pallas capacities: the interpreter executes every predicated
    # block, so production-size capacities would crawl on CPU
    cfg = default_config(
        512, chunk_size=512, pallas_col_capacity=512, pallas_sub_blocks=4,
        pallas_stencil=stencil, pallas_block_lanes=bl, pallas_desc=desc,
        pallas_desc_blocks=48,
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
        512, chunk_size=512, pallas_col_capacity=256, pallas_sub_blocks=1,
        pallas_block_lanes=128,
    )
    st = init_state(cfg, random_init=True, seed=3)
    # 128-aligned starts + tile span exceed the tiny capacity for some tile
    _, aux = jax.jit(lambda s: step_pallas(s, cfg, interpret=True))(st)
    assert int(aux.window_overflow) > 0


def test_pallas_desc_unroll_matches_plain():
    """The unrolled descriptor loop (dead-block padding into the parking
    segment) must be bit-identical to the u=1 desc loop: dead blocks
    contribute exactly zero, live block order is unchanged."""
    import dataclasses

    import jax.numpy as jnp

    from tpusph.neighbors.cell_list import build_sorted_fields
    from tpusph.pallas.fused import (
        density_pallas,
        force_pallas,
        supertile_columns,
    )
    from tpusph.physics.kernels import pressure_from_density

    base = default_config(
        512, chunk_size=512, pallas_col_capacity=512, pallas_sub_blocks=4,
        pallas_stencil="slab3", pallas_block_lanes=128, pallas_desc=True,
        pallas_desc_blocks=48,
    )
    st = init_state(base, random_init=True, seed=7)
    outs = {}
    for u in (1, 2, 4):
        cfg = dataclasses.replace(base, pallas_desc_unroll=u)
        sf = jax.jit(
            lambda s: build_sorted_fields(s.position, s.velocity, s.valid, cfg)
        )(st)
        cols = jax.jit(
            lambda sf: supertile_columns(
                sf.key_sorted, sf.valid_sorted, sf.starts, cfg
            )
        )(sf)
        assert int(cols.overflow) == 0
        xyz = (sf.x, sf.y, sf.z)
        rho = density_pallas(xyz, sf.key_sorted, cols, cfg, interpret=True)
        rho_c, p_c = pressure_from_density(rho, cfg)
        rho_c = jnp.where(sf.valid_sorted, rho_c, 1.0)
        p_c = jnp.where(sf.valid_sorted, p_c, 0.0)
        f = force_pallas(
            xyz, (sf.vx, sf.vy, sf.vz), rho_c, p_c, sf.key_sorted, cols, cfg,
            interpret=True,
        )
        outs[u] = (np.asarray(rho), np.asarray(f))
    for u in (2, 4):
        np.testing.assert_array_equal(outs[u][0], outs[1][0])
        np.testing.assert_array_equal(outs[u][1], outs[1][1])


def test_streamed_records_match_prefetch():
    """pallas_stream_desc (per-program HBM→SMEM record DMA instead of the
    O(ntiles) scalar prefetch — the no-SMEM-ceiling mode for 2M+) must be
    bit-identical to the prefetch path, with and without the desc loop and
    on the hybrid stencil."""
    import dataclasses

    for stencil, desc in (("slab3", True), ("slab3", False), ("hybrid", True)):
        base = default_config(
            512, chunk_size=512, pallas_col_capacity=512, pallas_sub_blocks=4,
            pallas_stencil=stencil, pallas_block_lanes=128,
            pallas_desc=desc, pallas_desc_blocks=48,
            pallas_desc_unroll=2 if desc else 1, pallas_force_fold=True,
        )
        st = init_state(base, random_init=True, seed=7)
        stream = dataclasses.replace(base, pallas_stream_desc=True)
        a, _ = jax.jit(lambda s: step_pallas(s, base, interpret=True))(st)
        b, aux = jax.jit(lambda s: step_pallas(s, stream, interpret=True))(st)
        assert int(aux.window_overflow) == 0
        np.testing.assert_array_equal(
            np.asarray(a.density), np.asarray(b.density), err_msg=stencil
        )
        np.testing.assert_array_equal(
            np.asarray(a.force), np.asarray(b.force), err_msg=stencil
        )


def test_single_slot_buffer_matches_double():
    """2M-class window capacities trip the scoped-VMEM budget and drop the
    candidate buffer to ONE slot (each program pays its own DMA): results
    must be identical to the double-buffered path."""
    import dataclasses

    from tpusph.pallas.fused import _cand_slots

    base = default_config(
        512, chunk_size=512, pallas_col_capacity=512, pallas_sub_blocks=4,
        pallas_stencil="slab3", pallas_block_lanes=128,
    )
    big = dataclasses.replace(
        base, pallas_col_capacity=49152, pallas_sub_blocks=400
    )
    assert _cand_slots(base, 16) == 2 and _cand_slots(big, 16) == 1
    st = init_state(base, random_init=True, seed=7)
    a, _ = jax.jit(lambda s: step_pallas(s, base, interpret=True))(st)
    b, aux = jax.jit(lambda s: step_pallas(s, big, interpret=True))(st)
    assert int(aux.window_overflow) == 0
    np.testing.assert_array_equal(np.asarray(a.density), np.asarray(b.density))
    np.testing.assert_allclose(
        np.asarray(a.force), np.asarray(b.force), rtol=1e-6, atol=1e-7
    )


def test_align128_matches_block_aligned():
    """128-lane window-start alignment only changes which dead lead-in
    lanes get scanned (rejected by the same key-mask / fast-guard
    arguments): physics matches the block-aligned default to roundoff,
    across stencils and with finer DMA parts (whose transfer conditions
    must cover block-rounded scan overrun — the scan_pad contract)."""
    import dataclasses

    for stencil in ("slab3", "hybrid"):
        base = default_config(
            512, chunk_size=512, pallas_col_capacity=1024,
            pallas_sub_blocks=8, pallas_stencil=stencil,
            pallas_block_lanes=256, pallas_desc=True, pallas_desc_blocks=48,
            pallas_force_slim=True,
            pallas_ranged_maskless=(stencil == "hybrid"),
        )
        st = init_state(base, random_init=True, seed=7)
        a, _ = jax.jit(lambda s, c=base: step_pallas(s, c, interpret=True))(st)
        for extra in (
            {"pallas_align128": True},
            {"pallas_align128": True, "pallas_dma_parts": 8},
        ):
            cfg = dataclasses.replace(base, **extra)
            b, aux = jax.jit(
                lambda s, c=cfg: step_pallas(s, c, interpret=True)
            )(st)
            assert int(aux.window_overflow) == 0
            np.testing.assert_allclose(
                np.asarray(a.density), np.asarray(b.density), rtol=1e-5
            )
            np.testing.assert_allclose(
                np.asarray(a.force), np.asarray(b.force), rtol=1e-4,
                atol=1e-5,
            )


def test_dma_parts_match_halves():
    """Raising the conditional window-DMA granularity (pallas_dma_parts)
    only changes WHICH capacity lanes transfer — every lane the kernels can
    scan still arrives, so results are bit-identical to the 2-part default."""
    import dataclasses

    base = default_config(
        512, chunk_size=512, pallas_col_capacity=1024, pallas_sub_blocks=8,
        pallas_stencil="hybrid", pallas_block_lanes=128, pallas_desc=True,
        pallas_desc_blocks=48, pallas_force_slim=True,
    )
    st = init_state(base, random_init=True, seed=7)
    a, _ = jax.jit(lambda s: step_pallas(s, base, interpret=True))(st)
    for parts in (4, 8):
        cfg = dataclasses.replace(base, pallas_dma_parts=parts)
        b, aux = jax.jit(lambda s, c=cfg: step_pallas(s, c, interpret=True))(st)
        assert int(aux.window_overflow) == 0
        np.testing.assert_array_equal(
            np.asarray(a.density), np.asarray(b.density), err_msg=str(parts)
        )
        np.testing.assert_array_equal(
            np.asarray(a.force), np.asarray(b.force), err_msg=str(parts)
        )


def test_force_fold_matches_plain():
    """The folded force carry changes lane summation order only: results
    match the unfolded kernel to float roundoff."""
    import dataclasses

    base = default_config(
        512, chunk_size=512, pallas_col_capacity=512, pallas_sub_blocks=4,
        pallas_stencil="slab3", pallas_block_lanes=256,
    )
    st = init_state(base, random_init=True, seed=7)
    a, _ = jax.jit(lambda s: step_pallas(s, base, interpret=True))(st)
    fold = dataclasses.replace(base, pallas_force_fold=True)
    b, _ = jax.jit(lambda s: step_pallas(s, fold, interpret=True))(st)
    np.testing.assert_array_equal(np.asarray(a.density), np.asarray(b.density))
    np.testing.assert_allclose(
        np.asarray(a.force), np.asarray(b.force), rtol=1e-5, atol=1e-6
    )

def test_force_split_matches_plain():
    """Split-target compute (two pt/2 halves per block sharing one
    candidate load) is pure rescheduling: per-target pair sets and
    per-lane summation order are unchanged, so results are bit-identical
    to the unsplit kernel."""
    import dataclasses

    base = default_config(
        512, chunk_size=512, pallas_col_capacity=512, pallas_sub_blocks=4,
        pallas_stencil="slab3", pallas_block_lanes=256,
        pallas_force_fold=True,
    )
    st = init_state(base, random_init=True, seed=7)
    a, _ = jax.jit(lambda s: step_pallas(s, base, interpret=True))(st)
    split = dataclasses.replace(base, pallas_force_split=True)
    b, _ = jax.jit(lambda s: step_pallas(s, split, interpret=True))(st)
    np.testing.assert_array_equal(np.asarray(a.density), np.asarray(b.density))
    np.testing.assert_array_equal(np.asarray(a.force), np.asarray(b.force))


def test_force_lane_split_matches_fold():
    """Candidate-lane split computes each bl/2-lane half on half-width
    temps; slicing an elementwise computation commutes with it and the
    half-sum reproduces the fold's exact add tree — bit-identical to the
    folded kernel (with and without target split on top)."""
    import dataclasses

    base = default_config(
        512, chunk_size=512, pallas_col_capacity=512, pallas_sub_blocks=4,
        pallas_stencil="slab3", pallas_block_lanes=256,
        pallas_force_fold=True, pallas_force_split=True,
    )
    st = init_state(base, random_init=True, seed=7)
    a, _ = jax.jit(lambda s: step_pallas(s, base, interpret=True))(st)
    for extra in ({}, {"pallas_force_split": False}):
        ls = dataclasses.replace(
            base, pallas_force_lane_split=True, **extra
        )
        b, _ = jax.jit(lambda s: step_pallas(s, ls, interpret=True))(st)
        np.testing.assert_array_equal(
            np.asarray(a.density), np.asarray(b.density)
        )
        np.testing.assert_array_equal(
            np.asarray(a.force), np.asarray(b.force)
        )
    # the hybrid SLOW path carries the slab_ranged lane bound, which the
    # lane split offsets per half — cover it too (1M/2M presets run
    # hybrid + lane split)
    hy = dataclasses.replace(base, pallas_stencil="hybrid")
    a, _ = jax.jit(lambda s: step_pallas(s, hy, interpret=True))(st)
    hls = dataclasses.replace(hy, pallas_force_lane_split=True)
    b, _ = jax.jit(lambda s: step_pallas(s, hls, interpret=True))(st)
    np.testing.assert_array_equal(np.asarray(a.density), np.asarray(b.density))
    np.testing.assert_array_equal(np.asarray(a.force), np.asarray(b.force))


def test_density_lane_split_matches_plain():
    """Density lane-split: each half accumulates into its own carry half —
    carry lanes never mix, so the result is bit-identical, on both the
    slab3 and hybrid (slab_ranged slow path) stencils."""
    import dataclasses

    for stencil in ("slab3", "hybrid"):
        base = default_config(
            512, chunk_size=512, pallas_col_capacity=512,
            pallas_sub_blocks=4, pallas_stencil=stencil,
            pallas_block_lanes=256,
        )
        st = init_state(base, random_init=True, seed=7)
        a, _ = jax.jit(lambda s: step_pallas(s, base, interpret=True))(st)
        dls = dataclasses.replace(base, pallas_density_lane_split=True)
        b, _ = jax.jit(lambda s: step_pallas(s, dls, interpret=True))(st)
        np.testing.assert_array_equal(
            np.asarray(a.density), np.asarray(b.density)
        )
        np.testing.assert_array_equal(
            np.asarray(a.force), np.asarray(b.force)
        )


def test_force_slim_matches_plain():
    """Slim 8-row force candidate layout: the dropped p·1/(2ρ) row is
    recovered per block as max(0, ½k − kρ₀·i2r). Since ρ·i2r ≡ ½ only to
    1 ulp, force matches to tight float tolerance (≪ the 1e-4 physics
    budget); density is untouched and must be bit-identical. Covers the
    fast path, the slab3 slow path, and the hybrid slab_ranged slow path
    (sub_fast forced off), with and without the descriptor loop and the
    split/fold/lane-split machinery on top."""
    import dataclasses

    for stencil, extra in (
        ("slab3", {}),
        ("hybrid", {}),
        ("slab3", {"pallas_desc": True, "pallas_desc_blocks": 48,
                   "pallas_desc_unroll": 2}),
        ("slab3", {"pallas_force_fold": True, "pallas_force_split": True,
                   "pallas_force_lane_split": True}),
    ):
        base = default_config(
            512, chunk_size=512, pallas_col_capacity=512,
            pallas_sub_blocks=4, pallas_stencil=stencil,
            pallas_block_lanes=256, **extra,
        )
        st = init_state(base, random_init=True, seed=7)
        a, _ = jax.jit(lambda s, c=base: step_pallas(s, c, interpret=True))(st)
        slim = dataclasses.replace(base, pallas_force_slim=True)
        b, _ = jax.jit(lambda s, c=slim: step_pallas(s, c, interpret=True))(st)
        np.testing.assert_array_equal(
            np.asarray(a.density), np.asarray(b.density),
            err_msg=f"{stencil} {extra} density",
        )
        fa, fb = np.asarray(a.force), np.asarray(b.force)
        scale = np.abs(fa).max() or 1.0
        np.testing.assert_allclose(
            fb, fa, atol=2e-5 * scale,
            err_msg=f"{stencil} {extra} force",
        )


def test_force_selfless_matches_plain():
    """Selfless force guard (config.pallas_force_selfless): the r ≥ eps
    compare and both per-term selects drop out; the self-pair cancels
    through exact dx = dv = 0 with inv_r kept finite by the r² clamp.
    Live lanes see bit-identical arithmetic (the clamp is a no-op at
    r² ≥ eps²) and masked lanes yield ±0 by multiplication instead of
    select — the full step must match exactly on every stencil, fast and
    slow paths, with the slim/desc/ranged-maskless machinery on top."""
    import dataclasses

    for stencil, extra in (
        ("col9", {}),
        ("slab3", {}),
        ("hybrid", {}),
        ("slab3", {"pallas_desc": True, "pallas_desc_blocks": 48,
                   "pallas_desc_unroll": 2, "pallas_force_slim": True}),
        ("hybrid", {"pallas_ranged_maskless": True,
                    "pallas_force_slim": True}),
        ("slab3", {"pallas_force_fold": True, "pallas_force_split": True,
                   "pallas_force_lane_split": True}),
    ):
        base = default_config(
            512, chunk_size=512, pallas_col_capacity=512,
            pallas_sub_blocks=4, pallas_stencil=stencil,
            pallas_block_lanes=256, **extra,
        )
        st = init_state(base, random_init=True, seed=7)
        a, _ = jax.jit(lambda s, c=base: step_pallas(s, c, interpret=True))(st)
        sl = dataclasses.replace(base, pallas_force_selfless=True)
        b, _ = jax.jit(lambda s, c=sl: step_pallas(s, c, interpret=True))(st)
        np.testing.assert_array_equal(
            np.asarray(a.density), np.asarray(b.density),
            err_msg=f"{stencil} {extra} density",
        )
        np.testing.assert_array_equal(
            np.asarray(a.force), np.asarray(b.force),
            err_msg=f"{stencil} {extra} force",
        )


def test_density_narrow_load_matches_plain():
    """The 4-row narrow block load only drops sublane rows the kernel
    never reads — bit-identical on every stencil, fast and slow paths."""
    import dataclasses

    for stencil in ("col9", "slab3", "hybrid"):
        base = default_config(
            512, chunk_size=512, pallas_col_capacity=512,
            pallas_sub_blocks=4, pallas_stencil=stencil,
            pallas_block_lanes=256,
        )
        st = init_state(base, random_init=True, seed=7)
        a, _ = jax.jit(lambda s, c=base: step_pallas(s, c, interpret=True))(st)
        nl = dataclasses.replace(base, pallas_density_narrow_load=True)
        b, _ = jax.jit(lambda s, c=nl: step_pallas(s, c, interpret=True))(st)
        np.testing.assert_array_equal(
            np.asarray(a.density), np.asarray(b.density), err_msg=stencil
        )
        np.testing.assert_array_equal(
            np.asarray(a.force), np.asarray(b.force), err_msg=stencil
        )


def test_ranged_maskless_matches_masked():
    """Maskless ranged slow path (hybrid): with prep-trimmed pairwise-
    disjoint ranges the per-lane [lead, cnt) bound alone counts every
    stencil pair exactly once, and the distance cutoffs supply exact
    physics for whatever else the ranges scan. Forced all-slow so the
    slow branch actually runs. Dense (grid) init keeps tile spans below
    the slab-overlap threshold → the trim is a no-op and results are
    BIT-identical; sparse (random) init at 512 particles in 10³ cells
    produces tile spans > C²−2C−3 → the trim actively moves lanes
    between plane windows (summation order changes), so compare to tight
    float tolerance AND against the untrimmed masked path."""
    import dataclasses

    import jax.numpy as jnp

    from tpusph.neighbors.cell_list import build_sorted_fields
    from tpusph.pallas.fused import (
        density_pallas,
        force_pallas,
        supertile_columns,
    )
    from tpusph.physics.kernels import pressure_from_density

    for init_random, exact in ((False, True), (True, False)):
        base = default_config(
            512, chunk_size=512, pallas_col_capacity=1024,
            pallas_sub_blocks=8, pallas_stencil="hybrid",
            pallas_block_lanes=128,
        )
        st = init_state(base, random_init=init_random, seed=11)
        sf = jax.jit(
            lambda s, cfg=base: build_sorted_fields(
                s.position, s.velocity, s.valid, cfg
            )
        )(st)
        outs = {}
        for ml in (False, True):
            cfg = dataclasses.replace(base, pallas_ranged_maskless=ml)
            cols = jax.jit(
                lambda sf, cfg=cfg: supertile_columns(
                    sf.key_sorted, sf.valid_sorted, sf.starts, cfg
                )
            )(sf)
            assert int(cols.overflow) == 0
            cols = cols._replace(sub_fast=jnp.zeros_like(cols.sub_fast))
            xyz = (sf.x, sf.y, sf.z)
            rho = density_pallas(xyz, sf.key_sorted, cols, cfg,
                                 interpret=True)
            rho_c, p_c = pressure_from_density(rho, cfg)
            rho_c = jnp.where(sf.valid_sorted, rho_c, 1.0)
            p_c = jnp.where(sf.valid_sorted, p_c, 0.0)
            f = force_pallas(
                xyz, (sf.vx, sf.vy, sf.vz), rho_c, p_c, sf.key_sorted,
                cols, cfg, interpret=True,
            )
            outs[ml] = (np.asarray(rho), np.asarray(f))
        tag = "grid" if not init_random else "random"
        if exact:
            np.testing.assert_array_equal(outs[True][0], outs[False][0],
                                          err_msg=f"{tag} density")
            np.testing.assert_array_equal(outs[True][1], outs[False][1],
                                          err_msg=f"{tag} force")
        else:
            np.testing.assert_allclose(outs[True][0], outs[False][0],
                                       rtol=1e-6, err_msg=f"{tag} density")
            fscale = np.abs(outs[False][1]).max() or 1.0
            np.testing.assert_allclose(
                outs[True][1], outs[False][1], atol=2e-5 * fscale,
                err_msg=f"{tag} force",
            )


def test_ranged_maskless_full_step_matches_cell_list():
    """Ground truth: a full maskless-hybrid step (natural fast/slow mix)
    must match the independent XLA cell-list step within the physics
    parity budget, on both dense and sparse inits."""
    import dataclasses

    for init_random in (False, True):
        cfg = default_config(
            512, chunk_size=512, pallas_col_capacity=1024,
            pallas_sub_blocks=8, pallas_stencil="hybrid",
            pallas_block_lanes=128, pallas_ranged_maskless=True,
        )
        st = init_state(cfg, random_init=init_random, seed=3)
        ref, _ = jax.jit(lambda s, c=cfg: step_cell_list(s, c))(st)
        got, aux = jax.jit(
            lambda s, c=cfg: step_pallas(s, c, interpret=True)
        )(st)
        assert int(aux.window_overflow) == 0
        np.testing.assert_allclose(
            np.asarray(got.density), np.asarray(ref.density), rtol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(got.position), np.asarray(ref.position), atol=1e-4
        )


def test_pallas_desc_blocks_fallback_correct():
    """Tiles whose block total exceeds pallas_desc_blocks must fall back to
    the select-chain branch with IDENTICAL physics (MB is a performance
    knob, never a capacity): a deliberately tiny MB forces (nearly) every
    tile down the fallback and the step must still match cell_list."""
    import dataclasses

    tiny = default_config(
        512, chunk_size=512, pallas_col_capacity=512, pallas_sub_blocks=4,
        pallas_block_lanes=128, pallas_desc=True, pallas_desc_blocks=2,
    )
    st = init_state(tiny, random_init=True, seed=3)
    ref_cfg = dataclasses.replace(
        tiny, pallas_desc=False, pallas_desc_unroll=1
    )
    a, aux = jax.jit(lambda s: step_pallas(s, tiny, interpret=True))(st)
    b, _ = jax.jit(lambda s: step_pallas(s, ref_cfg, interpret=True))(st)
    assert int(aux.window_overflow) == 0  # MB misfit is NOT overflow
    np.testing.assert_array_equal(np.asarray(a.density), np.asarray(b.density))
    np.testing.assert_array_equal(np.asarray(a.force), np.asarray(b.force))


def _compact_state(cfg, seed=11):
    """A state whose 128-target tiles have SMALL sorted-key spans, so the
    prep actually marks sub-tiles fast (grid/random init at N=512 spans
    multiple z-planes, which correctly forces every sub slow and would
    exercise nothing). col9 fast needs span ≤ C−3 → confine to one (y,z)
    row with ~6 particles/cell; slab3 only needs in-plane isolation → one
    z-plane is enough (and leaves plenty of geometric-zero lanes around
    each window for the block-rounding guards)."""
    import jax.numpy as jnp

    from tpusph.core.state import FluidState

    rng = np.random.default_rng(seed)
    n = cfg.padded_num_particles
    x = rng.uniform(1.0, 9.0, size=(n, 1))
    if cfg.pallas_stencil == "col9":
        y = rng.uniform(0.12, 0.18, size=(n, 1))
    else:
        y = rng.uniform(1.0, 5.0, size=(n, 1))
    z = rng.uniform(0.12, 0.18, size=(n, 1))
    pos = jnp.asarray(np.concatenate([x, y, z], axis=1), jnp.float32)
    return FluidState(
        position=pos,
        velocity=jnp.zeros((n, 3), jnp.float32),
        force=jnp.zeros((n, 3), jnp.float32),
        density=jnp.ones((n,), jnp.float32),
        pressure=jnp.zeros((n,), jnp.float32),
        valid=jnp.ones((n,), bool),
    )


def test_fast_flag_equals_forced_slow(setup):
    """Isolate the fast-path proof: the mask-free fast branch must produce
    EXACTLY the result of the key-masked slow branch on every sub-tile the
    prep marks fast. Run the density kernel with prep's flags and again with
    every sub forced slow — bitwise equality required (same pairs, same
    summation order)."""
    import jax.numpy as jnp

    from tpusph.neighbors.cell_list import build_sorted_fields
    from tpusph.pallas.fused import density_pallas, supertile_columns

    cfg, _ = setup
    st = _compact_state(cfg)
    sf = jax.jit(
        lambda s: build_sorted_fields(s.position, s.velocity, s.valid, cfg)
    )(st)
    cols = jax.jit(
        lambda sf: supertile_columns(sf.key_sorted, sf.valid_sorted, sf.starts, cfg)
    )(sf)
    assert int(cols.overflow) == 0
    assert int(np.asarray(cols.sub_fast).sum()) > 0, "no fast subs exercised"
    xyz = (sf.x, sf.y, sf.z)
    rho_fast = density_pallas(xyz, sf.key_sorted, cols, cfg, interpret=True)
    cols_slow = cols._replace(sub_fast=jnp.zeros_like(cols.sub_fast))
    rho_slow = density_pallas(xyz, sf.key_sorted, cols_slow, cfg, interpret=True)
    np.testing.assert_array_equal(
        np.asarray(rho_fast), np.asarray(rho_slow)
    )


def test_hybrid_modes_agree_and_match_slab3():
    """The hybrid stencil's two per-sub layouts must compute the same
    physics: force every eligible sub to col mode (bias −inf) and every sub
    to slab mode (bias +inf) via the selection bias, and compare both
    against the plain slab3 stencil. Same pairs in each case; summation
    order differs across window layouts, so tolerance is float-roundoff,
    not bitwise. Uses a compact state (narrow tile key spans) so the
    span ≤ C−3 gate actually admits col mode."""
    import dataclasses

    base = default_config(
        512, chunk_size=512, pallas_col_capacity=512, pallas_sub_blocks=4,
        pallas_stencil="col9", pallas_block_lanes=128,
    )
    st = _compact_state(base)  # col9-style: one (y,z) row → narrow spans
    base = dataclasses.replace(base, pallas_stencil="hybrid")
    ref_cfg = dataclasses.replace(base, pallas_stencil="slab3")
    ref, _ = jax.jit(lambda s: step_pallas(s, ref_cfg, interpret=True))(st)
    v = np.asarray(st.valid)
    for bias in (-1e9, 1e9):
        cfg = dataclasses.replace(base, pallas_hybrid_bias=bias)
        if bias < 0:  # the forced-col case must actually exercise col mode
            from tpusph.neighbors.cell_list import build_sorted_fields
            from tpusph.pallas.fused import supertile_columns

            sf = jax.jit(
                lambda s: build_sorted_fields(
                    s.position, s.velocity, s.valid, cfg
                )
            )(st)
            cols = jax.jit(
                lambda sf: supertile_columns(
                    sf.key_sorted, sf.valid_sorted, sf.starts, cfg
                )
            )(sf)
            assert int(np.asarray(cols.sub_mode).sum()) > 0, "no col subs"
        out, aux = jax.jit(lambda s: step_pallas(s, cfg, interpret=True))(st)
        assert int(aux.window_overflow) == 0
        np.testing.assert_allclose(
            np.asarray(out.density)[v], np.asarray(ref.density)[v], rtol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(out.force)[v], np.asarray(ref.force)[v],
            rtol=1e-4, atol=1e-5,
        )


def test_sub_descriptor_dtype_widens_past_int16():
    """Capacity auto-grow past the int16 range must widen the SMEM sub-window
    descriptors instead of silently wrapping. Non-hybrid stencils store cnt
    in BLOCK units and stay int16 at 2M-class capacities (the SMEM-budget
    enabler); hybrid stores lanes (its ranged bound needs them) and widens."""
    import jax.numpy as jnp

    from tpusph.neighbors.cell_list import build_sorted_fields
    from tpusph.pallas.fused import density_pallas, supertile_columns

    small = default_config(
        512, chunk_size=512, pallas_col_capacity=512, pallas_sub_blocks=4,
        pallas_block_lanes=128,
    )
    big_slab = default_config(
        512, chunk_size=512, pallas_col_capacity=65536,
        pallas_sub_blocks=512, pallas_block_lanes=128,
    )
    big_hybrid = default_config(
        512, chunk_size=512, pallas_col_capacity=65536,
        pallas_sub_blocks=512, pallas_block_lanes=128,
        pallas_stencil="hybrid",
    )
    st = init_state(small, random_init=True, seed=7)
    for cfg, want in (
        (small, jnp.int16),
        (big_slab, jnp.int16),  # block-unit cnt keeps int16 viable
        (big_hybrid, jnp.int32),  # lane-unit cnt must widen
    ):
        sf = jax.jit(
            lambda s: build_sorted_fields(s.position, s.velocity, s.valid, cfg)
        )(st)
        cols = jax.jit(
            lambda sf: supertile_columns(
                sf.key_sorted, sf.valid_sorted, sf.starts, cfg
            )
        )(sf)
        assert cols.sub_base.dtype == want
        assert cols.sub_cnt.dtype == want
        # the kernel consumes either width
        rho = density_pallas(
            (sf.x, sf.y, sf.z), sf.key_sorted, cols, cfg, interpret=True
        )
        assert bool(jnp.all(rho > 0))


def test_rank_prep_equals_gather_prep():
    """The two-sort rank lookup (pallas_rank_prep) must reproduce the
    gather-path TileColumns EXACTLY (integer ranks are starts[q] by
    construction) for every stencil, with the descriptor loop on."""
    import dataclasses

    from tpusph.neighbors.cell_list import build_sorted_fields
    from tpusph.pallas.fused import supertile_columns

    for stencil in ("slab3", "col9", "hybrid"):
        base = default_config(
            512, chunk_size=512, pallas_col_capacity=512,
            pallas_sub_blocks=4, pallas_stencil=stencil,
            pallas_block_lanes=128, pallas_desc=True, pallas_desc_blocks=48,
        )
        st = init_state(base, random_init=True, seed=11)
        sf = jax.jit(
            lambda s, cfg=base: build_sorted_fields(
                s.position, s.velocity, s.valid, cfg
            )
        )(st)
        cols = {}
        for rank in (False, True):
            cfg = dataclasses.replace(base, pallas_rank_prep=rank)
            cols[rank] = jax.jit(
                lambda sf, cfg=cfg: supertile_columns(
                    sf.key_sorted, sf.valid_sorted, sf.starts, cfg
                )
            )(sf)
        for field in cols[False]._fields:
            a, b = getattr(cols[False], field), getattr(cols[True], field)
            if a is None:
                assert b is None, field
                continue
            np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b), err_msg=f"{stencil}.{field}"
            )


def test_rank_queries_pallas_exact():
    """The query-rank kernel (pallas/qrank.py) must equal searchsorted
    left-ranks for arbitrary query arrays, and detect kcap overflow
    instead of misranking."""
    import dataclasses

    import jax.numpy as jnp

    from tpusph.pallas.qrank import rank_queries_pallas

    rng = np.random.default_rng(3)
    cfg = default_config(
        4096, pallas_qrank_chunks=4, pallas_qrank_kcap=2048
    )
    # nq >> n/kcap so per-program key spans stay under kcap (a sparse
    # query set over a huge key array is a legitimate capacity miss —
    # covered by the overflow case below). n % 256 == 0 per the kernel's
    # contract (production sorted fields are tile-padded).
    for n, nq in ((3072, 700), (512, 2500), (4096, 900)):
        keys = np.sort(rng.integers(0, 900, n)).astype(np.int32)
        qs = rng.integers(0, 902, nq).astype(np.int32)
        ranks, ovf = rank_queries_pallas(
            jnp.asarray(keys), jnp.asarray(qs), cfg, interpret=True
        )
        assert int(ovf) == 0
        np.testing.assert_array_equal(
            np.asarray(ranks), np.searchsorted(keys, qs, side="left")
        )
    # windows strictly interior to the array (n >> 2*kcap): exercises the
    # clamped window start + in-window block offsets
    small = dataclasses.replace(cfg, pallas_qrank_kcap=1024)
    keys = np.sort(rng.integers(0, 900, 8192)).astype(np.int32)
    qs = rng.integers(0, 902, 4096).astype(np.int32)
    ranks, ovf = rank_queries_pallas(
        jnp.asarray(keys), jnp.asarray(qs), small, interpret=True
    )
    assert int(ovf) == 0
    np.testing.assert_array_equal(
        np.asarray(ranks), np.searchsorted(keys, qs, side="left")
    )
    # all keys equal and queries straddling them: one program's span is the
    # whole key array -> must report overflow, not misrank silently
    keys = np.full(3072, 50, np.int32)
    qs = np.array([0, 51] * 40, np.int32)
    _, ovf = rank_queries_pallas(
        jnp.asarray(keys), jnp.asarray(qs), small, interpret=True
    )
    assert int(ovf) > 0

def test_query_rank_prep_equals_sort_prep():
    """pallas_query_rank must reproduce the rank-sort TileColumns EXACTLY
    (both compute integer left-ranks) for every stencil."""
    import dataclasses

    from tpusph.neighbors.cell_list import build_sorted_fields
    from tpusph.pallas.fused import supertile_columns

    for stencil in ("slab3", "col9", "hybrid"):
        base = default_config(
            512, chunk_size=512, pallas_col_capacity=512,
            pallas_sub_blocks=4, pallas_stencil=stencil,
            pallas_block_lanes=128, pallas_qrank_chunks=4,
            pallas_qrank_kcap=2048,
        )
        st = init_state(base, random_init=True, seed=12)
        sf = jax.jit(
            lambda s, cfg=base: build_sorted_fields(
                s.position, s.velocity, s.valid, cfg
            )
        )(st)
        cols = {}
        for qr in (False, True):
            cfg = dataclasses.replace(base, pallas_query_rank=qr)
            cols[qr] = jax.jit(
                lambda sf, cfg=cfg: supertile_columns(
                    sf.key_sorted, sf.valid_sorted, sf.starts, cfg, True
                )
            )(sf)
        for field in cols[False]._fields:
            a, b = getattr(cols[False], field), getattr(cols[True], field)
            if a is None:
                assert b is None, field
                continue
            np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b), err_msg=f"{stencil}.{field}"
            )


def test_slow_unroll_matches_plain():
    """pallas_slow_unroll=2 (select-chain loop padded onto the parking row,
    two blocks per fori iteration) must be bit-identical to the plain slow
    loop: the single pad block parks on the zeroed KEY_PAD block (rejected
    by the key masks, zero through the cutoffs), live block order is
    unchanged. Exercised with every sub FORCED slow so the chain actually
    runs, on both the slab3 and hybrid (slab_ranged) mask kinds."""
    import dataclasses

    import jax.numpy as jnp

    from tpusph.neighbors.cell_list import build_sorted_fields
    from tpusph.pallas.fused import (
        density_pallas,
        force_pallas,
        supertile_columns,
    )
    from tpusph.physics.kernels import pressure_from_density

    for stencil in ("slab3", "hybrid"):
        base = default_config(
            512, chunk_size=512, pallas_col_capacity=512,
            pallas_sub_blocks=4, pallas_stencil=stencil,
            pallas_block_lanes=128, pallas_desc=True, pallas_desc_blocks=48,
        )
        st = init_state(base, random_init=True, seed=9)
        sf = jax.jit(
            lambda s, cfg=base: build_sorted_fields(
                s.position, s.velocity, s.valid, cfg
            )
        )(st)
        outs = {}
        # (shared unroll, force override): 4/2 exercises the multi-parking-
        # row chain pad AND per-kernel asymmetric factors
        for su in (1, 2, 4, (4, 2)):
            shared, fsu = su if isinstance(su, tuple) else (su, 0)
            cfg = dataclasses.replace(
                base, pallas_slow_unroll=shared,
                pallas_slow_unroll_force=fsu,
            )
            cols = jax.jit(
                lambda sf, cfg=cfg: supertile_columns(
                    sf.key_sorted, sf.valid_sorted, sf.starts, cfg
                )
            )(sf)
            assert int(cols.overflow) == 0
            cols = cols._replace(sub_fast=jnp.zeros_like(cols.sub_fast))
            xyz = (sf.x, sf.y, sf.z)
            rho = density_pallas(xyz, sf.key_sorted, cols, cfg, interpret=True)
            rho_c, p_c = pressure_from_density(rho, cfg)
            rho_c = jnp.where(sf.valid_sorted, rho_c, 1.0)
            p_c = jnp.where(sf.valid_sorted, p_c, 0.0)
            f = force_pallas(
                xyz, (sf.vx, sf.vy, sf.vz), rho_c, p_c, sf.key_sorted, cols,
                cfg, interpret=True,
            )
            outs[su] = (np.asarray(rho), np.asarray(f))
        for su in (2, 4, (4, 2)):
            np.testing.assert_array_equal(outs[su][0], outs[1][0],
                                          err_msg=f"{stencil} {su} density")
            np.testing.assert_array_equal(outs[su][1], outs[1][1],
                                          err_msg=f"{stencil} {su} force")
