"""FULL-step slope A/B of config tweaks on the production fields-native
step. The per-piece probes mis-attribute costs XLA DCEs in isolation (the
starts histogram vanishes when nothing consumes `starts` — glue_probe vs
prep_bench disagree by exactly that); the full step is the ground truth.

Usage: python scripts/step_ab.py [N] [steps...]
  TPUSPH_AB_VARIANTS — comma list from VARIANTS below (default: all)
"""

from __future__ import annotations

import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

import numpy as np

from scripts.profile_step import fence, slope_bench  # noqa: E402
from tpusph.core.config import default_config
from tpusph.core.init import init_state
from tpusph.engine.step import fields_from_state, step_pallas_fields

VARIANTS = {
    "base": {},
    "rank": {"pallas_rank_prep": True},
    # query-rank Pallas kernel over the prep lookups (pallas/qrank.py)
    "qrank": {"pallas_query_rank": True},
    # bl=128 re-test under the round-3 desc/unroll/split machinery (the
    # round-2c bl=128 negative predates all of it); fold below 128 lanes
    # is pointless (VREG lane width), so test both fold settings
    "bl128": {"pallas_query_rank": True, "pallas_block_lanes": 128},
    "bl128nf": {
        "pallas_query_rank": True,
        "pallas_block_lanes": 128,
        "pallas_force_fold": False,
    },
    # force split-factor sweep: smaller target slices per block shrink the
    # live VREG temps (see config.pallas_force_split_factor)
    "fs4": {"pallas_query_rank": True, "pallas_force_split_factor": 4},
    "fs8": {"pallas_query_rank": True, "pallas_force_split_factor": 8},
    # density split-target analog
    "ds2": {"pallas_query_rank": True, "pallas_density_split": 2},
    "ds4": {"pallas_query_rank": True, "pallas_density_split": 4},
    # u4 force unroll was VREG-blocked at hpt=32; retry at hpt=16
    "fs4u4": {
        "pallas_query_rank": True,
        "pallas_force_split_factor": 4,
        "pallas_desc_unroll_force": 4,
    },
    "fs4ds2": {
        "pallas_query_rank": True,
        "pallas_force_split_factor": 4,
        "pallas_density_split": 2,
    },
    # 128x8 geometry retest under force split 4: the earlier 128x8 losses
    # (84.2 vs 86.7 pre-qrank) were suspected VREG pressure, which fs4
    # specifically relieves; larger tiles amortize the slab padding
    # (~2 blocks/window) over 2x the targets
    "g128": {"pallas_tile": 128, "pallas_group": 8},
    "g64x32": {"pallas_group": 32, "pallas_col_capacity": 8192},
    # candidate-lane split: half-width temps, bit-identical via the fold's
    # add tree (see fused.py pair())
    "ls": {"pallas_force_lane_split": True},
    # 1M-tier group doubling (the g64x32 lever at the hybrid geometry):
    # halves the program count; capacity must cover the doubled group span
    "g1M": {"pallas_group": 16, "pallas_col_capacity": 32768},
    # force unroll 4 retry now that the lane split halves live temps
    # (plain u4 and fs4u4 both measured VREG-blocked)
    "lsu4": {"pallas_desc_unroll_force": 4},
    # qrank shape sweep (262k step 60: base S=16 8.20, qs8 8.11, qs32 8.04)
    "qs8": {"pallas_qrank_chunks": 8},
    "qs32": {"pallas_qrank_chunks": 32},
    "qs64": {"pallas_qrank_chunks": 64},
    # 1M hybrid: 4x group (single-slot candidate buffer past scoped VMEM)
    "g1Mb": {"pallas_group": 32, "pallas_col_capacity": 65536},
    # 1M hybrid col/slab selection bias sweep
    "hb0": {"pallas_hybrid_bias": 0.0},
    "hb4": {"pallas_hybrid_bias": 4.0},
    # density lane-split (bit-exact half-width temps; carry unchanged)
    "dls": {"pallas_density_lane_split": True},
    # group scaling continued (g64x32 won +0.6%): 64 subs/program
    "g64": {"pallas_group": 64},
    "g64c16": {"pallas_group": 64, "pallas_col_capacity": 16384},
    # slow-branch unroll (parking-padded select chain): matters only where
    # subs fall off the fast/desc path — 1M step 90 has 44.5% slow subs
    # (scripts/fast_frac.py), 262k has none
    "su2": {"pallas_slow_unroll": 2},
    # streamed records + doubled MB at 1M: desc-fit is 89.3% at step 90
    # (MB=16 under the SMEM table budget) — streaming moves the tables to
    # per-program records so MB=32 is affordable, moving the ~11% misfit
    # subs from the select chain onto the desc path
    "sd32": {"pallas_stream_desc": True, "pallas_desc_blocks": 32},
    # MB-raise at 2M (stream_desc already in that preset)
    "d32": {"pallas_desc_blocks": 32},
    "d64": {"pallas_desc_blocks": 64},
    # group doubling at 2M (won the 1M trajectory A/B 21.41 vs 21.26; the
    # 2M preset still runs g=8 — the single-slot candidate buffer is
    # unchanged by g, only the program count halves)
    "g16": {"pallas_group": 16},
    # hybrid-at-262k retest under the full round-3 preset (the round-2c
    # negative predates desc/unroll/splits/qrank; late-trajectory pile-ups
    # are hybrid's regime). Needs sub_blocks sized in LANES for the
    # ranged bound.
    "hyb": {"pallas_stencil": "hybrid", "pallas_sub_blocks": 40},
    # slim 8-row force candidate layout (p·i2r derived per block): halves
    # the force window DMA volume and per-block load width; restores
    # double-buffering at 2M capacities (see config.pallas_force_slim)
    "slim": {"pallas_force_slim": True},
    # density narrow block load: only the 4 used rows per dynamic load
    "dnl": {"pallas_density_narrow_load": True},
    "slimdnl": {"pallas_force_slim": True,
                "pallas_density_narrow_load": True},
    # force u4 retry under slim: the halved per-block load may be the VREG
    # relief the earlier u4 attempts (plain, fs4u4, lsu4) lacked
    "slimu4": {"pallas_force_slim": True, "pallas_desc_unroll_force": 4},
    # maskless ranged slow path (hybrid): prep-trimmed disjoint ranges
    # make the slab key mask droppable — ~8 fewer VPU ops/pair on the
    # 36-45% slow subs of the 1M/2M pile-up regime
    "rml": {"pallas_ranged_maskless": True},
    "rmlslim": {"pallas_ranged_maskless": True, "pallas_force_slim": True},
    # slow-branch unroll 4 for density (force stays 2, like the desc-path
    # unroll split) on top of the adopted rml+slim
    "rmlslimsu4": {
        "pallas_ranged_maskless": True, "pallas_force_slim": True,
        "pallas_slow_unroll": 4, "pallas_slow_unroll_force": 2,
    },
    # 1M group-doubling retry: the old g1Mb (g=32, col=65536) forced the
    # 16-row force buffer to a single slot past scoped VMEM — slim halves
    # it, so both kernels double-buffer at col=65536 now (12.6 MiB each)
    "g32c64": {"pallas_group": 32, "pallas_col_capacity": 65536},
    # 4M geometry: at ~4.2 particles/cell the col9 windows are ~139 lanes,
    # rounding to whole blocks — smaller tiles / 128-lane blocks cut the
    # block-rounding waste the 4M profile shows in the force kernel
    "m4a": {"pallas_tile": 64, "pallas_group": 16,
            "pallas_block_lanes": 128},
    "m4b": {"pallas_tile": 64, "pallas_group": 16},
    "m4c": {"pallas_block_lanes": 128},
    # 128-lane window-start alignment (halve the dead lead-in at bl=256)
    "al128": {"pallas_align128": True},
    "al256": {"pallas_align128": False},  # regression check vs the preset
    # 4M descriptor-unroll re-sweep under align128 (fewer blocks/sub now)
    "du2": {"pallas_desc_unroll": 2},
    "du2f2": {"pallas_desc_unroll": 2, "pallas_desc_unroll_force": 2},
    # conditional window-DMA granularity at pile-up-sized capacities
    "dp8": {"pallas_dma_parts": 8},
    "dp16": {"pallas_dma_parts": 16},
    "dp32": {"pallas_dma_parts": 32},
    # 4M sparse-regime geometry: at ~4.2 particles/cell each col9 window is
    # ~140 true lanes rounded up to whole 256-lane blocks + 128-alignment
    # lead-in (16.05 padded blocks/sub vs ~5 true, round-4 stats). pt=256
    # halves the per-window rounding floor PER TARGET (9 windows amortized
    # over 2x the targets; span 66+2 cells still passes the col gate
    # span <= C-3). MEASURED NEGATIVE at 4M (round-4 s2: step-30 FULL
    # 312.2/305.6 ms at g=4/g=8 vs base 220.5) — kept for reference only;
    # do not re-try.
    "t256g4": {"pallas_tile": 256, "pallas_group": 4},
    "t256g8": {"pallas_tile": 256, "pallas_group": 8},
    # pt=256 with deeper force split (hpt=32): VREG relief if t256 spills
    "t256g4f8": {"pallas_tile": 256, "pallas_group": 4,
                 "pallas_force_split_factor": 8},
    # selfless force guard: cmp + 2 selects out of the pair math (the
    # self-pair cancels algebraically; see config.pallas_force_selfless)
    "sfl": {"pallas_force_selfless": True},
    # 4M round-5 probes: every geometry axis is measured-negative there, so
    # the remaining levers are per-block body cost (fs8: hpt=16 halves the
    # live force carry — the kernel is "both op-bound and VREG-bound") and
    # unroll padding (fu1: u2 pads odd block counts, ~+0.5 block/sub of the
    # 15.15 scanned; u1 drops the pad at the cost of loop entry overhead,
    # which 15-block subs amortize better than 262k's 3-block subs)
    "fu1": {"pallas_desc_unroll_force": 1},
    "fs8nq": {"pallas_force_split_factor": 8},
    "fs8fu1": {"pallas_force_split_factor": 8,
               "pallas_desc_unroll_force": 1},
}


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 262_144
    probe_steps = [int(s) for s in sys.argv[2:]] or [60]
    from bench import config_overrides

    from functools import partial

    import scripts.profile_step as _ps
    from tpusph.core.config import compiler_opts

    cfg0 = default_config(n, **config_overrides(n, os.environ))
    _ps.COMPILER_OPTS = compiler_opts(cfg0)
    jit = partial(jax.jit, compiler_options=compiler_opts(cfg0))
    random_init = n > 1_295_029  # grid-lattice ceiling
    names = (
        os.environ["TPUSPH_AB_VARIANTS"].split(",")
        if os.environ.get("TPUSPH_AB_VARIANTS")
        else list(VARIANTS)
    )
    fs = fields_from_state(init_state(cfg0, random_init=random_init))

    def advance(fs, k):
        @jit
        def go(fs):
            def body(f, _):
                (f2, _, _, _), _aux = step_pallas_fields(f, cfg0)
                return f2, None
            return jax.lax.scan(body, fs, None, length=k)[0]
        return go(fs)

    prev = 0
    for target in probe_steps:
        if target > prev:
            fs = advance(fs, target - prev)
            fence(fs)
            prev = target
        print(f"--- step {target} (N={n}) ---", flush=True)
        base_rho = None
        for name in names:
            cfg = dataclasses.replace(cfg0, **VARIANTS[name])
            (out, rho, _, _), aux = jit(
                lambda f, cfg=cfg: step_pallas_fields(f, cfg)
            )(fs)
            ovf = int(jax.device_get(aux.window_overflow))
            rho_h = np.sort(np.asarray(jax.device_get(rho)))
            if base_rho is None:
                base_rho = rho_h
                pstr = "ref"
            else:
                rel = float(
                    np.max(np.abs(rho_h - base_rho) / np.abs(base_rho))
                )
                pstr = f"relerr={rel:.1e}"
            t = slope_bench(
                lambda f, cfg=cfg: step_pallas_fields(f, cfg)[0][0],
                lambda a, z: (a[0]._replace(x=a[0].x + z),),
                fs,
            )
            print(f"  {name}: FULL={t*1e3:7.2f} ms  overflow={ovf}  {pstr}",
                  flush=True)


if __name__ == "__main__":
    main()
