"""Simulation configuration — the TPU-native analog of the reference's `Settings`
struct plus its compile-time physics `#define`s.

Reference parity:
  - `Settings` fields: /root/reference/src/simulator.h:19-31, populated in
    /root/reference/src/main.cpp:57-63 and uploaded to CUDA `__constant__`
    memory at /root/reference/src/simulator.cu:459.
  - Physics constants (`MASS`, `GAS_CONSTANT`, ...): /root/reference/src/simulator.h:6-12.
  - Screen-box click region: /root/reference/src/simulator.h:14-17.

On TPU the `__constant__`-memory broadcast becomes a frozen (hashable)
dataclass that is a *static* argument under `jax.jit` — every constant is baked
into the compiled executable, exactly like constant memory, with zero runtime
reads.
"""

from __future__ import annotations

import dataclasses
import math

PI = 3.14159265  # reference: simulator.h:6 (float literal 3.14159265f)
EPS_F = 1e-4  # reference: simulator.cu:14

# Click-region pixel bounds (reference: simulator.h:14-17)
BOX_MIN_X = 200
BOX_MAX_X = 600
BOX_MIN_Y = 150
BOX_MAX_Y = 450

PUSH_STRENGTH = 5.0  # reference: simulator.cu:13
MAX_PARTICLES_DEFAULT = 1000  # reference default -n (main.cpp:21)


def _f32(x: float) -> float:
    """Round a python float through float32, mirroring the reference's
    single-precision constant computation (main.cpp:57-61)."""
    import struct

    return struct.unpack("f", struct.pack("f", x))[0]


@dataclasses.dataclass(frozen=True)
class SimConfig:
    """Static physics + scene configuration. Hashable → usable as a jit-static arg."""

    num_particles: int = MAX_PARTICLES_DEFAULT
    h: float = 0.1  # smoothing radius (main.cpp:57)
    box_dim: float = 10.0  # main.cpp:62
    num_cells_per_dim: int = 100  # box_dim / h (main.cpp:62)
    dt: float = 0.01  # main.cpp:62
    mass: float = 0.02  # simulator.h:7
    gas_constant: float = 1.0  # simulator.h:8
    rest_density: float = 1000.0  # simulator.h:9
    viscosity: float = 1.0  # simulator.h:10
    gravity: float = -9.8  # simulator.h:11
    elasticity: float = 0.5  # simulator.h:12
    eps: float = EPS_F

    # --- TPU-native capacity knobs (static under jit; no dynamic shapes) ---
    # Max particles per 3-cell x-window gathered per (dy, dz) neighbor column
    # (used by the per-target window API; the engine's hot path uses tiles).
    # Overflow is *detected* (aux.window_overflow) rather than silently dropped;
    # the engine re-traces with a larger capacity when tripped.
    window_capacity: int = 48
    # Tile formulation (the hot path): sorted particles are processed in tiles
    # of `tile_size` targets; each tile's 9 neighbor columns are CONTIGUOUS
    # slices of the sorted arrays (DMA-friendly dynamic slices, no gathers)
    # holding up to `tile_cand_capacity` candidates shared by the whole tile.
    # Capacity must cover tile_size + ~2×max-cell-occupancy; overflow is
    # detected and the driver re-traces larger.
    tile_size: int = 256
    tile_cand_capacity: int = 768
    # Pallas megakernel knobs: targets per program, and the static per-column
    # candidate capacity (must cover tile span + ~3×max-cell-occupancy;
    # overflow detected in prep, auto-grown by the driver). The kernel loops
    # over ceil(cnt/128) live lane-blocks, so compute scales with occupancy,
    # not with this capacity.
    pallas_tile: int = 64
    # sub-tiles per program: one program DMAs the stencil columns for
    # pallas_group·pallas_tile targets at once (fewer, larger DMAs).
    # Flat-block-loop sweep at 262k on v5e: 64×16 73.4 steps/s, 64×32
    # (cap 8192) 73.7, 128×8 71.7, 32×32 56.4, 64×16@bl=128 61.7 — the
    # per-sub fixed cost no longer scales with window count, so halving
    # the tile span (fewer scanned lanes) now wins.
    pallas_group: int = 16
    # static column buffer per super-tile (covers group span + ~3×max cell
    # occupancy + 128 alignment; overflow detected in prep, auto-grown).
    # Geometry 64×16/4096 measured best on v5e at 262k (see BASELINE.md);
    # effective_geometry() clamps pt·g to divide small test problems.
    pallas_col_capacity: int = 4096
    # 128-lane blocks each sub-tile scans per window (covers tile span +
    # occupancy + alignment; sub-window clamping beyond this is counted as
    # overflow in prep). Sized for slab3's wider windows (262k trajectory
    # p-max sub count ≈ 2016 lanes → 16 blocks, +margin).
    pallas_sub_blocks: int = 20
    # Stencil decomposition for the Pallas kernels:
    #   "col9"   — 9 windows, one per (dy, dz) neighbor column, ±1-cell x pad.
    #              A sub-tile spanning S cells scans ~9S+27 cells.
    #   "slab3"  — 3 windows, one per dz plane, covering all three y-rows
    #              (pad ±(C+1) cells): ~3S+6C+9 cells, 3× fewer loops/DMAs.
    #              Wins when S is large (uniform regions: tiles span most of
    #              a row); loses badly when S is small (dense pile-ups, where
    #              the 6C padding dominates and every padded cell is full).
    #   "hybrid" — super-tiles DMA slab3 windows (a slab covers all 9 of its
    #              plane's columns); each sub-tile then scans whichever
    #              layout needs fewer blocks — slab3 windows, or col9 windows
    #              indexing into the same slab buffers.
    # Measured on v5e (100-step protocol, flat-block-loop kernels): at 262k
    # slab3 13.95 ms/step vs hybrid 14.6 (col9-era: 26.9) — slab3 default;
    # at 1M dam-break hybrid 69.7 vs slab3 81.1 (bench.py picks hybrid for
    # N ≥ 1M).
    pallas_stencil: str = "slab3"
    # Extra 256-lane-block-equivalents charged to col9 in the hybrid per-sub
    # choice, covering its 6 extra window loops (SMEM reads + loop setup).
    pallas_hybrid_bias: float = 2.0
    # Lanes processed per block-loop iteration (128 or 256): 256 halves the
    # per-iteration overhead but rounds window scans to coarser blocks.
    # Window starts are aligned DOWN to this width so block-rounded scans
    # stay inside the capacity buffer. v5e 262k sweep: 256 → 68.7 steps/s
    # vs 128 → 67.6 (at the default pt=128 g=8; pt=256/512 measured worse).
    pallas_block_lanes: int = 256
    # Flat DESCRIPTOR loop: prep precomputes one flat-block-offset SMEM
    # descriptor per scanned block, so the FAST branch's block loop does
    # ONE scalar SMEM load per iteration (no select chain) and can be
    # UNROLLED over dead-block padding (pallas_desc_unroll). Costs
    # ntiles × pallas_desc_blocks i16 SMEM entries (+2 count arrays);
    # tiles whose block total exceeds pallas_desc_blocks fall back to the
    # select-chain branch — MB is a performance knob, never a capacity.
    pallas_desc: bool = False
    pallas_desc_blocks: int = 16
    # Block-loop unroll factor (descriptor loop only): each fori iteration
    # processes this many blocks, amortizing the per-iteration loop/branch
    # overhead that dominates the per-block cost on this stack (measured
    # scripts/loop_probe.py: 2x unroll cut the dynamic-loop block time
    # ~40%). Prep pads each tile's descriptor list to a multiple of this
    # with DEAD blocks pointing at a zeroed parking segment of the
    # candidate buffer (zero contribution by the same ≥0.17-distance
    # argument as parked padding particles).
    pallas_desc_unroll: int = 1
    # Force-kernel unroll override (0 = same as pallas_desc_unroll): the
    # force kernel is VREG-pressure-bound (u4 measured WORSE there while
    # helping density), so the two kernels may want different factors.
    # Descriptor padding uses the max of the two.
    pallas_desc_unroll_force: int = 0
    # SLOW-branch unroll: the select-chain loop (key-masked subs, and
    # desc-misfit tiles) gets the same dead-block unroll as the descriptor
    # loop by appending a PARKING row to the select chain and padding the
    # trip count to a multiple of 2 — at most ONE pad block per sub, which
    # the parking block (present whenever pallas_desc) absorbs; its
    # contribution is exactly zero by the same ≥0.17-distance argument.
    # Matters only where subs actually take the slow branch: the 1M/2M
    # pile-up regime (fast coverage 63.5% at 1M step 90, 100% at 262k —
    # scripts/fast_frac.py). Factor 2 only (one parking block).
    pallas_slow_unroll: int = 1
    # Force-kernel slow-unroll override (0 = same as pallas_slow_unroll),
    # mirroring pallas_desc_unroll_force: the force kernel is VREG-bound
    # and u4 measured worse there in every desc-path combination.
    pallas_slow_unroll_force: int = 0
    # STREAMED descriptor records: instead of scalar-prefetching the whole
    # per-tile table set into SMEM (O(ntiles) entries — hybrid at 16384+
    # tiles needs 1.8 MB vs the 1.00 MB budget), pack each PROGRAM's slice
    # of every table into one 1024-aligned i32 record in HBM and DMA it
    # into a tiny double-buffered SMEM scratch at program start (~4 KB
    # resident; HBM→SMEM DMA validated on this stack — 1-D slices must be
    # 1024-element aligned). Removes the SMEM ceiling on N entirely.
    pallas_stream_desc: bool = False
    # Force-kernel carry fold: each block's (pt, bl) force contribution is
    # folded to (pt, bl/2) (adjacent lane halves added) before accumulating,
    # halving the loop-carried VREG footprint of the 3 accumulators (force
    # is the VREG-pressure-bound kernel — u4 unroll measured WORSE there).
    # Changes lane summation order only (parity budget 1e-4 unaffected).
    pallas_force_fold: bool = False
    # Force-kernel split-target compute: each block's pair math runs in two
    # sequential pt/2 target halves sharing ONE candidate load, halving the
    # live (pt, bl) temporary footprint (dx/dy/dz/r/… are the VREG peak; the
    # carry is kept as per-half triples so no concat re-widens it). Same
    # arithmetic lane count — a pure scheduling/VREG-pressure experiment.
    pallas_force_split: bool = False
    # Number of sequential target slices per block when pallas_force_split
    # is on (2 = the original halves). At (pt=64, bl=256) a single live
    # temp is 16 VREGs; with ~8 temps + 24 VREGs of folded carry the
    # kernel oversubscribes a 64-VREG file even at factor 2 — factor 4
    # (hpt=16: 4 VREGs/temp) is the first size where temps + carry fit.
    pallas_force_split_factor: int = 2
    # Lane-split analog: compute each candidate block's two bl/2-lane
    # halves SEQUENTIALLY on half-width temps (the target split shrinks
    # temps along sublanes; this shrinks them along lanes). Requires
    # pallas_force_fold — the carry is already bl/2 wide, and summing the
    # two half contributions before the carry add reproduces the fold's
    # exact add tree, so the result is bit-identical.
    pallas_force_lane_split: bool = False
    # Slim force candidate layout: 8 DMA'd sublane rows
    # (x, y, z, vx, vy, vz, 1/(2ρ), key) instead of 16 (9 fields padded to
    # the sublane tile). The dropped p·1/(2ρ) row is recovered ONCE PER
    # BLOCK from the i2r row as max(0, ½k − kρ₀·i2r) — algebraically
    # p_j/(2ρ_j) with ρ·i2r ≡ ½ (≤1 ulp; well inside the 1e-4 parity
    # budget), and the max reproduces the p ≥ 0 clamp exactly. Halves the
    # force pass's HBM→VMEM window DMA volume AND the per-block wide
    # dynamic-offset load width, and halves the candidate buffer so
    # 2M-class capacities double-buffer again (_cand_slots). Padding/
    # parking lanes stay finite: i2r = 0 ⇒ pi2r = ½k, killed by
    # hr = 0 exactly as any out-of-support lane.
    pallas_force_slim: bool = False
    # Maskless ranged slow path (hybrid stencil only): drop the in-kernel
    # slab key mask from the slow branch, relying on EXACT, PAIRWISE-
    # DISJOINT per-slot lane ranges instead. Correctness argument: a
    # scanned pair's contribution is exact physics through the folded
    # r ≤ h cutoffs whatever window scanned it (out-of-stencil lanes are
    # ≥ 2 cells away on some axis → r ≥ h → exactly 0), so the key mask's
    # ONLY job is preventing the same candidate lane being scanned twice
    # per sub. col-mode ranges are disjoint by the span ≤ C−3 mode gate;
    # slab plane ranges can only overlap at tile spans > C²−2C−3
    # (ultra-sparse tiles), which prep resolves by TRIMMING each plane's
    # lead to the previous plane's end (union — and thus coverage — is
    # unchanged; the pair moves to the earlier window's scan). Saves ~8
    # VPU ops/pair on the slow branch — the 1M/2M pile-up regime runs
    # 36–45% of subs slow. The trim is coupled to the flag: with the key
    # mask ON, a pair is accepted only in the window matching its key
    # diff, so trimming would LOSE pairs; maskless REQUIRES the trim.
    pallas_ranged_maskless: bool = False
    # Selfless force guard: drop the r ≥ eps compare and BOTH per-term
    # selects from the force pair math. The guard's only live job is the
    # self-pair (reference EPS_F, simulator.cu:107,126), but the self-pair
    # annihilates ALGEBRAICALLY once 1/r is kept finite: candidate and
    # target rows come from the same sorted arrays, so dx = dy = dz = 0
    # and v_j − v_i = 0 are EXACT at the self lane, and with
    # inv_r = rsqrt(max(r², eps²)) every factor is finite → s_p·dx = 0 and
    # s_v·dv = 0 exactly. Live pairs (r ≥ eps) are bit-identical: the max
    # is a no-op on their r². The only semantic change is a DISTINCT pair
    # closer than eps = 1e-4 (reference: force 0; here: finite clamped
    # term) — physically unreachable at SPH pressures (spacing ≥ 0.9h =
    # 0.153), and the full-trajectory parity gates cover it. Fast path:
    # −2 VPU ops/pair (cmp + 2 selects out, one r² max in) and the (pt,bl)
    # bool temp dies; slow path: the key mask folds into ONE select on hr
    # (−2 ops/pair there too).
    pallas_force_selfless: bool = False
    # Density-kernel narrow block load: load only the 4 used candidate
    # rows (x, y, z, key) per block instead of the full 8-row sublane
    # tile. Semantically identical — rows 4..7 are zero padding the
    # kernel never reads; this only narrows the per-block dynamic-offset
    # VMEM load.
    pallas_density_narrow_load: bool = False
    # Density-kernel analog of the split-target experiment: number of
    # sequential target slices per block (1 = off). The density block's
    # live set (dx/dy/dz + the (pt, bl) carry) also brushes the VREG file
    # at (64, 256).
    pallas_density_split: int = 1
    # Density lane-split: compute each bl/2-lane half on half-width temps,
    # each added into its own carry half (carry stays full width; no fold
    # needed). Bit-identical — carry lanes never mix.
    pallas_density_lane_split: bool = False
    # Prep starts-table lookups via the two-sort rank computation instead of
    # gathers: TPU gathers from the (num_cells+2,) table cost ~50 ns/element
    # (~2.5 ms at 262k, ~13.5 ms at 1M — the step's hidden "glue",
    # scripts/glue_probe.py), while rank_left(key_sorted, q) == starts[q]
    # costs two data-oblivious payload sorts of N+Q. Integer-exact either
    # way (tests/test_pallas.py::test_rank_prep_equals_gather_prep); also
    # lets XLA drop the histogram-built starts table from the production
    # step entirely. FULL-step A/B (scripts/step_ab.py, bit-identical
    # densities): 262k 10.94→8.87 ms (step 60), 13.09→11.14 (step 90);
    # 1M 49.86→42.76 / 71.70→64.44.
    pallas_rank_prep: bool = True
    # Query-rank Pallas kernel (pallas/qrank.py): resolve the prep's batched
    # starts lookups by sorting the Q ≈ 0.3·N queries ALONE (instead of the
    # rank-sort path's two N+Q payload sorts) and ranking the sorted chunks
    # against the sorted keys with a mask-free chunked outer-compare —
    # per-chunk key spans partition the keys, so compare work is 64·N
    # pair-lanes. Only active when pallas_rank_prep is also on. chunks =
    # 64-query chunks sharing one grid program + one double-buffered key
    # DMA; kcap = per-program key-slice capacity (overflow detected via
    # StepAux, regrown). Integer-exact vs the sort path. Default off at
    # the raw-config level (interpret-mode test cost); tuned_overrides
    # turns it ON at every N — isolated prep 1.4→0.8 ms at 262k,
    # 5.5→2.5 ms at 1M (scripts/prep_bench.py), full-step wins logged
    # in tuned_overrides.
    pallas_query_rank: bool = False
    pallas_qrank_chunks: int = 16
    pallas_qrank_kcap: int = 16384
    # TPU compiler scoped-VMEM stack budget in KiB, forwarded per-compile
    # as xla_tpu_scoped_vmem_limit_kib (XLA_FLAGS can't carry TPU-only
    # flag names through the client-side parser). 16384 is the hardware
    # default on v5e (an exact number from compile errors). Raising it
    # admits 4M-class candidate buffers (16 rows x 9 windows x 32768
    # lanes = 18 MiB at col9 pt=64) and lets _cand_slots double-buffer
    # capacities the default budget forces to a single slot.
    pallas_scoped_vmem_kib: int = 16384
    # 128-lane window-start alignment: window starts align DOWN to 128
    # (the Mosaic DMA-offset minimum) instead of pallas_block_lanes,
    # halving the average dead alignment lead-in per window at bl=256
    # (the 4M profile: 16 padded blocks/sub vs ~5 blocks of true
    # candidates — lead waste is a big slice). _clamp_sub keeps the
    # block-rounded scan end inside the window buffer (clamped remainder
    # counts as overflow → regrow).
    pallas_align128: bool = False
    # Conditional window-DMA granularity: each stencil window transfers in
    # this many equal parts, part k ≥ 1 moving only when the window's
    # candidate count reaches into it (part 0 is unconditional). The ≥2M
    # presets size pallas_col_capacity for dam-break pile-ups (131072 lanes
    # at 4M) while typical occupancy is ~1%, so 2 parts moved ~26 GB of
    # dead lanes per step per kernel at 4M — raise the granularity there.
    pallas_dma_parts: int = 2
    # Particle chunk size for the blocked density/force passes (bounds peak HBM
    # footprint of gathered candidates; pipelined by XLA via lax.map).
    chunk_size: int = 8192

    @property
    def h2(self) -> float:
        return _f32(self.h) * _f32(self.h)

    @property
    def force_unroll(self) -> int:
        """Force-kernel unroll (falls back to the shared factor)."""
        return self.pallas_desc_unroll_force or self.pallas_desc_unroll

    @property
    def slow_unroll_force(self) -> int:
        """Force-kernel slow-branch unroll (falls back to the shared
        factor)."""
        return self.pallas_slow_unroll_force or self.pallas_slow_unroll

    @property
    def max_desc_unroll(self) -> int:
        """Descriptor-padding granularity: a padded count divisible by the
        larger factor is divisible by the smaller (both are powers of 2)."""
        return max(self.pallas_desc_unroll, self.force_unroll)

    @property
    def v_kernel_coeff(self) -> float:
        """45/(π h⁶) — shared by the spiky-gradient and viscosity-Laplacian
        kernels (main.cpp:59, note the reference reuses one coefficient)."""
        return _f32(45.0 / (PI * self.h**6))

    @property
    def d_kernel_coeff(self) -> float:
        """315/(64 π h⁹) — poly6 density kernel coefficient (main.cpp:60)."""
        return _f32(315.0 / (64.0 * PI * self.h**9))

    @property
    def num_cells(self) -> int:
        return self.num_cells_per_dim**3

    @property
    def padded_num_particles(self) -> int:
        """Internal particle count, rounded up to a multiple of chunk_size so
        the blocked passes see static, evenly-divisible shapes. Extra slots are
        invalid (masked; parked outside every grid cell)."""
        c = min(self.chunk_size, _round_up(self.num_particles, 256))
        return _round_up(self.num_particles, c)

    @property
    def effective_chunk_size(self) -> int:
        c = min(self.chunk_size, _round_up(self.num_particles, 256))
        return c

    def validate(self) -> None:
        if self.num_particles <= 0:
            raise ValueError("num_particles must be positive")
        if self.h <= 0 or self.box_dim <= 0 or self.dt <= 0:
            raise ValueError("h, box_dim, dt must be positive")
        for f in (
            "window_capacity",
            "tile_size",
            "tile_cand_capacity",
            "pallas_tile",
            "pallas_group",
            "pallas_col_capacity",
            "pallas_sub_blocks",
            "pallas_desc_blocks",
            "pallas_scoped_vmem_kib",
            "chunk_size",
        ):
            if getattr(self, f) <= 0:
                raise ValueError(f"{f} must be positive (capacity doubling "
                                 f"cannot grow a zero capacity)")
        if self.pallas_stencil not in ("col9", "slab3", "hybrid"):
            raise ValueError(
                "pallas_stencil must be 'col9', 'slab3' or 'hybrid'"
            )
        if self.pallas_block_lanes not in (128, 256, 512):
            raise ValueError("pallas_block_lanes must be 128, 256 or 512")
        if self.pallas_desc_unroll not in (1, 2, 4):
            raise ValueError("pallas_desc_unroll must be 1, 2 or 4")
        if self.pallas_desc_unroll_force not in (0, 1, 2, 4):
            raise ValueError("pallas_desc_unroll_force must be 0, 1, 2 or 4")
        if self.pallas_desc_unroll > 1 and not self.pallas_desc:
            raise ValueError("pallas_desc_unroll needs pallas_desc=True")
        if self.pallas_slow_unroll not in (1, 2, 4):
            raise ValueError(
                "pallas_slow_unroll must be 1, 2 or 4 (the chain pads "
                "with slow_unroll-1 parking rows)"
            )
        if self.pallas_slow_unroll_force not in (0, 1, 2, 4):
            raise ValueError(
                "pallas_slow_unroll_force must be 0, 1, 2 or 4"
            )
        if self.pallas_slow_unroll > 1 and not self.pallas_desc:
            raise ValueError(
                "pallas_slow_unroll needs pallas_desc=True (the parking "
                "block it pads with only exists in descriptor mode)"
            )
        if self.pallas_desc_blocks % self.max_desc_unroll:
            raise ValueError(
                "pallas_desc_blocks must be a multiple of the unroll factors"
            )
        if self.pallas_qrank_kcap % 1024 or self.pallas_qrank_kcap <= 0:
            raise ValueError(
                "pallas_qrank_kcap must be a positive multiple of 1024 "
                "(4-part conditional DMA alignment at 256-lane blocks)"
            )
        if self.pallas_qrank_chunks <= 0:
            raise ValueError("pallas_qrank_chunks must be positive")
        if self.pallas_density_split < 1 or (
            self.pallas_density_split & (self.pallas_density_split - 1)
        ):
            raise ValueError(
                "pallas_density_split must be a power of two >= 1"
            )
        if self.pallas_force_split_factor < 2 or (
            self.pallas_force_split_factor & (self.pallas_force_split_factor - 1)
        ):
            raise ValueError(
                "pallas_force_split_factor must be a power of two >= 2 "
                "(target slices per block; pt/factor must stay >= 8 sublanes "
                "— checked at kernel build)"
            )
        if self.pallas_force_lane_split and not self.pallas_force_fold:
            raise ValueError(
                "pallas_force_lane_split requires pallas_force_fold (the "
                "half-width carry it accumulates into)"
            )
        if self.pallas_col_capacity % (2 * self.pallas_block_lanes):
            raise ValueError(
                "pallas_col_capacity must be a multiple of "
                "2*pallas_block_lanes (half-DMA alignment + block rounding)"
            )
        if self.pallas_dma_parts < 2 or self.pallas_col_capacity % (
            self.pallas_dma_parts * 128
        ):
            raise ValueError(
                "pallas_dma_parts must be >= 2 and divide "
                "pallas_col_capacity into 128-lane-aligned parts"
            )


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def default_config(num_particles: int = MAX_PARTICLES_DEFAULT, **kw) -> SimConfig:
    """Build the reference's exact scene: h=0.1 in a 10×10×10 box with a
    100³ uniform grid and dt=0.01 (main.cpp:57-63)."""
    cfg = SimConfig(num_particles=num_particles, **kw)
    cfg.validate()
    return cfg


def compiler_opts(cfg: SimConfig) -> dict | None:
    """Per-compile XLA options for jits that wrap the Pallas kernels.
    None (the common case) keeps compile-cache keys unchanged; a raised
    scoped-VMEM budget is only requested when the config asks for one.
    The option name is TPU-only — other backends REJECT it outright
    ("No such compile option"), so it is dropped off-TPU (where scoped
    VMEM does not exist and interpret-mode kernels ignore capacity)."""
    if cfg.pallas_scoped_vmem_kib == 16384:
        return None
    import jax

    if jax.default_backend() in ("cpu",):
        return None
    return {"xla_tpu_scoped_vmem_limit_kib": cfg.pallas_scoped_vmem_kib}


def tuned_overrides(num_particles: int) -> dict:
    """Measured per-N performance presets (v5e, 100-step dam-break):

      * N < 1M — flat descriptor loop + 2× block unroll (density
        3.73→2.55 ms, force 5.89→5.35 at 262k step 60; scripts/desc_ab.py).
      * N ≥ 1M — hybrid stencil + 128×8 geometry + pile-up capacities
        (col=16384, sub_blocks=80): skips the multi-minute auto-grow
        recompiles the dam-break transients would otherwise trigger.
        Descriptor loop OFF — the dense per-tile SMEM rows don't fit at
        8192 tiles.

    Used by bench.py (plus TPUSPH_BENCH_* env on top) and the CLI (flags
    win), so `sph -n 1048576 -m time` gets the known-good config."""
    if num_particles >= 4_000_000:
        # 4M-class single chip (random init — the 0.9h lattice caps at
        # 1.29M): the SLIM 8-row force layout halves the candidate buffer,
        # so the col=131072 capacity the 4M pile-ups need fits the 16 MiB
        # scoped-VMEM budget single-slot (8 rows × (3·131072+256) lanes ×
        # 4 B ≈ 12.6 MiB; the 16-row layout's 25 MiB was the documented
        # 4M blocker). Streamed per-program records keep SMEM O(1) in N.
        return {
            "pallas_stencil": "hybrid",
            "pallas_tile": 128,
            "pallas_group": 8,
            "pallas_col_capacity": 131072,
            "pallas_sub_blocks": 640,
            "pallas_desc": True,
            "pallas_desc_unroll": 4,
            "pallas_desc_unroll_force": 2,
            "pallas_force_fold": True,
            "pallas_force_split": True,
            "pallas_force_split_factor": 4,
            "pallas_stream_desc": True,
            "pallas_desc_blocks": 32,
            "pallas_query_rank": True,
            "pallas_qrank_kcap": 32768,
            "pallas_slow_unroll": 2,
            "pallas_ranged_maskless": True,
            "pallas_force_slim": True,
            # raised scoped-VMEM budget (v5e has 128 MiB VMEM; 16 MiB is
            # only the compiler's default ceiling): lets the 12.6 MiB
            # buffers double-buffer (2 slots ≈ 25 MiB) so programs don't
            # serialize on their own window DMAs
            "pallas_scoped_vmem_kib": 32768,
            # 128-aligned window starts (round 4): 262k traj
            # 119.5->131.1, 1M 23.68->25.16 steps/s
            # selfless force guard (round 4 s2): cmp + 2 selects out of
            # the pair math, bit-identical (262k traj A/B 131.44->132.28)
            "pallas_force_selfless": True,
            "pallas_align128": True,
        }
    if num_particles >= 2_000_000:
        # 2M-class single chip: the hybrid stencil's 9-slot SMEM tables no
        # longer fit the 1.00 MB SMEM budget at 16384+ tiles (measured:
        # 1.80 MB requested) under scalar prefetch — STREAMED per-program
        # records (pallas_stream_desc) sidestep the budget entirely (each
        # program DMAs its own ~4 KB record HBM→SMEM, double-buffered;
        # measured bitwise-equal and timing-neutral at 262k), so the dense
        # pile-up regime gets hybrid + the descriptor loop like 1M does.
        # col=65536/sub_blocks=320 is what the dam-break pile-ups need
        # (slab3-measured); fits scoped VMEM via the single-slot buffer.
        return {
            "pallas_stencil": "hybrid",
            "pallas_tile": 128,
            "pallas_group": 8,
            "pallas_col_capacity": 65536,
            "pallas_sub_blocks": 320,
            "pallas_desc": True,
            "pallas_desc_unroll": 4,
            "pallas_desc_unroll_force": 2,
            "pallas_force_fold": True,
            "pallas_force_split": True,
            "pallas_force_split_factor": 4,
            "pallas_stream_desc": True,
            # streamed records lift the SMEM table budget here too — MB=32
            # moves misfit pile-up subs onto the descriptor path (FULL-step
            # A/B at 2M: 152.55→146.55 ms at step 90, neutral at step 30;
            # 64 measured within noise of 32, mixed sign)
            "pallas_desc_blocks": 32,
            "pallas_query_rank": True,
            # slow-branch unroll: the random-init 2M run lives in the
            # pile-up regime where 36-45% of subs run the select chain
            "pallas_slow_unroll": 2,
            # maskless ranged slow path + slim force layout: FULL-step
            # A/B 126.75→107.49 ms at step 30, 146.05→123.24 at step 90
            # (−15%, bit-identical densities) — besides the maskless
            # op savings, slim HALVES the force candidate buffer so the
            # col=65536 capacity double-buffers inside scoped VMEM again
            # (the single-slot fallback was costing every program its
            # own DMA latency). slow-unroll 4 measured neutral (122.90)
            "pallas_ranged_maskless": True,
            "pallas_force_slim": True,
            # 128-aligned window starts (round 4): 262k traj
            # 119.5->131.1, 1M 23.68->25.16 steps/s
            # selfless force guard (round 4 s2): cmp + 2 selects out of
            # the pair math, bit-identical (262k traj A/B 131.44->132.28)
            "pallas_force_selfless": True,
            "pallas_align128": True,
        }
    if num_particles >= 1_000_000:
        return {
            "pallas_stencil": "hybrid",
            "pallas_tile": 128,
            # STREAMED records lift the per-tile SMEM table budget that
            # capped desc blocks at 16 (89.3% desc-fit at step 90) — MB=32
            # moves the misfit subs onto the descriptor path: FULL-step
            # A/B 56.59→55.31 ms at step 90, 39.06→38.91 at step 30
            "pallas_stream_desc": True,
            "pallas_desc_blocks": 32,
            # group doubling (full-trajectory A/B: 21.41 vs 21.26 steps/s;
            # the doubled-capacity candidate buffer still double-buffers
            # inside scoped VMEM at 32768). Lane split measured NEUTRAL at
            # this tier — left off.
            "pallas_group": 16,
            "pallas_col_capacity": 32768,
            "pallas_sub_blocks": 80,
            "pallas_desc": True,
            "pallas_desc_unroll": 4,
            "pallas_desc_unroll_force": 2,
            "pallas_force_fold": True,
            # 1M A/B (scripts/desc_ab.py, MB=16): force 26.10→23.98 ms at
            # step 30, 39.28→36.42 at step 90; density neutral, parity OK
            "pallas_force_split": True,
            # split factor 4 beats 2 on the full 1M trajectory too
            # (21.26 vs 20.92 steps/s, scripts/traj_ab.py)
            "pallas_force_split_factor": 4,
            # query-rank kernel over the prep lookups: prep 5.5→2.5 ms
            # isolated, FULL-step A/B (scripts/step_ab.py) 42.79→40.66 ms
            # at step 30 / 64.62→62.37 at step 90; bit-identical densities
            "pallas_query_rank": True,
            # slow-branch unroll (parking-padded select chain): 44.5% of
            # subs run slow at step 90 (fast_frac probe) — FULL-step A/B
            # 60.81→56.62 ms there, 39.17→38.82 at step 30; bit-identical
            "pallas_slow_unroll": 2,
            # maskless ranged slow path + slim force layout (round 3,
            # session 2): full-trajectory A/B 22.87→23.73 steps/s (rml
            # alone 23.69, slim alone 22.92; step-90 FULL 54.30→50.38 ms,
            # bit-identical densities) — maskless drops ~8 VPU ops/pair
            # from the 44%-slow pile-up subs, slim halves the force
            # window DMA volume and per-block load width
            "pallas_ranged_maskless": True,
            "pallas_force_slim": True,
            # 128-aligned window starts (round 4): 262k traj
            # 119.5->131.1, 1M 23.68->25.16 steps/s
            # selfless force guard (round 4 s2): cmp + 2 selects out of
            # the pair math, bit-identical (262k traj A/B 131.44->132.28)
            "pallas_force_selfless": True,
            "pallas_align128": True,
        }
    return {
        # 64x32 geometry: halving the program count at doubled column
        # capacity beats 64x16 on the full trajectory at BOTH sub-1M
        # tiers (262k 119.04 vs 118.38 steps/s, 65k 504.6 vs 497.8;
        # scripts/traj_ab.py) — 128x8 retested NEGATIVE even under
        # force split 4 (115.1)
        "pallas_group": 32,
        "pallas_col_capacity": 8192,
        "pallas_desc": True,
        "pallas_desc_blocks": 24,
        "pallas_desc_unroll": 4,
        "pallas_desc_unroll_force": 2,
        "pallas_force_fold": True,
        # split-target compute: pt/4 target slices share one candidate load
        # (halving was 262k force 5.34→5.01 ms step 60, 6.93→6.57 step 90;
        # factor 4 beats 2 on the full 100-step trajectory: 118.45 vs
        # 116.25 steps/s, scripts/traj_ab.py — factor 8 and the density
        # analog measured negative, see CLAUDE.md; bit-identical)
        "pallas_force_split": True,
        "pallas_force_split_factor": 4,
        # candidate-lane split: half-width temps, bit-identical (262k
        # full-trajectory A/B 118.29 vs 117.17 steps/s)
        "pallas_force_lane_split": True,
        # slim force layout: twice-positive on the full 262k trajectory
        # (120.00 vs 119.89, 120.45 vs 120.11) and strictly less window
        # DMA; decisive at the ≥1M tiers. Density narrow-load measured
        # mixed-sign — left off.
        "pallas_force_slim": True,
        # query-rank kernel over the prep lookups (pallas/qrank.py): FULL
        # step 7.91→7.08 ms at 262k step 0, 9.01→8.43 at 60, 11.07→10.38
        # at 90 (scripts/step_ab.py; bit-identical densities, 0 overflow)
        "pallas_query_rank": True,
        # 128-lane window-start alignment: halves the dead alignment
        # lead-in per window — full 100-step trajectory 119.48 → 131.14
        # steps/s at 262k (scripts/traj_ab.py, round 4)
        "pallas_align128": True,
        # selfless force guard (round 4 s2): cmp + 2 selects out of the
        # pair math, bit-identical (262k traj A/B 131.44 → 132.28)
        "pallas_force_selfless": True,
    }


def tuned_config(num_particles: int = MAX_PARTICLES_DEFAULT, **kw) -> SimConfig:
    """default_config + tuned_overrides, explicit kwargs winning."""
    preset = tuned_overrides(num_particles)
    preset.update(kw)
    return default_config(num_particles, **preset)
