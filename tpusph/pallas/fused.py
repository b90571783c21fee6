"""Pallas TPU megakernels for the SPH density and force passes.

These are the speed-of-light replacements for the XLA tile passes in
engine/step.py (same math, same masks — kernelUpdatePressureAndDensity and
kernelUpdateForces, /root/reference/src/simulator.cu:149-256). Design:

  * Particles sorted by row-major cell key (neighbors/cell_list.py); candidate
    fields live in HBM as small *field-major* matrices (fields × particles) so
    a stencil window is ONE contiguous dynamic slice.
  * The 27-cell stencil maps to contiguous sorted-key windows at one of two
    granularities (cfg.pallas_stencil): "col9" — one window per (dy,dz)
    column (9 windows, ±1-cell pad) — or "slab3" — one window per dz plane
    covering all three y-rows (3 windows, ±(C+1)-cell pad). When a tile spans
    a large fraction of a row (uniform regions at production N), the three
    column windows of a plane nearly abut, so the single slab window scans
    ~1.5–2.5× fewer 128-lane blocks and needs 3× fewer loops and DMAs; for
    NARROW tiles (dense pile-ups) the slab's ±(C+1) padding dominates and
    col9 scans far fewer lanes. "hybrid" picks per sub-tile by measured
    block count: super-tiles always DMA slab windows (a slab covers all 9
    of its plane's columns), and col-mode sub-tiles index into the same
    slab buffers.
  * Grid = one program per SUPER-TILE of G·PT sorted targets. Each program
    DMAs its stencil windows once for the whole group (HBM→VMEM,
    double-buffered across programs: the next super-tile streams in while this
    one computes); each of the G sub-tiles then scans only its own
    128-aligned window of the shared buffer. Grouping divides the DMA count
    and per-program overhead by G without increasing compute.
  * Candidate blocks are statically unrolled and predicated (lax.cond), so
    compute scales with occupancy, not with the static capacity.
  * Pair distances use the exact displacement form Σ(tᵢ−cᵢ)² — the MXU
    identity |t|²+|c|²−2t·c was tried and rejected: catastrophic cancellation
    (coordinates ~5, r² ~1e-4) costs ~6 significant digits and blows the 1e-4
    density parity budget.
  * Per-candidate force coefficients 1/(2ρ_j) and p_j/(2ρ_j) are precomputed
    once per particle in prep (not once per pair).
  * Per-pair flat-key-difference masking assigns every stencil pair to exactly
    one window (the 27 accepted diffs are disjoint), so overlapping window
    ranges never double-count. DMA starts are 128-aligned (Mosaic requires
    lane-dim slice offsets provably divisible by 128); the extra leading lanes
    hold particles from cells below the range, which the key mask rejects
    exactly.

Capacity overflow (super-column count vs the static buffer) is detected in the
jnp prep step (supertile_columns), never inside the kernel; drivers re-trace
with doubled capacity.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpusph.core.config import SimConfig

LANES = 128
KEY_PAD = float(2**24)  # padding-key sentinel, f32-exact, never key-matched


def _offsets(cfg: SimConfig) -> list[int]:
    c = cfg.num_cells_per_dim
    return [dy * c + dz * c * c for dz in (-1, 0, 1) for dy in (-1, 0, 1)]


def _slab_geom(cfg: SimConfig) -> tuple[list[int], int, int]:
    """slab3 geometry: one window per dz plane covering all three y-rows
    (pad ±(C+1) cells), so three nearly-abutting column windows become ONE
    contiguous slice. Cheapest when the tile spans a large fraction of a
    row (window ≈ 3·span + 6C cells vs col9's 9·span + 27)."""
    c = cfg.num_cells_per_dim
    return [dz * c * c for dz in (-1, 0, 1)], c + 1, c + 2


def _col_geom(cfg: SimConfig) -> tuple[list[int], int, int]:
    """col9 geometry: one window per (dy,dz) neighbor column, ±1-cell x pad.
    Cheapest for narrow tiles (dense pile-up regions), where slab windows
    would scan ~6C cells of padding per plane."""
    return _offsets(cfg), 1, 2


def _stencil(cfg: SimConfig) -> tuple[list[int], int, int]:
    """(window offsets, lo_pad, hi_pad) of the SUB-tile scan windows for the
    single-mode stencils: window w covers flat keys
    [kmin + off_w − lo_pad, kmax + off_w + hi_pad) for a tile spanning
    [kmin, kmax]. The hybrid stencil has no single sub geometry — it picks
    col9 or slab3 per sub-tile (supertile_columns packs both layouts)."""
    if cfg.pallas_stencil == "slab3":
        return _slab_geom(cfg)
    return _col_geom(cfg)


def _sup_stencil(cfg: SimConfig) -> tuple[list[int], int, int]:
    """Geometry of the windows each super-tile DMAs (the VMEM buffers).
    hybrid DMAs slab3 super-windows — a slab covers all 9 of its plane's
    columns, so col-mode sub-tiles index into the same buffers."""
    if cfg.pallas_stencil in ("slab3", "hybrid"):
        return _slab_geom(cfg)
    return _col_geom(cfg)


def _sub_slots(cfg: SimConfig) -> int:
    """Descriptor slots per sub-tile in TileColumns (slab3 packs 3 windows;
    col9 and hybrid pack 9 — hybrid zero-fills slots 3..8 for slab subs)."""
    return 3 if cfg.pallas_stencil == "slab3" else 9


def effective_geometry(n: int, cfg: SimConfig) -> tuple[int, int]:
    """(pt, g) clamped so pt·g divides n (n is always a multiple of 256 —
    config.padded_num_particles). Lets the production supertile default
    (128×4) serve tiny test problems too."""
    pt = min(cfg.pallas_tile, n)
    g = max(1, min(cfg.pallas_group, n // pt))
    while n % (pt * g):
        g -= 1
    return pt, g


class TileColumns(NamedTuple):
    """Stencil-column ranges at two granularities (flattened 1-D so the SMEM
    prefetch buffers aren't lane-padded; the per-sub arrays are RELATIVE
    offsets bounded by the column capacity — int16 while capacities fit
    (2 bytes/entry scales to ~1M particles per chip), widened to int32
    automatically when capacity auto-grow exceeds the int16 range).

    sub_base is stored in flat 128-lane BLOCK units into the lane-flattened
    candidate buffer (buf·col_capacity + lane_start)//128 — always exact
    (window starts are 128-aligned), keeps int16 viable to huge capacities,
    and lets the kernel address any of the nbuf window buffers with one
    scalar (no per-block buffer select).

    When cfg.pallas_desc, desc_base/desc_cnt additionally hold one packed
    descriptor per scanned block (dense per-tile rows of
    pallas_desc_blocks): desc_base = flat 128-lane block offset of the
    block, desc_cnt = the tile's (unroll-padded) block count, or −1 when
    the tile doesn't fit MB blocks. The FAST branch's flat block loop then
    does one SMEM load per iteration (no select chain, unrollable via
    dead-block padding); non-fitting or slow tiles take the select-chain
    branch, which carries the key masks and needs no descriptors."""

    sub_base: jnp.ndarray  # i16[ntiles*slots] window start, flat BLOCK units
    sub_cnt: jnp.ndarray  # i16[ntiles*slots] — LANES (hybrid) / BLOCKS (else)
    sub_lead: jnp.ndarray  # i16[ntiles*slots] alignment lead-in (< block)
    sub_fast: jnp.ndarray  # i32[ntiles] — 1: key mask provably redundant
    #   (i32: this terminal's Mosaic cannot legalize scalar i16 compares)
    sub_mode: jnp.ndarray  # i32[ntiles] — hybrid: 1 = col9 slots, 0 = slab3
    sup_start: jnp.ndarray  # i32[nprog*nsup] 128-aligned absolute start
    sup_cnt: jnp.ndarray  # i32[nprog*nsup] candidate count (≤ capacity)
    overflow: jnp.ndarray  # int32[] — super-column count beyond capacity
    desc_base: jnp.ndarray | None = None  # i16[ntiles*MB] flat block offset
    desc_cnt: jnp.ndarray | None = None  # i16[ntiles] padded blocks, −1 = no fit
    desc_cnt_f: jnp.ndarray | None = None  # same, padded for force_unroll
    records: jnp.ndarray | None = None  # i32[nprog·rec] streamed per-program
    #   table records (pallas_stream_desc) — replaces the SMEM prefetch


def _cnt_in_lanes(cfg: SimConfig) -> bool:
    """Whether sub_cnt is stored in LANES (hybrid: the slab_ranged slow
    path bounds lanes to [lead, cnt) and needs lane precision) or in
    BLOCKS (col9/slab3: the key mask subsumes the tail, so only the block
    trip count matters — and block units keep int16 viable to 2M-class
    window capacities, where lane counts overflow int16 and the int32
    tables blow the 1.00 MB SMEM budget)."""
    return cfg.pallas_stencil == "hybrid"


def _sub_dtype(cfg: SimConfig):
    """int16 while every per-sub scalar (base in flat block units ≤
    nbuf·capacity/128, cnt — lanes for hybrid, blocks otherwise — and
    lead < block width) fits; int32 after capacity regrow pushes past the
    int16 range (2× SMEM prefetch footprint, still small)."""
    nbuf = len(_sup_stencil(cfg)[0])
    cnt_max = (
        cfg.pallas_sub_blocks * 128
        if _cnt_in_lanes(cfg)
        else -(-cfg.pallas_sub_blocks * 128 // cfg.pallas_block_lanes)
    )
    limit = max(nbuf * cfg.pallas_col_capacity // 128, cnt_max)
    return jnp.int16 if limit <= 32767 else jnp.int32


def _tile_key_span(key_s, valid_s, cfg: SimConfig, tile: int):
    """Per-tile (kmin, kmax) over the valid sorted keys."""
    nc = cfg.num_cells
    ntiles = key_s.shape[0] // tile
    tk = key_s.reshape(ntiles, tile)
    tv = valid_s.reshape(ntiles, tile)
    kmin = jnp.min(jnp.where(tv, tk, nc), axis=1)
    kmax = jnp.max(jnp.where(tv, tk, -1), axis=1)
    return kmin, kmax


def _geom_queries(kmin, kmax, cfg: SimConfig, geom):
    """starts-table indices (lo, hi) of each window of `geom` for tiles
    spanning [kmin, kmax]."""
    nc = cfg.num_cells
    offsets, lo_pad, hi_pad = geom
    offs = jnp.asarray(offsets, jnp.int32)
    lo = jnp.clip(kmin[:, None] + offs[None, :] - lo_pad, 0, nc)
    hi = jnp.clip(kmax[:, None] + offs[None, :] + hi_pad, lo, nc)
    return lo, hi


def _geom_finish(start, end, cfg: SimConfig):
    """(aligned_start, cnt, lead) from resolved window bounds; `lead` is the
    alignment lead-in (true start − aligned start, < alignment width)."""
    # Align down to the alignment width; the key mask / fast-path lead-in
    # argument rejects the extra lanes. Mosaic needs DMA lane offsets
    # provably 128-aligned — pallas_align128 uses exactly that (halving
    # the average dead lead-in at bl=256; _clamp_sub keeps block-rounded
    # scan ends inside the buffer), the default aligns to the block width
    # (block-rounded ends then stay in-buffer for free).
    al = 128 if cfg.pallas_align128 else cfg.pallas_block_lanes
    astart = (start // al) * al
    return (
        astart.astype(jnp.int32),
        (end - astart).astype(jnp.int32),
        (start - astart).astype(jnp.int32),
    )


def _rank_left(key_s, queries):
    """rank_left(key_s, q) == starts[q] for q ∈ [0, num_cells+1], computed
    WITHOUT gathering from the (num_cells+2,) starts table: TPU gathers
    from a large table lower to ~50 ns/element (the prep's ~50k–400k
    lookups were 2.5 ms at 262k / 13.5 ms at 1M — the step's hidden
    "glue", scripts/glue_probe.py), while two data-oblivious 2-lane
    payload sorts of N+Q are an order of magnitude cheaper on this
    stack's fast lax.sort. Queries are tagged to sort BEFORE equal keys
    (2q vs 2k+1 ⇒ left rank); the second sort unpermutes by query index."""
    nq = queries.shape[0]
    vals = jnp.concatenate([key_s * 2 + 1, queries * 2])
    idx = jnp.concatenate([
        jnp.full(key_s.shape, nq, jnp.int32),
        jnp.arange(nq, dtype=jnp.int32),
    ])
    sv, si = jax.lax.sort((vals, idx), num_keys=1, is_stable=True)
    isq = (sv & 1) == 0
    pos = jnp.arange(sv.shape[0], dtype=jnp.int32)
    rank = pos - (jnp.cumsum(isq.astype(jnp.int32)) - 1)
    _, out = jax.lax.sort(
        (jnp.where(isq, si, jnp.int32(2**30)), rank), num_keys=1,
        is_stable=True,
    )
    return out[:nq]


def _resolve_starts(key_s, starts, queries, cfg: SimConfig,
                    interpret: bool = False):
    """Resolve a list of starts-table index arrays in ONE batched lookup:
    the query-rank Pallas kernel (pallas_query_rank), the rank-sort path
    (pallas_rank_prep), or plain gathers. Results are exactly equal
    (integer ranks). Returns (resolved list, int32 overflow — nonzero only
    on the kernel path when a program's key span exceeded
    pallas_qrank_kcap; drivers regrow)."""
    zero = jnp.int32(0)
    if not cfg.pallas_rank_prep:
        return [starts[q] for q in queries], zero
    flat = jnp.concatenate([q.reshape(-1) for q in queries])
    if cfg.pallas_query_rank and key_s.shape[0] % 256 == 0:
        # (the % 256 gate is the qrank kernel's key-padding contract;
        # production sorted fields always satisfy it)
        from tpusph.pallas.qrank import rank_queries_pallas
        r, ovf = rank_queries_pallas(key_s, flat, cfg, interpret=interpret)
    else:
        r, ovf = _rank_left(key_s, flat), zero
    out, o = [], 0
    for q in queries:
        out.append(r[o : o + q.size].reshape(q.shape))
        o += q.size
    return out, ovf


def _geom_ranges(kmin, kmax, starts, cfg: SimConfig, geom):
    """Gather-path convenience wrapper (scripts/diagnostics): (aligned_start,
    cnt, lead) of each window of `geom` for tiles spanning [kmin, kmax]."""
    lo, hi = _geom_queries(kmin, kmax, cfg, geom)
    se = starts[jnp.stack([lo, hi])]  # one batched lookup
    return _geom_finish(se[0], se[1], cfg)


def _column_ranges(key_s, valid_s, starts, cfg: SimConfig, tile: int):
    """(aligned_start, cnt, kmin, kmax) for the single-mode stencil windows
    of each tile of `tile` sorted targets."""
    kmin, kmax = _tile_key_span(key_s, valid_s, cfg, tile)
    astart, cnt, _ = _geom_ranges(kmin, kmax, starts, cfg, _stencil(cfg))
    return astart, cnt, kmin, kmax


def _fast_flags(
    sub_start, sub_cnt, kmin, kmax, starts, cfg: SimConfig, geom, period,
    span_ok,
):
    """Per-sub fast flag: the in-kernel key mask is provably redundant when
    the block-aligned lead-in and block-rounded tail of each scanned lane
    range stay strictly between the neighboring windows' accepted key ranges:
    in-window and in-gap non-stencil pairs are ≥ 2 cells away on some axis →
    r ≥ h → zeroed by the kernel cutoffs, and only reaching INTO an adjacent
    window's accepted cells could double-count a pair. These guards also
    subsume window overlap (a slab3 tile spanning > C²−2C−3 keys, i.e.
    multiple z-planes): if any particle sits in the overlapped cells, the
    upper window's aligned start precedes the lower window's accepted end →
    lead_ok fails → slow path; if none does, the two scans share no lanes
    and stay exact. col9 additionally requires tile span ≤ C−3 — passed as
    `span_ok` — (columns sit only C apart, so overlapping column windows
    scan the SAME lanes for different (dy,dz) interpretations — lead/tail
    guards cannot separate them). `period` is the flat-key distance between
    adjacent windows (C for col9, C² for slab3)."""
    prev_i, next_i = _fast_queries(kmin, kmax, cfg, geom, period)
    prev_end, next_start = starts[prev_i], starts[next_i]
    return _fast_finish(sub_start, sub_cnt, prev_end, next_start, cfg,
                        span_ok)


def _fast_queries(kmin, kmax, cfg: SimConfig, geom, period):
    """starts-table indices of the neighboring windows' accepted-range
    bounds (prev end, next start) the fast-path guards compare against."""
    nc = cfg.num_cells
    offsets, lo_pad, hi_pad = geom
    offs = jnp.asarray(offsets, jnp.int32)
    prev_i = jnp.clip(kmax[:, None] + offs[None, :] - period + hi_pad, 0,
                      nc + 1)
    next_i = jnp.clip(kmin[:, None] + offs[None, :] + period - lo_pad, 0,
                      nc + 1)
    return prev_i, next_i


def _fast_finish(sub_start, sub_cnt, prev_end, next_start, cfg: SimConfig,
                 span_ok):
    lead_ok = sub_start >= prev_end
    bl = cfg.pallas_block_lanes
    tail_abs = sub_start + ((sub_cnt + bl - 1) // bl) * bl
    tail_ok = tail_abs <= next_start
    return span_ok & jnp.all(lead_ok & tail_ok, axis=1)


def _clamp_sub(sub_base, sub_cnt, cfg: SimConfig):
    """Clamp sub window counts to the static per-window block scan and the
    super buffer; returns (cnt, per-tile scan-capacity excess). Buffer-fit
    excess is NOT counted here — sub windows are subsets of their super
    window, so it is already counted at the super level.

    NOTE pallas_sub_blocks is in 128-LANE units regardless of
    cfg.pallas_block_lanes (the kernels loop in pallas_block_lanes-wide
    blocks, so at bl=256 the effective per-window block budget is
    sub_blocks/2). The clamp is safe either way — scans never exceed this
    lane limit — but configure sub_blocks in 128-lane lanes÷128."""
    cap = cfg.pallas_col_capacity
    sub_max = cfg.pallas_sub_blocks * 128  # 128-lane units (see note above)
    excess = jnp.sum(jnp.maximum(sub_cnt - sub_max, 0), axis=1)
    cnt = jnp.minimum(sub_cnt, sub_max)
    cnt = cnt - jnp.maximum(sub_base + cnt - cap, 0)
    cnt = jnp.maximum(cnt, 0)
    if cfg.pallas_align128 and cfg.pallas_block_lanes > 128:
        # 128-aligned starts can put the BLOCK-rounded scan end past the
        # buffer (base ≢ 0 mod bl): clamp cnt so
        # base + ceil(cnt/bl)·bl ≤ cap — the fast path has no key mask, so
        # reading the next window's lanes would be wrong physics, not just
        # waste. The clamped remainder is counted as overflow (regrown).
        bl = cfg.pallas_block_lanes
        fit = ((cap - sub_base) // bl) * bl
        excess = excess + jnp.sum(jnp.maximum(cnt - fit, 0), axis=1)
        cnt = jnp.minimum(cnt, fit)
    return jnp.maximum(cnt, 0), excess


def _flat_blocks(base_lanes, buf_idx, cfg: SimConfig):
    """Per-window start in flat 128-lane block units of the lane-flattened
    candidate buffer: (buf·capacity + lane_start)//128. Exact — lane starts
    are 128-aligned by _geom_ranges."""
    cap = cfg.pallas_col_capacity
    return (buf_idx[None, :] * cap + base_lanes) // 128


def _build_desc(base_blk, bw, cfg: SimConfig):
    """Dense per-tile block descriptors for the flat descriptor loop: for
    each tile, the concatenation of its windows' scanned blocks in slot
    order. Returns (desc_base, desc_cnt): desc_base[t, j] = flat 128-lane
    block offset of the tile's j-th block; desc_cnt[t] = live blocks,
    padded up to a multiple of pallas_desc_unroll, or −1 when the tile's
    blocks don't fit pallas_desc_blocks — such tiles take the select-chain
    SLOW branch instead (always correct: it carries the key masks), so MB
    is purely a performance knob, never an overflow source.

    Dead slots (and unroll padding) point at the zeroed PARKING block the
    kernels append after the DMA windows (flat block nbuf·capacity/128):
    positions 0 are ≥ h·√3 from any valid target, so a dead block
    contributes exactly zero through the mask-free fast path."""
    ntiles, ns = base_blk.shape
    bl = cfg.pallas_block_lanes
    mb = cfg.pallas_desc_blocks
    nbuf = len(_sup_stencil(cfg)[0])
    dead_blk = nbuf * cfg.pallas_col_capacity // 128
    # bw: (ntiles, ns) blocks per window (callers pass block counts)
    cw = jnp.cumsum(bw, axis=1) - bw  # exclusive
    total = cw[:, -1] + bw[:, -1]
    j = jnp.arange(mb, dtype=jnp.int32)[None, :]  # (1, MB)
    # owner slot of flat block j: the LAST w with cw[w] <= j whose window is
    # non-empty (an empty window shares its cw with the next slot and can
    # never win the chain below)
    base_sel = jnp.zeros((ntiles, mb), jnp.int32)
    local = jnp.zeros((ntiles, mb), jnp.int32)
    for w in range(ns):
        is_w = (j >= cw[:, w : w + 1]) & (bw[:, w : w + 1] > 0)
        base_sel = jnp.where(is_w, base_blk[:, w : w + 1], base_sel)
        local = jnp.where(is_w, j - cw[:, w : w + 1], local)
    live = j < total[:, None]
    desc_base = jnp.where(live, base_sel + local * (bl // 128), dead_blk)

    def padded_cnt(u):
        # per-kernel unroll padding: dead slots cover the tail; a count
        # padded for one factor must NOT be reused by a kernel with a
        # different factor (the extra dead blocks are pure waste there —
        # measured +0.6 ms on the force kernel at 262k). validate()
        # enforces mb % u == 0.
        p = -(-total // u) * u
        return jnp.where(p <= mb, p, -1)

    return desc_base, padded_cnt(cfg.pallas_desc_unroll), padded_cnt(
        cfg.force_unroll
    )


def _record_layout(cfg: SimConfig, g: int):
    """Static offsets of each table inside a program's streamed record
    (pallas_stream_desc): one i32 record per grid program holds that
    program's slice of every per-tile table, padded to a 1024-entry
    multiple (the measured HBM→SMEM 1-D DMA alignment on this stack)."""
    ns = _sub_slots(cfg)
    mb = cfg.pallas_desc_blocks
    off = {"base": 0, "cnt": g * ns, "lead": 2 * g * ns, "fast": 3 * g * ns}
    n = 3 * g * ns + g
    if cfg.pallas_desc:
        off["dbase"] = n
        n += g * mb
        off["dcnt"] = n
        n += g
        off["dcntf"] = n
        n += g
    return off, -(-n // 1024) * 1024


def _pack_records(cols: "TileColumns", cfg: SimConfig, g: int):
    """i32[nprog·rec] streamed records from the per-tile tables (the SMEM
    footprint becomes O(1) per program instead of O(ntiles))."""
    ntiles = cols.sub_fast.shape[0]
    nprog = ntiles // g
    off, rec = _record_layout(cfg, g)
    parts = [
        cols.sub_base.reshape(nprog, -1),
        cols.sub_cnt.reshape(nprog, -1),
        cols.sub_lead.reshape(nprog, -1),
        cols.sub_fast.reshape(nprog, g),
    ]
    if cfg.pallas_desc:
        parts += [
            cols.desc_base.reshape(nprog, -1),
            cols.desc_cnt.reshape(nprog, g),
            cols.desc_cnt_f.reshape(nprog, g),
        ]
    mat = jnp.concatenate([p.astype(jnp.int32) for p in parts], axis=1)
    pad = rec - mat.shape[1]
    if pad:
        mat = jnp.concatenate(
            [mat, jnp.zeros((nprog, pad), jnp.int32)], axis=1
        )
    return mat.reshape(-1)


def _record_dma(i, rec_hbm, rec_smem, rec_sem, rec: int):
    """Stream program i's record HBM→SMEM, double-buffered across the
    sequential grid (program i+1's record loads during i's compute).
    Returns the resident record's base offset inside rec_smem."""
    nprog = pl.num_programs(0)

    def dma(prog):
        return pltpu.make_async_copy(
            rec_hbm.at[pl.ds(pl.multiple_of(prog * rec, 1024), rec)],
            rec_smem.at[
                pl.ds(pl.multiple_of((prog % 2) * rec, 1024), rec)
            ],
            rec_sem.at[prog % 2],
        )

    @pl.when(i == 0)
    def _():
        dma(0).start()

    @pl.when(i + 1 < nprog)
    def _():
        dma(i + 1).start()

    dma(i).wait()
    return (i % 2) * rec


def _make_tables(cfg: SimConfig, g: int, i, refs=None, rec_smem=None,
                 rec_base=None):
    """Uniform scalar accessors over the per-tile tables, backed either by
    the scalar-prefetch refs (refs=(sub_base, sub_cnt, sub_lead, sub_fast,
    desc_base, desc_cnt, desc_cnt_f)) or by the program's streamed record.
    All accessors take the PROGRAM-LOCAL sub index."""
    ns = _sub_slots(cfg)
    mb = cfg.pallas_desc_blocks
    if rec_smem is None:
        (b_ref, c_ref, l_ref, f_ref, db_ref, dc_ref, dcf_ref) = refs
        t = lambda sub: i * g + sub
        as32 = lambda v: v.astype(jnp.int32)
        return {
            "base": lambda sub, s: as32(b_ref[t(sub) * ns + s]),
            "cnt": lambda sub, s: as32(c_ref[t(sub) * ns + s]),
            "lead": lambda sub, s: as32(l_ref[t(sub) * ns + s]),
            "fast": lambda sub: f_ref[t(sub)] > 0,
            "dbase": (lambda sub, b: as32(db_ref[t(sub) * mb + b]))
            if db_ref is not None else None,
            "dcnt": (lambda sub: as32(dc_ref[t(sub)]))
            if dc_ref is not None else None,
            "dcntf": (lambda sub: as32(dcf_ref[t(sub)]))
            if dcf_ref is not None else None,
        }
    off, _rec = _record_layout(cfg, g)
    rd = lambda k: rec_smem[rec_base + k]
    return {
        "base": lambda sub, s: rd(off["base"] + sub * ns + s),
        "cnt": lambda sub, s: rd(off["cnt"] + sub * ns + s),
        "lead": lambda sub, s: rd(off["lead"] + sub * ns + s),
        "fast": lambda sub: rd(off["fast"] + sub) > 0,
        "dbase": (lambda sub, b: rd(off["dbase"] + sub * mb + b))
        if cfg.pallas_desc else None,
        "dcnt": (lambda sub: rd(off["dcnt"] + sub))
        if cfg.pallas_desc else None,
        "dcntf": (lambda sub: rd(off["dcntf"] + sub))
        if cfg.pallas_desc else None,
    }


def supertile_columns(
    key_s, valid_s, starts, cfg: SimConfig, interpret: bool = False
) -> TileColumns:
    if cfg.pallas_stencil == "hybrid":
        return _supertile_columns_hybrid(key_s, valid_s, starts, cfg,
                                         interpret)
    pt, g = effective_geometry(key_s.shape[0], cfg)
    cap = cfg.pallas_col_capacity
    c = cfg.num_cells_per_dim
    geom = _stencil(cfg)
    period = c * c if cfg.pallas_stencil == "slab3" else c
    kmin, kmax = _tile_key_span(key_s, valid_s, cfg, pt)
    skmin, skmax = _tile_key_span(key_s, valid_s, cfg, pt * g)
    # every starts-table lookup of this prep, resolved in ONE batch (the
    # rank-sort path makes the lookups ~free and lets XLA drop the
    # histogram-built table entirely from the production step)
    sub_lo, sub_hi = _geom_queries(kmin, kmax, cfg, geom)
    sup_lo, sup_hi = _geom_queries(skmin, skmax, cfg, geom)
    prev_i, next_i = _fast_queries(kmin, kmax, cfg, geom, period)
    (sub_s, sub_e, sup_s, sup_e, prev_end, next_start), rq_ovf = (
        _resolve_starts(
            key_s, starts,
            [sub_lo, sub_hi, sup_lo, sup_hi, prev_i, next_i], cfg,
            interpret,
        )
    )
    sub_start, sub_cnt, _ = _geom_finish(sub_s, sub_e, cfg)
    sup_start, sup_cnt, _ = _geom_finish(sup_s, sup_e, cfg)
    overflow = rq_ovf + jnp.sum(jnp.maximum(sup_cnt - cap, 0)).astype(
        jnp.int32
    )
    sub_base = sub_start - jnp.repeat(sup_start, g, axis=0)  # ≥0, 128-aligned
    # empty (cnt = 0) sub windows of a non-empty program can start past the
    # super window (their queries resolve near/at the array end); clip the
    # never-scanned base so the flat block offset stays inside _sub_dtype's
    # int16 budget
    sub_base = jnp.clip(sub_base, 0, cap)
    sub_cnt, excess = _clamp_sub(sub_base, sub_cnt, cfg)
    overflow = overflow + jnp.sum(excess).astype(jnp.int32)

    if cfg.pallas_stencil == "slab3":
        span_ok = jnp.ones_like(kmin, dtype=bool)
    else:
        span_ok = (kmax - kmin) <= (c - 3)
    sub_fast = _fast_finish(
        sub_start, sub_cnt, prev_end, next_start, cfg, span_ok
    )

    ns = sub_base.shape[1]
    base_blk = _flat_blocks(sub_base, jnp.arange(ns, dtype=jnp.int32), cfg)
    # non-hybrid: store cnt in BLOCK units (int16-safe at 2M-class window
    # capacities; the key mask subsumes the tail so lanes aren't needed)
    cnt_blocks = -(-sub_cnt // cfg.pallas_block_lanes)
    desc_base = desc_cnt = desc_cnt_f = None
    if cfg.pallas_desc:
        desc_base, desc_cnt, desc_cnt_f = _build_desc(base_blk, cnt_blocks, cfg)

    idt = _sub_dtype(cfg)
    cols = TileColumns(
        sub_base=base_blk.reshape(-1).astype(idt),
        sub_cnt=cnt_blocks.reshape(-1).astype(idt),
        sub_lead=jnp.zeros_like(sub_cnt).reshape(-1).astype(idt),
        sub_fast=sub_fast.astype(jnp.int32),
        sub_mode=jnp.full(
            kmin.shape, 0 if cfg.pallas_stencil == "slab3" else 1, jnp.int32
        ),
        sup_start=sup_start.reshape(-1),
        sup_cnt=jnp.minimum(sup_cnt, cap).reshape(-1),
        overflow=overflow,
        desc_base=None if desc_base is None else desc_base.reshape(-1).astype(idt),
        desc_cnt=None if desc_cnt is None else desc_cnt.astype(idt),
        desc_cnt_f=None if desc_cnt_f is None else desc_cnt_f.astype(idt),
    )
    if cfg.pallas_stream_desc:
        cols = cols._replace(records=_pack_records(cols, cfg, g))
    return cols


def _supertile_columns_hybrid(key_s, valid_s, starts, cfg: SimConfig,
                              interpret: bool = False):
    """Hybrid stencil prep: super-tiles always DMA the 3 slab windows (a dz
    slab covers all 9 of its plane's columns), and each SUB-tile picks the
    cheaper scan layout by measured block count:

      * slab mode — the 3 slab windows, packed at slots 0/3/6 so the
        kernel's static slot→buffer map (s → s//3) lands each on its plane's
        buffer; slots 1,2,4,5,7,8 get zero trip counts. Wins when the tile
        spans most of a row.
      * col mode — the 9 col windows at slots s = 3·dz_idx + dy_idx,
        indexing into the same slab buffers. Wins in dense pile-up tiles,
        where a narrow tile's slab windows are ~6C cells of padding. Only
        available when the tile span ≤ C−3: the kernel's plane-wide slab
        mask needs the three ranges of a plane to be DISJOINT (wider spans
        would double-count pairs appearing in two overlapping col ranges).

    col9 is charged `pallas_hybrid_bias` extra block-equivalents for its 6
    extra window loops."""
    pt, g = effective_geometry(key_s.shape[0], cfg)
    cap = cfg.pallas_col_capacity
    c = cfg.num_cells_per_dim
    bl = cfg.pallas_block_lanes
    slab_geom = _slab_geom(cfg)
    col_geom = _col_geom(cfg)

    kmin, kmax = _tile_key_span(key_s, valid_s, cfg, pt)
    skmin, skmax = _tile_key_span(key_s, valid_s, cfg, pt * g)
    # batch ALL starts-table lookups (sup + both sub geometries + both
    # fast-flag guards) into one resolution — see _rank_left
    sup_lo, sup_hi = _geom_queries(skmin, skmax, cfg, slab_geom)
    slab_lo, slab_hi = _geom_queries(kmin, kmax, cfg, slab_geom)
    col_lo, col_hi = _geom_queries(kmin, kmax, cfg, col_geom)
    sprev_i, snext_i = _fast_queries(kmin, kmax, cfg, slab_geom, c * c)
    cprev_i, cnext_i = _fast_queries(kmin, kmax, cfg, col_geom, c)
    (
        sup_s, sup_e, slab_s, slab_e, col_s, col_e,
        sprev_end, snext_start, cprev_end, cnext_start,
    ), rq_ovf = _resolve_starts(
        key_s, starts,
        [sup_lo, sup_hi, slab_lo, slab_hi, col_lo, col_hi,
         sprev_i, snext_i, cprev_i, cnext_i], cfg, interpret,
    )
    sup_start, sup_cnt, _ = _geom_finish(sup_s, sup_e, cfg)
    overflow = rq_ovf + jnp.sum(jnp.maximum(sup_cnt - cap, 0)).astype(
        jnp.int32
    )

    slab_start, slab_cnt, slab_lead = _geom_finish(slab_s, slab_e, cfg)
    col_start, col_cnt, col_lead = _geom_finish(col_s, col_e, cfg)

    sup_rep = jnp.repeat(sup_start, g, axis=0)  # (ntiles, 3)
    slab_base = slab_start - sup_rep  # ≥0, bl-aligned
    # column (dy, dz) indexes into its dz plane's slab buffer (slot s → s//3)
    col_base = col_start - sup_rep[:, jnp.arange(9) // 3]
    # clip never-scanned empty-window bases into the int16 budget (see the
    # non-hybrid prep)
    slab_base = jnp.clip(slab_base, 0, cap)
    col_base = jnp.clip(col_base, 0, cap)
    slab_cnt, slab_excess = _clamp_sub(slab_base, slab_cnt, cfg)
    col_cnt, col_excess = _clamp_sub(col_base, col_cnt, cfg)

    if cfg.pallas_ranged_maskless:
        # Maskless slow path: per-slot scan ranges must be pairwise
        # DISJOINT so no candidate lane is scanned twice per sub (see
        # config.pallas_ranged_maskless). col ranges are disjoint by the
        # span ≤ C−3 mode gate; slab plane ranges only overlap at tile
        # spans > C²−2C−3 — trim each plane's lead to the previous
        # plane's scan end (coverage unchanged: trimmed lanes are exactly
        # the ones the previous plane already scans).
        run = slab_start[:, 0] + slab_cnt[:, 0]
        leads = [slab_lead[:, 0]]
        for w in (1, 2):
            leads.append(
                jnp.maximum(slab_lead[:, w], run - slab_start[:, w])
            )
            run = jnp.maximum(run, slab_start[:, w] + slab_cnt[:, w])
        slab_lead = jnp.stack(leads, axis=1)

    span_ok = (kmax - kmin) <= (c - 3)
    blocks_slab = jnp.sum(-(-slab_cnt // bl), axis=1)
    blocks_col = jnp.sum(-(-col_cnt // bl), axis=1)
    mode_col = span_ok & (
        (blocks_col + cfg.pallas_hybrid_bias) < blocks_slab
    )

    fast_slab = _fast_finish(
        slab_start, slab_cnt, sprev_end, snext_start, cfg,
        jnp.ones_like(kmin, dtype=bool),
    )
    fast_col = _fast_finish(
        col_start, col_cnt, cprev_end, cnext_start, cfg, span_ok
    )

    ntiles = kmin.shape[0]

    def spread(slab3):
        """(ntiles, 3) slab values → slots 0/3/6 of a (ntiles, 9) layout."""
        out = jnp.zeros((ntiles, 9), jnp.int32)
        return out.at[:, jnp.asarray([0, 3, 6])].set(slab3)

    sub_base = jnp.where(mode_col[:, None], col_base, spread(slab_base))
    sub_cnt = jnp.where(mode_col[:, None], col_cnt, spread(slab_cnt))
    sub_lead = jnp.where(mode_col[:, None], col_lead, spread(slab_lead))
    sub_fast = jnp.where(mode_col, fast_col, fast_slab)
    overflow = overflow + jnp.sum(
        jnp.where(mode_col, col_excess, slab_excess)
    ).astype(jnp.int32)

    # every hybrid slot s (col or slab packing) lives in its dz plane's slab
    # buffer s//3
    base_blk = _flat_blocks(
        sub_base, jnp.arange(9, dtype=jnp.int32) // 3, cfg
    )
    desc_base = desc_cnt = desc_cnt_f = None
    if cfg.pallas_desc:
        desc_base, desc_cnt, desc_cnt_f = _build_desc(
            base_blk, -(-sub_cnt // cfg.pallas_block_lanes), cfg
        )

    idt = _sub_dtype(cfg)
    cols = TileColumns(
        sub_base=base_blk.reshape(-1).astype(idt),
        sub_cnt=sub_cnt.reshape(-1).astype(idt),
        sub_lead=sub_lead.reshape(-1).astype(idt),
        sub_fast=sub_fast.astype(jnp.int32),
        sub_mode=mode_col.astype(jnp.int32),
        sup_start=sup_start.reshape(-1),
        sup_cnt=jnp.minimum(sup_cnt, cap).reshape(-1),
        overflow=overflow,
        desc_base=None if desc_base is None else desc_base.reshape(-1).astype(idt),
        desc_cnt=None if desc_cnt is None else desc_cnt.astype(idt),
        desc_cnt_f=None if desc_cnt_f is None else desc_cnt_f.astype(idt),
    )
    if cfg.pallas_stream_desc:
        cols = cols._replace(records=_pack_records(cols, cfg, g))
    return cols


def _stack_cols(rows: list[jnp.ndarray], total_rows: int, col_cap: int, key_row: int):
    """Stack field rows into a (total_rows, n+col_cap) candidate matrix:
    sublane-padded to `total_rows` (HBM memrefs are (8,128)-tiled, so row
    counts must be multiples of 8), lane-padded by col_cap so dynamic slices
    never clamp. The padding key row gets KEY_PAD (never matched)."""
    mat = jnp.concatenate(rows)
    rows_n, n = mat.shape
    if rows_n < total_rows:
        mat = jnp.concatenate([mat, jnp.zeros((total_rows - rows_n, n), mat.dtype)])
    pad = jnp.zeros((total_rows, col_cap), mat.dtype).at[key_row].set(KEY_PAD)
    return jnp.concatenate([mat, pad], axis=1)


def _cand_slots(cfg: SimConfig, rows: int) -> int:
    """Candidate-buffer slots: 2 (double-buffered across programs — the
    next super-tile streams in while this one computes) unless that would
    exceed the scoped-VMEM budget (16 MiB by default — the measured
    compile limit on v5e; 2M-class window capacities hit it) — then 1,
    with each program paying its own DMA latency (compute-dominated at
    those sizes). The budget tracks cfg.pallas_scoped_vmem_kib (forwarded
    to the compiler via compiler_opts), less 1 MiB of headroom for the
    kernels' other scratch."""
    nbuf = len(_sup_stencil(cfg)[0])
    lanes = nbuf * cfg.pallas_col_capacity + (
        cfg.pallas_block_lanes if cfg.pallas_desc else 0
    )
    budget = (cfg.pallas_scoped_vmem_kib - 1024) * 1024
    return 1 if 2 * rows * lanes * 4 > budget else 2


def _super_dma_pipeline(
    i, cols_hbm, cand, sem, sup_start_ref, sup_cnt_ref, col_cap, ncols,
    nslots, nparts, scan_pad,
):
    """Start this/next super-tile's stencil-window DMAs (double-buffered
    across the sequential grid when nslots == 2; with nslots == 1 each
    program issues its own DMAs up front — the sequential grid makes that
    race-free) and return (wait_fn, slot). Each window transfers in
    `nparts` equal parts; part k ≥ 1 only moves when the window's
    candidate count actually reaches into it — the static capacity covers
    rare pile-up transients without paying its bandwidth on every tile.
    (At the ≥2M presets col_cap is sized for dam-break pile-ups — 131072
    lanes at 4M — while typical occupancy is ~1% of that; with only two
    parts the unconditional first half alone moved ~26 GB/step/kernel at
    4M. cfg.pallas_dma_parts raises the granularity there.)

    The VMEM destination is LANE-FLATTENED — window c occupies lanes
    [c·col_cap, (c+1)·col_cap) of a (nslots, rows, ncols·col_cap) scratch —
    so the kernels address any window with a single flat lane offset.

    scan_pad (= the kernels' block width): sub-window scans are BLOCK-
    rounded, so the last scanned lane can overrun the window's candidate
    count by up to one block — every transfer condition is padded by it
    so a scanned lane is never un-DMA'd garbage (with 2 bl-aligned parts
    the old `cap % 2·bl` constraint made this impossible by construction;
    finer parts and 128-aligned starts need the explicit pad)."""
    nprog = pl.num_programs(0)
    part_sz = col_cap // nparts

    def get_dma(prog, c, part):
        lo = part * part_sz
        return pltpu.make_async_copy(
            cols_hbm.at[
                :,
                pl.ds(
                    pl.multiple_of(sup_start_ref[prog * ncols + c] + lo, 128),
                    part_sz,
                ),
            ],
            cand.at[prog % nslots, :, pl.ds(c * col_cap + lo, part_sz)],
            sem.at[prog % nslots, c, part],
        )

    def start_all(prog):
        for c in range(ncols):
            get_dma(prog, c, 0).start()
            for k in range(1, nparts):
                @pl.when(
                    sup_cnt_ref[prog * ncols + c] > k * part_sz - scan_pad
                )
                def _(prog=prog, c=c, k=k):
                    get_dma(prog, c, k).start()

    if nslots == 1:
        start_all(i)
    else:
        @pl.when(i == 0)
        def _():
            start_all(0)

        @pl.when(i + 1 < nprog)
        def _():
            start_all(i + 1)

    def wait(c):
        get_dma(i, c, 0).wait()
        for k in range(1, nparts):
            @pl.when(sup_cnt_ref[i * ncols + c] > k * part_sz - scan_pad)
            def _(c=c, k=k):
                get_dma(i, c, k).wait()

    return wait, i % nslots


def _init_parking(i, cand, nbuf, col_cap, rows, key_row, cfg, nslots):
    """Zero the PARKING block (the bl lanes after the DMA windows) once, in
    every buffer slot: dead/unroll-padding descriptors point here.
    Position rows 0 → ≥ h·√3 from any valid target (w = 0, hr = 0); key row
    KEY_PAD → slow-path masks reject."""
    park = pl.ds(nbuf * col_cap, cfg.pallas_block_lanes)

    @pl.when(i == 0)
    def _():
        for s in range(nslots):
            cand[s, :, park] = jnp.zeros(
                (rows, cfg.pallas_block_lanes), jnp.float32
            )
            cand[s, key_row : key_row + 1, park] = jnp.full(
                (1, cfg.pallas_block_lanes), KEY_PAD, jnp.float32
            )


def _unrolled_fori(total, blk, init, u: int):
    """fori over blocks, processing `u` blocks per iteration (prep pads
    total to a multiple of max_desc_unroll, which both factors divide)."""
    if u == 1:
        return jax.lax.fori_loop(0, total, blk, init)

    def group(gi, acc):
        for k in range(u):
            acc = blk(gi * u + k, acc)
        return acc

    return jax.lax.fori_loop(0, total // u, group, init)


def _key_mask(ck, tkey_off, kind: str, cfg: SimConfig):
    """Accept exactly the stencil pairs of this window. "col": key diff
    within ±1 of the column offset. "slab"/"slab_ranged": within ±1 of
    {−C, 0, +C} — the three y-rows a slab covers (|u−C| ≤ 1 forces u > 0,
    so testing |u| against {1, C±1} covers both signs)."""
    u = ck - tkey_off
    if kind in ("slab", "slab_ranged"):
        au = jnp.abs(u)
        return (au <= 1.0) | (
            jnp.abs(au - jnp.float32(cfg.num_cells_per_dim)) <= 1.0
        )
    return jnp.abs(u) <= 1.0


def _slot_plan(cfg: SimConfig):
    """Static slot plan for the kernels: (slot, buffer, key_offset,
    mask_kind) per descriptor slot. One plan per config — the hybrid
    stencil needs NO in-kernel mode dispatch (lax.cond/switch on this
    Mosaic stack execute every branch and select — measured 25.1 ms vs
    slab3's 14.9 at 262k for a branching variant): every hybrid slot
    uses its dz PLANE's slab key offset and slab mask, which is correct
    for both packings prep may choose per sub-tile:
      * slab mode — the plane's slab window in slot 3·dz (buffer dz = s//3
        for slots 0,3,6), slots 1,2,4,5,7,8 empty (zero trip count);
      * col mode — the 9 col windows in slots s = 3·dz + dy (buffer s//3).
        Under the slab mask a col window accepts its plane's stencil pairs
        regardless of dy, so exactness needs the three ranges of a plane to
        be disjoint (prep gates col mode on span ≤ C−3) and the scan not to
        leak outside the true range — the "slab_ranged" slow path bounds
        lanes to [lead, cnt) (alignment lead-in and block-rounded tail are
        cut exactly), and the fast path keeps the col9 lead/tail guards.
    """
    col = _offsets(cfg)
    slab = _slab_geom(cfg)[0]
    if cfg.pallas_stencil == "col9":
        return [(s, s, col[s], "col") for s in range(9)]
    if cfg.pallas_stencil == "slab3":
        return [(s, s, slab[s], "slab") for s in range(3)]
    return [(s, s // 3, slab[s // 3], "slab_ranged") for s in range(9)]


# ---------------------------------------------------------------- density

def _slot_scalars(sub, tb, cfg, su=None):
    """Per-sub scalar descriptors for the FLAT block loop: each kernel runs
    ONE fori_loop over the concatenation of every slot's blocks instead of
    one fori_loop per slot. Threading a large accumulator carry through
    per-slot loop boundaries spills it to VMEM each time (measured on v5e at
    262k/step 60: the force kernel's 3×(pt,bl) carry cost ~1.1 ms PER extra
    boundary — 9-slot hybrid 14.4 ms vs 3-slot slab3 7.6 — while the density
    kernel's single (pt,bl) carry stays in registers). Returns
    (starts_blk, rows, total_blocks): starts_blk[s] = first flat block of
    slot s, rows[s] = that slot's scalars (base, lead, cnt, starts_blk,
    buffer index, key offset)."""
    plan = _slot_plan(cfg)
    bl = cfg.pallas_block_lanes
    ranged = plan[0][3] == "slab_ranged"
    starts_blk, rows = [], []
    cb = jnp.int32(0)
    for s, _buf, off, _ in plan:
        # sub_cnt unit: LANES for hybrid (the ranged bound needs them),
        # BLOCKS otherwise (int16-safe at huge window capacities)
        cnt = tb["cnt"](sub, s)
        blocks = pl.cdiv(cnt, bl) if ranged else cnt
        # sub_base is stored in flat 128-lane block units (buffer offset
        # folded in) — ×128 recovers the flat lane offset
        base = tb["base"](sub, s) * 128
        lead = tb["lead"](sub, s) if ranged else jnp.int32(0)
        starts_blk.append(cb)
        rows.append((base, lead, cnt, cb, jnp.float32(off)))
        cb = cb + blocks
    if su is None:
        su = cfg.pallas_slow_unroll
    if su > 1:
        # parking rows: flat blocks cb..cb+su−2 (the unroll pad — at most
        # su−1 blocks) each resolve to their OWN row (so `local` is always
        # 0) and scan the zeroed parking block appended after the DMA
        # windows. A pad block's contribution is exactly zero through the
        # distance cutoffs regardless of the key mask (parked positions
        # sit ≥ 0.17 from any valid target); lead=0/cnt=bl keep the
        # slab_ranged lane bound from excluding what is already zero.
        nbuf = len(_sup_stencil(cfg)[0])
        park = jnp.int32(nbuf * cfg.pallas_col_capacity)
        for k in range(su - 1):
            cbk = cb + jnp.int32(k)
            starts_blk.append(cbk)
            rows.append(
                (park, jnp.int32(0), jnp.int32(bl), cbk, jnp.float32(0))
            )
    return starts_blk, rows, cb


def _pick_slot(b, starts_blk, rows):
    """Scalar select chain resolving flat block b to its slot's scalars: the
    owner is the LAST slot s with starts_blk[s] <= b (an empty slot shares
    its start with the next slot, so it can never win). ~5 scalar selects
    per extra slot, issued on the scalar core in parallel with the VPU.
    (The flat DESCRIPTOR loop — cfg.pallas_desc — replaces this chain with
    one SMEM load per block; this path remains for pallas_desc=False.)"""
    sel = list(rows[0])
    for s in range(1, len(rows)):
        is_s = b >= starts_blk[s]
        sel = [jnp.where(is_s, rows[s][k], sel[k]) for k in range(len(sel))]
    return sel


def _unpack_refs(refs, cfg, geom, rows):
    """(tables, sup_start_ref, sup_cnt_ref, tgt_ref, cols_hbm, out_ref,
    cand, sem) from the mode-dependent pallas ref list. In streamed mode
    the per-tile tables arrive as an HBM record per program, DMA'd into a
    small SMEM scratch here; otherwise they are scalar-prefetch refs."""
    i = pl.program_id(0)
    g = geom[1]
    if cfg.pallas_stream_desc:
        (sup_start_ref, sup_cnt_ref, tgt_ref, cols_hbm, rec_hbm, out_ref,
         cand, sem, rec_smem, rec_sem) = refs
        _off, rec = _record_layout(cfg, g)
        rec_base = _record_dma(i, rec_hbm, rec_smem, rec_sem, rec)
        tb = _make_tables(cfg, g, i, rec_smem=rec_smem, rec_base=rec_base)
    elif cfg.pallas_desc:
        (sub_base_ref, sub_cnt_ref, sub_lead_ref, sub_fast_ref,
         desc_base_ref, desc_cnt_ref, desc_cnt_f_ref, sup_start_ref,
         sup_cnt_ref, tgt_ref, cols_hbm, out_ref, cand, sem) = refs
        tb = _make_tables(
            cfg, g, i,
            refs=(sub_base_ref, sub_cnt_ref, sub_lead_ref, sub_fast_ref,
                  desc_base_ref, desc_cnt_ref, desc_cnt_f_ref),
        )
    else:
        (sub_base_ref, sub_cnt_ref, sub_lead_ref, sub_fast_ref,
         sup_start_ref, sup_cnt_ref, tgt_ref, cols_hbm, out_ref, cand,
         sem) = refs
        tb = _make_tables(
            cfg, g, i,
            refs=(sub_base_ref, sub_cnt_ref, sub_lead_ref, sub_fast_ref,
                  None, None, None),
        )
    return tb, sup_start_ref, sup_cnt_ref, tgt_ref, cols_hbm, out_ref, cand, sem


def _density_kernel(*refs, cfg, geom):
    i = pl.program_id(0)
    pt, g = geom
    tb, sup_start_ref, sup_cnt_ref, tgt_ref, cols_hbm, rho_ref, cand, sem = (
        _unpack_refs(refs, cfg, geom, 8)
    )
    col_cap = cfg.pallas_col_capacity
    h2 = jnp.float32(cfg.h2)
    nbuf = len(_sup_stencil(cfg)[0])
    kind = _slot_plan(cfg)[0][3]  # uniform mask kind across slots
    nslots = _cand_slots(cfg, 8)
    wait, slot = _super_dma_pipeline(
        i, cols_hbm, cand, sem, sup_start_ref, sup_cnt_ref, col_cap, nbuf,
        nslots, cfg.pallas_dma_parts, cfg.pallas_block_lanes,
    )
    if cfg.pallas_desc:
        _init_parking(i, cand, nbuf, col_cap, 8, 3, cfg, nslots)

    for c in range(nbuf):  # fully unrolled: offsets are compile-time constants
        wait(c)
    for sub in range(g):
        t0 = sub * pt
        tx = tgt_ref[t0 : t0 + pt, 0:1]
        ty = tgt_ref[t0 : t0 + pt, 1:2]
        tz = tgt_ref[t0 : t0 + pt, 2:3]
        tkey = tgt_ref[t0 : t0 + pt, 3:4]
        chain = _slot_scalars(sub, tb, cfg)

        def sub_acc(fast, tx=tx, ty=ty, tz=tz, tkey=tkey, sub=sub,
                    chain=chain):
            bl = cfg.pallas_block_lanes
            # fast + desc → flat descriptor loop (one SMEM load per block,
            # unrolled over dead-block padding); otherwise the select-chain
            # loop (always correct; carries the key masks when not fast)
            use_desc = fast and cfg.pallas_desc
            if use_desc:
                total = tb["dcnt"](sub)
            else:
                starts_blk, rows, total = chain

            # density split-target: ds sequential target slices per block
            # share one candidate load (see config.pallas_density_split)
            dpt = pt // cfg.pallas_density_split
            assert dpt >= 8, "pallas_density_split too large (pt/ds < 8)"
            dparts = range(0, pt, dpt)

            def blk(b, carry):
                if use_desc:
                    base = tb["dbase"](sub, b) * 128
                    sl = pl.ds(pl.multiple_of(base, 128), bl)
                else:
                    base, lead, cnt, cb, off = _pick_slot(
                        b, starts_blk, rows
                    )
                    local = b - cb
                    sl = pl.ds(pl.multiple_of(base + local * bl, 128), bl)
                # ONE wide dynamic-offset load per block: (8, bl) brings all
                # candidate rows; per-row (1, bl) slices of the loaded value
                # are static sublane extracts (dynamic-offset VMEM slices
                # cost ~40 ns each on this stack — scripts/loop_probe.py).
                # narrow_load: only rows 0..3 (x, y, z, key) are ever read —
                # rows 4..7 are sublane-tile zero padding.
                if cfg.pallas_density_narrow_load:
                    cblk = cand[slot, 0:4, sl]
                else:
                    cblk = cand[slot, :, sl]
                cx = cblk[0:1, :]
                cy = cblk[1:2, :]
                cz = cblk[2:3, :]
                if not fast:
                    ck = cblk[3:4, :]

                def wpart(ts, ls, lw):
                    """Masked poly6 contribution of candidate lanes
                    [ls, ls+lw) against targets `ts` — elementwise, so a
                    lane-restricted call is a bit-exact slice of the
                    full-width one."""
                    dx = tx[ts] - cx[:, ls : ls + lw]
                    dy = ty[ts] - cy[:, ls : ls + lw]
                    dz = tz[ts] - cz[:, ls : ls + lw]
                    r2 = dx * dx + dy * dy + dz * dz  # (dpt, lw)
                    w = jnp.maximum(h2 - r2, 0.0)  # folds r² ≤ h² cutoff
                    w = w * w * w
                    if fast:
                        # prep proved the key mask redundant for this sub
                        # (window disjointness + lead-in/tail isolation):
                        # the r ≤ h cutoff alone is exact, parked
                        # sentinel/pad rows are ≥ 0.17 from any valid
                        # particle.
                        return w
                    # col9/slab3: no per-lane count check — alignment
                    # lead-in lanes carry keys below the accepted set,
                    # beyond-window lanes carry keys above it or KEY_PAD —
                    # the key mask rejects all.
                    if kind == "slab_ranged":
                        # hybrid: bound lanes to the true range [lead, cnt)
                        # (the plane-wide slab mask cannot separate a col
                        # window from its neighbors' lead-in/tail lanes)
                        li = (
                            local * bl + ls
                            + jax.lax.broadcasted_iota(
                                jnp.int32, (1, lw), 1
                            )
                        )
                        keyhit = (li >= lead) & (li < cnt)
                        if not cfg.pallas_ranged_maskless:
                            # with prep-trimmed disjoint ranges the bound
                            # alone is exact (config.pallas_ranged_maskless)
                            keyhit = keyhit & _key_mask(
                                ck[:, ls : ls + lw], tkey[ts] + off, kind,
                                cfg,
                            )
                    else:
                        keyhit = _key_mask(
                            ck[:, ls : ls + lw], tkey[ts] + off, kind, cfg
                        )
                    return jnp.where(keyhit, w, 0.0)

                out = []
                for di, d0 in enumerate(dparts):
                    ts = slice(d0, d0 + dpt)
                    if cfg.pallas_density_lane_split:
                        # lane-split: each bl/2-lane half computed on
                        # half-width temps and added into its own carry
                        # half — bit-exact (slicing elementwise math
                        # commutes; carry lanes never mix)
                        bl2 = bl // 2
                        out.append(jnp.concatenate([
                            carry[di][:, :bl2] + wpart(ts, 0, bl2),
                            carry[di][:, bl2:] + wpart(ts, bl2, bl2),
                        ], axis=1))
                    else:
                        out.append(carry[di] + wpart(ts, 0, bl))
                return tuple(out)

            init = tuple(
                jnp.zeros((dpt, bl), jnp.float32) for _ in dparts
            )
            # dynamic trip count: dead capacity costs nothing
            if use_desc:
                return _unrolled_fori(total, blk, init, cfg.pallas_desc_unroll)
            if cfg.pallas_slow_unroll > 1:
                # pad the chain trip count onto the parking rows (su−1 pad
                # blocks max — see _slot_scalars) so the slow branch gets
                # the same dead-block unroll the descriptor loop has
                su = cfg.pallas_slow_unroll
                return _unrolled_fori(pl.cdiv(total, su) * su, blk, init, su)
            return jax.lax.fori_loop(0, total, blk, init)

        if cfg.pallas_desc:
            # non-fitting tiles (desc_cnt < 0) fall back to the masked
            # select-chain branch — MB is a performance knob, not a capacity
            pred = tb["fast"](sub) & (tb["dcnt"](sub) >= 0)
        else:
            pred = tb["fast"](sub)
        acc0 = jax.lax.cond(
            pred,
            lambda: sub_acc(True),
            lambda: sub_acc(False),
        )
        rho_ref[0, sub, :] = (
            jnp.float32(cfg.mass)
            * jnp.float32(cfg.d_kernel_coeff)
            * jnp.concatenate([jnp.sum(a, axis=1) for a in acc0])
        )


def density_pallas(xyz, key_s, cols_info: TileColumns, cfg, *, interpret=False):
    """xyz: 3-tuple of f32[n] sorted position fields (1-D rows — the payload
    sort emits them directly; (n,3) callers slice). Returns raw density f32[n]
    (pre-clamp)."""
    x, y, z = xyz
    n = x.shape[0]
    pt, g = effective_geometry(n, cfg)
    col_cap = cfg.pallas_col_capacity
    nprog = n // (pt * g)

    key_f = key_s.astype(jnp.float32)
    cols = _stack_cols(
        [x[None, :], y[None, :], z[None, :], key_f[None, :]], 8, col_cap,
        key_row=3,
    )
    tgts = jnp.stack([x, y, z, key_f], axis=1)  # (n,4)

    nbuf = len(_sup_stencil(cfg)[0])
    prefetch = _prefetch_args(cols_info, cfg)
    in_specs = [
        pl.BlockSpec((pt * g, 4), lambda i, *_: (i, 0)),
        pl.BlockSpec(memory_space=pltpu.HBM),
    ]
    inputs = [tgts, cols]
    scratch = [
        # +1 parking block after the DMA windows when the descriptor
        # loop is on (dead/unroll-padding blocks scan it)
        pltpu.VMEM(
            (_cand_slots(cfg, 8), 8, nbuf * col_cap
             + (cfg.pallas_block_lanes if cfg.pallas_desc else 0)),
            jnp.float32,
        ),
        pltpu.SemaphoreType.DMA(
            (_cand_slots(cfg, 8), nbuf, cfg.pallas_dma_parts)
        ),
    ]
    if cfg.pallas_stream_desc:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.HBM))
        inputs.append(cols_info.records)
        _off, rec = _record_layout(cfg, g)
        scratch += [
            pltpu.SMEM((2 * rec,), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=len(prefetch),
        grid=(nprog,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, g, pt), lambda i, *_: (i, 0, 0)),
        scratch_shapes=scratch,
    )
    rho = pl.pallas_call(
        functools.partial(_density_kernel, cfg=cfg, geom=(pt, g)),
        out_shape=jax.ShapeDtypeStruct((nprog, g, pt), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(*prefetch, *inputs)
    return rho.reshape(n)


def _prefetch_args(cols_info: TileColumns, cfg: SimConfig):
    """Scalar-prefetch argument list in the kernels' unpacking order (the
    desc arrays slot in between sub_fast and sup_start when present)."""
    if cfg.pallas_stream_desc:
        # per-tile tables travel as streamed HBM records, not SMEM prefetch
        return [cols_info.sup_start, cols_info.sup_cnt]
    args = [
        cols_info.sub_base,
        cols_info.sub_cnt,
        cols_info.sub_lead,
        cols_info.sub_fast,
    ]
    if cfg.pallas_desc:
        args += [
            cols_info.desc_base, cols_info.desc_cnt, cols_info.desc_cnt_f
        ]
    args += [cols_info.sup_start, cols_info.sup_cnt]
    return args


# ---------------------------------------------------------------- forces

# candidate field rows for the force kernel
_FX, _FY, _FZ, _FVX, _FVY, _FVZ, _FI2R, _FPI2R, _FKEY = range(9)


def _force_rows(cfg: SimConfig) -> tuple[int, int]:
    """(total sublane rows, key row) of the force candidate matrix.
    Default: 9 fields padded to the next sublane multiple (16). Slim
    (cfg.pallas_force_slim): the p·1/(2ρ) row is derived per block from
    the i2r row instead of shipped, leaving exactly 8 rows
    (x, y, z, vx, vy, vz, i2r, key) — half the window DMA volume and
    half the per-block load width."""
    if cfg.pallas_force_slim:
        return 8, 7
    return 16, _FKEY


def _force_kernel(*refs, cfg, geom):
    i = pl.program_id(0)
    pt, g = geom
    rows, fkey = _force_rows(cfg)
    tb, sup_start_ref, sup_cnt_ref, tgt_ref, cols_hbm, f_ref, cand, sem = (
        _unpack_refs(refs, cfg, geom, rows)
    )
    col_cap = cfg.pallas_col_capacity
    h = jnp.float32(cfg.h)
    eps = jnp.float32(cfg.eps)
    m = jnp.float32(cfg.mass)
    vk = jnp.float32(cfg.v_kernel_coeff)
    mu = jnp.float32(cfg.viscosity)
    nbuf = len(_sup_stencil(cfg)[0])
    kind = _slot_plan(cfg)[0][3]  # uniform mask kind across slots
    nslots = _cand_slots(cfg, rows)
    wait, slot = _super_dma_pipeline(
        i, cols_hbm, cand, sem, sup_start_ref, sup_cnt_ref, col_cap, nbuf,
        nslots, cfg.pallas_dma_parts, cfg.pallas_block_lanes,
    )
    if cfg.pallas_desc:
        _init_parking(i, cand, nbuf, col_cap, rows, fkey, cfg, nslots)

    for c in range(nbuf):
        wait(c)
    for sub in range(g):
        t0 = sub * pt
        tx = tgt_ref[t0 : t0 + pt, 0:1]
        ty = tgt_ref[t0 : t0 + pt, 1:2]
        tz = tgt_ref[t0 : t0 + pt, 2:3]
        tvx = tgt_ref[t0 : t0 + pt, 3:4]
        tvy = tgt_ref[t0 : t0 + pt, 4:5]
        tvz = tgt_ref[t0 : t0 + pt, 5:6]
        tp = tgt_ref[t0 : t0 + pt, 6:7]
        tkey = tgt_ref[t0 : t0 + pt, 7:8]
        chain = _slot_scalars(sub, tb, cfg, su=cfg.slow_unroll_force)

        def sub_force(fast, tx=tx, ty=ty, tz=tz, tvx=tvx, tvy=tvy, tvz=tvz,
                      tp=tp, tkey=tkey, sub=sub, chain=chain):
            bl = cfg.pallas_block_lanes
            # carry fold: halve the loop-carried accumulator lanes (force is
            # VREG-pressure-bound; summation order change only)
            bl2 = bl // 2 if cfg.pallas_force_fold else bl
            # split-target compute: pallas_force_split_factor sequential
            # target slices per block share one candidate load, dividing
            # the live (pt, bl) temporary footprint by the factor
            if cfg.pallas_force_split:
                hpt = pt // cfg.pallas_force_split_factor
                assert hpt >= 8, (
                    "pallas_force_split_factor too large: pt/factor must "
                    "be >= 8 sublanes"
                )
            else:
                hpt = pt
            halves = range(0, pt, hpt)
            zero = jnp.zeros((hpt, bl2), jnp.float32)
            use_desc = fast and cfg.pallas_desc
            if use_desc:
                total = tb["dcntf"](sub)
            else:
                starts_blk, rows, total = chain

            def blk(b, carry):
                if use_desc:
                    base = tb["dbase"](sub, b) * 128
                    sl = pl.ds(pl.multiple_of(base, 128), bl)
                else:
                    base, lead, cnt, cb, off = _pick_slot(
                        b, starts_blk, rows
                    )
                    local = b - cb
                    sl = pl.ds(pl.multiple_of(base + local * bl, 128), bl)
                # one wide (rows, bl) dynamic-offset load; rows are static
                # sublane extracts (see the density-kernel note)
                cblk = cand[slot, :, sl]
                if cfg.pallas_force_slim:
                    # recover the dropped p·1/(2ρ) row ONCE PER BLOCK
                    # (shared by every target slice / lane half):
                    # p/(2ρ) = k(ρ−ρ₀)·i2r = ½k − kρ₀·i2r via ρ·i2r ≡ ½
                    # (≤1 ulp), with the max reproducing the p ≥ 0 clamp.
                    # i2r = 0 padding/parking lanes give ½k — finite, and
                    # killed by hr = 0 like any out-of-support lane.
                    gk = jnp.float32(cfg.gas_constant)
                    pi2r_blk = jnp.maximum(
                        0.0,
                        0.5 * gk
                        - (gk * jnp.float32(cfg.rest_density))
                        * cblk[_FI2R : _FI2R + 1, :],
                    )

                def pair(ts, ls, lw):
                    """(cx, cy, cz) contributions of candidate lanes
                    [ls, ls+lw) of this block against targets `ts`. Pure
                    elementwise → restricting the lane range is bit-exact
                    slicing of the full-width computation."""
                    row = lambda r: cblk[r : r + 1, ls : ls + lw]
                    dx = tx[ts] - row(_FX)
                    dy = ty[ts] - row(_FY)
                    dz = tz[ts] - row(_FZ)
                    r2 = dx * dx + dy * dy + dz * dz
                    # r and 1/r via one rsqrt (sqrt+divide are the two slow
                    # transcendental slots in this loop); r2=0 → NaN, which
                    # the masks turn into exact 0 through the selects.
                    # selfless: clamp r² to eps² first so inv_r stays
                    # finite and the self-pair cancels through dx = dv = 0
                    # instead of a mask (config.pallas_force_selfless);
                    # live lanes (r ≥ eps) see a no-op max — bit-identical.
                    # A DISTINCT pair with 0 < r < eps would get a large
                    # finite force here where the reference returns 0
                    # (cu:110,125) — physically unreachable (documented in
                    # config.py; parity gates cover it) and never NaN.
                    if cfg.pallas_force_selfless:
                        inv_r = jax.lax.rsqrt(jnp.maximum(r2, eps * eps))
                    else:
                        inv_r = jax.lax.rsqrt(r2)
                    r = r2 * inv_r
                    # The r ≥ eps guard excludes self-pairs (reference
                    # EPS_F, cu:107,126). The r ≤ h cutoff is folded into
                    # hr: max(h−r, 0) zeroes BOTH terms outside the support
                    # — the reference's pressure guard (r² ≤ h², cu:107)
                    # and viscosity guard (r ≤ h, cu:126) are the same set
                    # for r ≥ 0, and both scale linearly in hr. When prep
                    # proved the key mask redundant (fast), eps alone
                    # remains; else the key-difference mask bounds the
                    # window (density note).
                    if fast:
                        live = None if cfg.pallas_force_selfless else (
                            r >= eps
                        )
                    else:
                        if kind == "slab_ranged":
                            # hybrid: bound lanes to the true range — see
                            # the density kernel note
                            li = (
                                local * bl + ls
                                + jax.lax.broadcasted_iota(
                                    jnp.int32, (1, lw), 1
                                )
                            )
                            keyhit = (li >= lead) & (li < cnt)
                            if not cfg.pallas_ranged_maskless:
                                keyhit = keyhit & _key_mask(
                                    row(fkey), tkey[ts] + off, kind, cfg
                                )
                        else:
                            keyhit = _key_mask(
                                row(fkey), tkey[ts] + off, kind, cfg
                            )
                        if cfg.pallas_force_selfless:
                            live = keyhit
                        else:
                            live = keyhit & (r >= eps)
                    hr = jnp.maximum(h - r, 0.0)
                    if cfg.pallas_force_selfless and live is not None:
                        # slow path: fold the window mask into ONE select
                        # on the shared hr factor (both terms scale
                        # linearly in hr; inv_r is finite by the clamp, so
                        # no NaN escapes the zeroed lanes)
                        hr = jnp.where(live, hr, 0.0)
                        live = None
                    # pressure: −m(p_i+p_j)/(2ρ_j)·∇W_spiky; the
                    # reference's two minus signs cancel (∇W_spiky =
                    # disp·(−vk)(h−r)²/r, cu:99-117, 224-235), so s_p =
                    # +m·vk·(p_i+p_j)/(2ρ_j)·(h−r)²/r, applied along disp.
                    # The common m·vk factor of BOTH terms is deferred to
                    # the per-target sums after the block loop (the same
                    # deferred-scale the density kernel uses) — one fewer
                    # multiply per pair; rounding changes within the 1e-4
                    # parity budget.
                    if cfg.pallas_force_slim:
                        term = (
                            tp[ts] * row(_FI2R)
                            + pi2r_blk[:, ls : ls + lw]
                        )
                    else:
                        term = tp[ts] * row(_FI2R) + row(_FPI2R)
                    if live is None:  # selfless: no per-term selects
                        s_p = term * hr * hr * inv_r
                        s_v = (2.0 * mu) * hr * row(_FI2R)
                    else:
                        s_p = jnp.where(
                            live, term * hr * hr * inv_r, 0.0
                        )
                        # viscosity: μ m vk (h−r)/ρ_j for eps ≤ r ≤ h
                        # (r == h included, cu:119-130, 237-250); _FI2R is
                        # 1/(2ρ_j).
                        s_v = jnp.where(
                            live, (2.0 * mu) * hr * row(_FI2R), 0.0
                        )
                    cx = s_p * dx + s_v * (row(_FVX) - tvx[ts])
                    cy = s_p * dy + s_v * (row(_FVY) - tvy[ts])
                    cz = s_p * dz + s_v * (row(_FVZ) - tvz[ts])
                    return cx, cy, cz

                out = []
                for hi, h0 in enumerate(halves):
                    ts = slice(h0, h0 + hpt)
                    accs = carry[3 * hi : 3 * hi + 3]
                    if cfg.pallas_force_lane_split:
                        # lane-split: each bl2-lane half computed on
                        # HALF-WIDTH temps (live VREG footprint ÷2), then
                        # summed exactly like the fold below — bit-exact
                        # (slicing an elementwise computation commutes
                        # with it, and the add tree matches the fold's)
                        pa = pair(ts, 0, bl2)
                        pb = pair(ts, bl2, bl2)
                        comps = [pa[k] + pb[k] for k in range(3)]
                    else:
                        comps = list(pair(ts, 0, bl))
                        if cfg.pallas_force_fold:
                            comps = [
                                c[:, :bl2] + c[:, bl2:] for c in comps
                            ]
                    out += [a + c for a, c in zip(accs, comps)]
                return tuple(out)

            init = (zero,) * (3 * len(halves))
            if use_desc:
                return _unrolled_fori(total, blk, init, cfg.force_unroll)
            if cfg.slow_unroll_force > 1:
                # slow-branch unroll via the parking rows (_slot_scalars)
                su = cfg.slow_unroll_force
                return _unrolled_fori(pl.cdiv(total, su) * su, blk, init, su)
            return jax.lax.fori_loop(0, total, blk, init)

        if cfg.pallas_desc:
            pred = tb["fast"](sub) & (tb["dcntf"](sub) >= 0)
        else:
            pred = tb["fast"](sub)
        acc = jax.lax.cond(
            pred,
            lambda: sub_force(True),
            lambda: sub_force(False),
        )
        hpt = pt // cfg.pallas_force_split_factor if cfg.pallas_force_split else pt
        mvk = m * vk  # deferred per-pair scale (see pair())
        for hi, h0 in enumerate(range(0, pt, hpt)):
            f_ref[0, 0, sub, h0 : h0 + hpt] = mvk * jnp.sum(acc[3 * hi], axis=1)
            f_ref[1, 0, sub, h0 : h0 + hpt] = mvk * jnp.sum(acc[3 * hi + 1], axis=1)
            f_ref[2, 0, sub, h0 : h0 + hpt] = mvk * jnp.sum(acc[3 * hi + 2], axis=1)


def force_pallas(xyz, vxyz, rho_s, p_s, key_s, cols_info, cfg, *, interpret=False):
    """xyz/vxyz: 3-tuples of f32[n] sorted position/velocity fields.
    Returns force f32[3,n] FIELD-MAJOR rows (lane-perfect output tiling; the
    fields-native step consumes rows directly, (n,3) callers transpose)."""
    x, y, z = xyz
    vx, vy, vz = vxyz
    n = x.shape[0]
    pt, g = effective_geometry(n, cfg)
    col_cap = cfg.pallas_col_capacity
    nprog = n // (pt * g)

    key_f = key_s.astype(jnp.float32)
    inv2rho = 0.5 / rho_s
    rows, fkey = _force_rows(cfg)
    field_rows = [
        x[None, :], y[None, :], z[None, :],
        vx[None, :], vy[None, :], vz[None, :],
        inv2rho[None, :],
    ]
    if not cfg.pallas_force_slim:
        # p·1/(2ρ) precomputed per particle; slim derives it per block
        field_rows.append((p_s * inv2rho)[None, :])
    field_rows.append(key_f[None, :])
    cols = _stack_cols(field_rows, rows, col_cap, key_row=fkey)
    tgts = jnp.stack([x, y, z, vx, vy, vz, p_s, key_f], axis=1)  # (n, 8)

    nbuf = len(_sup_stencil(cfg)[0])
    prefetch = _prefetch_args(cols_info, cfg)
    in_specs = [
        pl.BlockSpec((pt * g, 8), lambda i, *_: (i, 0)),
        pl.BlockSpec(memory_space=pltpu.HBM),
    ]
    inputs = [tgts, cols]
    scratch = [
        pltpu.VMEM(
            (_cand_slots(cfg, rows), rows, nbuf * col_cap
             + (cfg.pallas_block_lanes if cfg.pallas_desc else 0)),
            jnp.float32,
        ),
        pltpu.SemaphoreType.DMA(
            (_cand_slots(cfg, rows), nbuf, cfg.pallas_dma_parts)
        ),
    ]
    if cfg.pallas_stream_desc:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.HBM))
        inputs.append(cols_info.records)
        _off, rec = _record_layout(cfg, g)
        scratch += [
            pltpu.SMEM((2 * rec,), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=len(prefetch),
        grid=(nprog,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((3, 1, g, pt), lambda i, *_: (0, i, 0, 0)),
        scratch_shapes=scratch,
    )
    f = pl.pallas_call(
        functools.partial(_force_kernel, cfg=cfg, geom=(pt, g)),
        out_shape=jax.ShapeDtypeStruct((3, nprog, g, pt), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(*prefetch, *inputs)
    return f.reshape(3, n)  # field-major rows (fx, fy, fz)
