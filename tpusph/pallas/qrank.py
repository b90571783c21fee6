"""Pallas rank kernel for EXPLICIT query arrays against the sorted keys.

Computes ranks[i] = #{j : key_sorted[j] < q[i]} (== starts[q[i]]) for an
arbitrary int32 query array — the batched starts-table resolution the prep
phase needs (tpusph/pallas/fused.py `_resolve_starts`), without building
the table at all and without the two N+Q payload sorts of the rank-sort
path (`_rank_left`). At 1M particles the rank sorts cost ~5.5 ms/step; the
query count is only ~0.3·N, so sorting the queries ALONE and ranking them
with a chunked outer-compare against the (already sorted) keys does
asymptotically less work.

This kernel is the scale-regime replacement for `kernelBuildGrid`'s
per-cell heads (/root/reference/src/simulator.cu:133-147): the reference
scatters per-particle list heads; we answer only the O(N/tile) window
queries the stencil actually asks.

Design (and why it beats `starts.py`, the table-rank kernel that measured
NEGATIVE):

  1. Sort the Q queries by value with an index payload (2-lane lax.sort of
     Q — cheap: Q ≈ 0.2–0.3·N and this stack's payload sort is fast).
  2. Cut the sorted queries into CHUNKS of 64 consecutive values. Coarse
     chunk-edge rank bounds come from one fused outer-compare of the edge
     queries against the 256-subsampled keys (`jnp.searchsorted` would
     cost ~log2(N) GATHERS per edge — gather cost scales with index count
     on this stack, ~5 ms at 1M). Chunk c's fine ranks then only depend
     on keys in [bound(c), bound(c+1)) — because chunks are consecutive
     IN VALUE, the per-chunk key spans partition the keys, so total
     compare work is 64·N pair-lanes (the table kernel's strided chunks
     each spanned the whole table range → chunk·N work).
  3. S chunks share one grid program; the program's union key span is
     covered by a W = 2·kcap window of key rows GATHERED host-side (one
     row-granular XLA take of 256/1024-lane rows straight out of
     key_sorted, ~tens of µs) into a (nprog, W) array the kernel walks
     with a static program-id block map — Mosaic double-buffers these
     blocks automatically across the grid.

     HARD-WON STABILITY NOTE (exact bisect, scripts history r3): three
     window plumbings crashed on-device with a flaky INVALID_ARGUMENT on
     the SECOND run of a lax.scan executable when a different executable
     had run first: hand-rolled make_async_copy, data-dependent
     scalar-prefetch block index maps, and gathers out of a PADDED key
     copy. Stubbing the pallas_call with pure-XLA emulation still
     crashed; stripping the glue piece by piece isolated the trigger to
     CONSTRUCTING THE PADDED KEY ARRAY inside the scan body — both
     jnp.concatenate([key_sorted, full(pad)]) and
     full(n+pad).at[:n].set(key_sorted) crash, with or without any
     gather/pallas downstream, while the identical program minus that
     array runs clean (an XLA:TPU/runtime bug on this stack, not a
     Mosaic or kernel bug). Therefore: NEVER build a padded copy of the
     sorted keys inside the step — the window gather below reads
     key_sorted directly, and window starts are CLAMPED into the real
     array instead of padding past its end.
  4. The compare is completely MASK-FREE (2 VPU ops/pair): sortedness
     makes out-of-chunk lanes self-masking — keys below the chunk's
     aligned start are < every query in the chunk (counted via the
     aligned base instead of a lead mask), keys at/after the next chunk
     edge are ≥ every query in the chunk (compare false on its own).
     Scans are clamped to the window (and the window to the array), so
     no lane past the real keys is ever read — no pad value needed.
  5. Queries live one-per-SUBLANE, keys stream through LANES: chunk s of
     a program is the (64, 1) column `qin[0, :, s]`, so the host-side
     layout is one (nprog, S, 64) → (nprog, 64, S) transpose of the
     sorted queries (and the inverse for the ranks).
  6. Unpermute by one more 2-lane payload sort on the saved query index.

Capacity: a program whose union key span exceeds the W-lane window is
detected host-side (returned overflow count; in-kernel scans are clamped
to the window so they never read out of bounds; drivers regrow and
re-trace) — never silently misranked.

Contract: len(key_sorted) must be a multiple of 256 (production sorted
fields are padded to tile×group ≥ 256 lanes; `_resolve_starts` falls back
to the rank-sort path otherwise).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpusph.core.config import SimConfig

QS = 64  # queries per chunk (one per sublane of the compare)


def _qrank_kernel(
    c_off_ref, c_nblk_ref, c_base_ref,
    kwin_ref, qin_ref, out_ref,
    *, S, bl,
):
    p = pl.program_id(0)

    for s in range(S):
        g = p * S + s
        base = c_base_ref[g].astype(jnp.int32)
        nblk = c_nblk_ref[g].astype(jnp.int32)
        off_blk = c_off_ref[g].astype(jnp.int32)  # block units in-window
        q = qin_ref[0, :, s : s + 1]  # (QS, 1) consecutive sorted queries

        def blk(b, acc, q=q, off_blk=off_blk):
            i = off_blk + b
            # window = this program's gathered key row; one load per block
            kv = kwin_ref[0, pl.ds(pl.multiple_of(i * bl, bl), bl)][None, :]
            # mask-free: lanes beyond this chunk's edge hold keys >= every
            # q in the chunk -> compare false on its own
            return acc + jnp.where(kv < q, 1.0, 0.0)

        acc = jax.lax.fori_loop(
            0, nblk, blk, jnp.zeros((QS, bl), jnp.float32)
        )
        # keys below the chunk's aligned start are < every q in the chunk:
        # counted via the base instead of scanning them
        out_ref[0, :, s : s + 1] = base + jnp.sum(
            acc, axis=1, keepdims=True
        ).astype(jnp.int32)


def _clamp_sentinel(queries, cfg: SimConfig):
    """Collapse the sentinel rank cliff: invalid rows all carry key ==
    num_cells, so every query value in (max_real_key, num_cells] has the
    SAME rank (#valid keys) and only q ≥ num_cells+1 ranks past the
    sentinel tail — to exactly n, statically. Clamping queries to
    num_cells and post-correcting the ≥ num_cells+1 ones keeps every
    chunk's key span inside the REAL keys; without this, a chunk mixing
    a low query with an nc+1 guard query (prep's next_start bound) spans
    the whole real→sentinel rank gap — at sharded-engine occupancies
    (dev_capacity ≫ valid rows) that gap exceeds any sane kcap window.
    Returns (clamped queries, over-mask)."""
    nc_sentinel = jnp.int32(cfg.num_cells)
    return jnp.minimum(queries, nc_sentinel), queries > nc_sentinel


def _rank_sorted_chunks(key_sorted, qv_p, cfg: SimConfig, interpret: bool):
    """Core rank computation over a query array that is sorted WITHIN each
    QS-chunk (globally sorted is the production case; per-chunk sortedness
    is all the kernel's self-masking needs). len(qv_p) must be a multiple
    of S·QS. Returns (ranks aligned to qv_p, overflow)."""
    n = key_sorted.shape[0]
    S = cfg.pallas_qrank_chunks
    kcap = cfg.pallas_qrank_kcap
    bl = 256
    assert n % bl == 0, "qrank needs 256-lane-padded keys (see module doc)"
    per_prog = S * QS
    assert qv_p.shape[0] % per_prog == 0
    nprog = qv_p.shape[0] // per_prog
    nchunk = nprog * S

    # coarse chunk rank BOUNDS, gather-free: one fused outer-compare of
    # each chunk's FIRST and LAST query against the bl-subsampled keys.
    # ss[j] is the LAST key of key block j, so cnt = #{ss < q} bounds
    # rank(q) in [bl·cnt, bl·(cnt+1)): keys before block cnt are < q,
    # keys from block cnt+1 on are ≥ ss[cnt] ≥ q. The kernel stays EXACT
    # on these bounds — lanes below the aligned base are counted via the
    # base, lanes at/after the end bound self-mask (kv ≥ q is false).
    # Using the chunk's own first/last (not the next chunk's edge) keeps
    # the bounds valid for ANY per-chunk-sorted layout.
    first_q = qv_p[:: QS]
    last_q = qv_p[QS - 1 :: QS]
    ss = key_sorted[bl - 1 :: bl]  # last key of each block
    cnt_f = jnp.sum(ss[None, :] < first_q[:, None], axis=1, dtype=jnp.int32)
    cnt_l = jnp.sum(ss[None, :] < last_q[:, None], axis=1, dtype=jnp.int32)
    c_aligned = cnt_f * bl
    c_end = (cnt_l + 1) * bl  # may exceed n by one block; clamped below

    # per-program key window: W consecutive lanes of key_sorted itself
    # (NO padded copy — see the stability note in the module docstring),
    # gathered at R-lane row granularity with the start clamped so the
    # window never leaves the array. R must be a multiple of bl so
    # window starts stay block-aligned. The window covers the MIN..MAX of
    # the program's chunk bounds (== first..last when globally sorted).
    R = 1024 if n % 1024 == 0 else bl
    nrows = n // R
    wrows = min(2 * kcap // R, nrows)
    W = wrows * R  # static window width (== whole array when n ≤ 2·kcap)
    p_base = jnp.min(c_aligned.reshape(nprog, S), axis=1)
    p_row = jnp.minimum(p_base // R, nrows - wrows)  # (nprog,)
    win_start = p_row * R
    win_end = win_start + W
    # c_end is capped at n (the real array) before the overflow test: the
    # lanes past n the "+1 block" could ask for don't exist, and a window
    # ending at n has, by construction, every key ≥ its start available
    c_end = jnp.minimum(c_end, n)
    overflow = jnp.sum(
        jnp.maximum(jnp.max(c_end.reshape(nprog, S), axis=1) - win_end, 0)
    ).astype(jnp.int32)
    # an overflowing program must never scan past its window: clamp each
    # chunk's scan to the window end (ranks go wrong there, but the
    # overflow count above makes the driver regrow and re-trace). A chunk
    # can also start BELOW the window when the program's chunks are not
    # globally sorted (runs path): clamp its base up (same regrow story).
    ws = jnp.repeat(win_start, S)
    we = jnp.repeat(win_end, S)
    overflow = overflow + jnp.sum(
        jnp.maximum(ws - c_aligned, 0)
    ).astype(jnp.int32)
    lo = jnp.clip(c_aligned, ws, we)
    c_nblk = (jnp.clip(c_end, ws, we) - lo) // bl
    c_off = (lo - ws) // bl  # in-window block offset

    # queries one-per-sublane: (nprog, S, QS) -> (nprog, QS, S)
    qin = qv_p.reshape(nprog, S, QS).transpose(0, 2, 1)

    # window gather: one row-granular take straight out of key_sorted.
    # Flattened to (1, nprog·W): Mosaic requires the block's sublane dim
    # to divide 8 or equal the array's — (1, W) blocks of a (1, ·) array
    # qualify, (1, W) blocks of an (nprog, W) array do not.
    kb = key_sorted.reshape(nrows, R)
    idx = p_row[:, None] + jnp.arange(wrows, dtype=jnp.int32)[None, :]
    kwin = kb[idx].reshape(1, nprog * W)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(nprog,),
        in_specs=[
            pl.BlockSpec((1, W), lambda i, *_: (0, i)),
            pl.BlockSpec((1, QS, S), lambda i, *_: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, QS, S), lambda i, *_: (i, 0, 0)),
    )
    out = pl.pallas_call(
        functools.partial(_qrank_kernel, S=S, bl=bl),
        out_shape=jax.ShapeDtypeStruct((nprog, QS, S), jnp.int32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(c_off, c_nblk, c_aligned, kwin, qin)
    return out.transpose(0, 2, 1).reshape(nprog * per_prog), overflow


def rank_queries_pallas(
    key_sorted: jnp.ndarray, queries: jnp.ndarray, cfg: SimConfig, *,
    interpret: bool = False,
):
    """ranks[i] = #{keys < queries[i]} as int32[Q], from SORTED keys and an
    arbitrary flat int32 query array. Returns (ranks, overflow): overflow
    > 0 means some program's key span exceeded its 2·pallas_qrank_kcap
    window (drivers regrow and re-trace). len(key_sorted) % 256 == 0."""
    n = key_sorted.shape[0]
    nq = queries.shape[0]
    S = cfg.pallas_qrank_chunks

    queries, q_over = _clamp_sentinel(queries, cfg)

    # 1. sort queries by value, remember the origin index
    qv, qi = jax.lax.sort(
        (queries, jnp.arange(nq, dtype=jnp.int32)), num_keys=1,
        is_stable=True,
    )

    # pad the sorted array to a whole number of programs with copies of the
    # LAST (largest) value so padding never widens a key span
    per_prog = S * QS
    nprog = -(-nq // per_prog)
    npad = nprog * per_prog - nq
    qv_p = jnp.concatenate([qv, jnp.broadcast_to(qv[-1:], (npad,))])

    ranks_flat, overflow = _rank_sorted_chunks(
        key_sorted, qv_p, cfg, interpret
    )

    # undo the value sort, then restore the clamped ≥ num_cells+1 guard
    # queries (rank past the sentinel tail = n)
    ranks_sorted = ranks_flat[:nq]
    _, ranks = jax.lax.sort((qi, ranks_sorted), num_keys=1, is_stable=True)
    ranks = jnp.where(q_over, jnp.int32(n), ranks)
    return ranks, overflow
