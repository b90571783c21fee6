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
     covered by TWO consecutive kcap-sized blocks of the padded key
     array, selected per program through the scalar-prefetch index map —
     Mosaic double-buffers these automatically across the grid (the
     hand-rolled make_async_copy variant of this kernel raced under
     lax.scan chains — INVALID_ARGUMENT on reruns — and is gone).
  4. The compare is completely MASK-FREE (2 VPU ops/pair): the key buffer
     in HBM is padded with KEY_BIG ≥ every query, and sortedness makes
     out-of-chunk lanes self-masking — keys below the chunk's aligned
     start are < every query in the chunk (counted via the aligned base
     instead of a lead mask), keys at/after the next chunk edge are
     ≥ every query in the chunk (compare false on its own).
  5. Queries live one-per-SUBLANE, keys stream through LANES: chunk s of
     a program is the (64, 1) column `qin[0, :, s]`, so the host-side
     layout is one (nprog, S, 64) → (nprog, 64, S) transpose of the
     sorted queries (and the inverse for the ranks).
  6. Unpermute by one more 2-lane payload sort on the saved query index.

Capacity: a program whose union key span exceeds the 2·kcap block window
is detected host-side (returned overflow count; in-kernel scans are
clamped to the window so they never read out of bounds; drivers regrow
and re-trace) — never silently misranked.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpusph.core.config import SimConfig

KEY_BIG = jnp.int32(2**30)  # padding key: larger than any query
QS = 64  # queries per chunk (one per sublane of the compare)


def _qrank_kernel(
    c_off_ref, c_nblk_ref, c_base_ref, p_blk_ref,
    k0_ref, k1_ref, qin_ref, out_ref,
    *, S, bl, kcap,
):
    p = pl.program_id(0)
    half = kcap // bl  # blocks per key window half

    for s in range(S):
        g = p * S + s
        base = c_base_ref[g].astype(jnp.int32)
        nblk = c_nblk_ref[g].astype(jnp.int32)
        off_blk = c_off_ref[g].astype(jnp.int32)  # block units in-window
        q = qin_ref[0, :, s : s + 1]  # (QS, 1) consecutive sorted queries

        def blk(b, acc, q=q, off_blk=off_blk):
            i = off_blk + b
            # window = two consecutive kcap blocks; load the candidate
            # position in each half and lane-select (branchless — Mosaic
            # conds per block would cost more than the ~40 ns extra load)
            i0 = jnp.minimum(i, half - 1)
            i1 = jnp.clip(i - half, 0, half - 1)
            kv0 = k0_ref[0, pl.ds(pl.multiple_of(i0 * bl, bl), bl)]
            kv1 = k1_ref[0, pl.ds(pl.multiple_of(i1 * bl, bl), bl)]
            kv = jnp.where(i < half, kv0, kv1)[None, :]  # (1, bl)
            # mask-free: lanes beyond this chunk's edge hold keys (or
            # KEY_BIG padding) >= every q in the chunk -> compare false
            return acc + jnp.where(kv < q, 1.0, 0.0)

        acc = jax.lax.fori_loop(
            0, nblk, blk, jnp.zeros((QS, bl), jnp.float32)
        )
        # keys below the chunk's aligned start are < every q in the chunk:
        # counted via the base instead of scanning them
        out_ref[0, :, s : s + 1] = base + jnp.sum(
            acc, axis=1, keepdims=True
        ).astype(jnp.int32)


def rank_queries_pallas(
    key_sorted: jnp.ndarray, queries: jnp.ndarray, cfg: SimConfig, *,
    interpret: bool = False,
):
    """ranks[i] = #{keys < queries[i]} as int32[Q], from SORTED keys and an
    arbitrary flat int32 query array. Returns (ranks, overflow): overflow
    > 0 means some program's key span exceeded its 2·pallas_qrank_kcap
    block window (drivers regrow and re-trace)."""
    n = key_sorted.shape[0]
    nq = queries.shape[0]
    S = cfg.pallas_qrank_chunks
    kcap = cfg.pallas_qrank_kcap
    bl = 256
    assert kcap % bl == 0

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

    # 2. coarse chunk-edge rank BOUNDS, gather-free: one fused
    # outer-compare of the edge queries against the bl-subsampled keys.
    # ss[j] is the LAST key of key block j, so cnt = #{ss < q} bounds
    # rank(q) in [bl·cnt, bl·(cnt+1)): keys before block cnt are < q,
    # keys from block cnt+1 on are ≥ ss[cnt] ≥ q. The kernel stays EXACT
    # on these bounds — lanes below the aligned base are counted via the
    # base, lanes at/after the end bound self-mask (kv ≥ q is false).
    nchunk = nprog * S
    edge_q = jnp.concatenate([qv_p[:: QS], qv_p[-1:]])  # (nchunk + 1,)
    m = n // bl
    ss = key_sorted[bl - 1 : m * bl : bl]
    cnt = jnp.sum(
        ss[None, :] < edge_q[:, None], axis=1, dtype=jnp.int32
    )
    c_aligned = cnt[:-1] * bl
    c_end = (cnt[1:] + 1) * bl  # scan may run into the KEY_BIG padding

    # per-program key window: two consecutive kcap blocks of the padded
    # key array, starting at the block containing the first chunk's base
    p_blk = c_aligned[:: S] // kcap  # (nprog,)
    win_start = p_blk * kcap
    win_end = win_start + 2 * kcap
    overflow = jnp.sum(
        jnp.maximum(c_end[S - 1 :: S] - win_end, 0)
    ).astype(jnp.int32)
    # an overflowing program must never scan past its window: clamp each
    # chunk's scan to the window end (ranks go wrong there, but the
    # overflow count above makes the driver regrow and re-trace)
    we = jnp.repeat(win_end, S)
    lo = jnp.minimum(c_aligned, we)
    c_nblk = (jnp.minimum(c_end, we) - lo) // bl
    c_off = (lo - jnp.repeat(win_start, S)) // bl  # in-window block offset

    # 3. queries one-per-sublane: (nprog, S, QS) -> (nprog, QS, S)
    qin = qv_p.reshape(nprog, S, QS).transpose(0, 2, 1)

    # pad keys so every 2·kcap window stays in bounds; KEY_BIG ≥ every
    # query, so padded lanes never count
    pad = (-(n) % kcap) + 2 * kcap
    khbm = jnp.concatenate(
        [key_sorted, jnp.full((pad,), KEY_BIG, jnp.int32)]
    )[None, :]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(nprog,),
        in_specs=[
            pl.BlockSpec(
                (1, kcap), lambda i, co, cn, cb, pb: (0, pb[i])
            ),
            pl.BlockSpec(
                (1, kcap), lambda i, co, cn, cb, pb: (0, pb[i] + 1)
            ),
            pl.BlockSpec((1, QS, S), lambda i, *_: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, QS, S), lambda i, *_: (i, 0, 0)),
    )
    out = pl.pallas_call(
        functools.partial(_qrank_kernel, S=S, bl=bl, kcap=kcap),
        out_shape=jax.ShapeDtypeStruct((nprog, QS, S), jnp.int32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(c_off, c_nblk, c_aligned, p_blk, khbm, khbm, qin)

    # 4. undo the sublane layout and the value sort
    ranks_sorted = out.transpose(0, 2, 1).reshape(nprog * per_prog)[:nq]
    _, ranks = jax.lax.sort((qi, ranks_sorted), num_keys=1, is_stable=True)
    return ranks, overflow
