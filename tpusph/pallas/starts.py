"""Pallas rank kernel for the cell-list starts table.

**Status: built, exact, and a MEASURED NEGATIVE on this stack — kept as the
documented alternative (cfg.pallas_starts), default off.** The premise was
the ~7 ns/particle-index scatter cost of the XLA bincount histogram
measured on UNSORTED (grid-order) keys (≈7 ms at 1M). But the production
chained loop keeps state cell-sorted across steps, so the scatter indices
arrive nearly sorted and the histogram is data-dependently fast: measured
(scripts/starts_bench.py, trajectory step 60) 0.13 ms at 262k and 0.21 ms
at 1M. This kernel measures 2.4–3.1 ms at 262k and 3.3–6.8 ms at 1M —
per-chunk grid-program overhead (~2.4 µs × 500–1000 programs) dominates
its ~1 ms of compare work. The scatter stays.

The kernel computes the same table with NO scatter, exploiting that the
keys are already sorted:

  starts[k] = #{i : key_sorted[i] < k}   (= rank of k in the sorted keys)

Design (the TPU-native formulation of `kernelBuildGrid`'s per-cell heads,
/root/reference/src/simulator.cu:133-147, at scales the reference never
reached):

  * The table [0, num_cells+2) is split into CHUNKS of `chunk` cells, one
    grid program per chunk. A chunk's table entries depend only on the keys
    INSIDE its cell range plus the rank of its first cell: keys below are
    < every query (counted by the base rank), keys above are ≥ every query.
  * Chunk-edge base ranks come from one small jnp.searchsorted
    (nprog+1 ≈ 500 queries — microseconds, vs the scatter's N indices).
  * Each program DMAs its key slice (128-aligned, fixed capacity `kcap`,
    conditional parts so sparse chunks move little data) and outer-compares
    queries × keys on the VPU: queries live one-per-SUBLANE, keys stream
    through LANES — the orientation that makes the compare a dense
    (QS, bl) elementwise op with broadcasting.
  * Lane/sublane orientation of the OUTPUT (the round-2 blocker): query
    values are assigned STRIDED — table index k = p·chunk + s·nsub + j for
    sublane s, subtile j — so each subtile's (QS, 1) rank column writes
    straight into the (QS, nsub) output block and the flattened output IS
    the table. No transpose anywhere.
  * Work is Σ_chunks chunk × K_chunk = chunk × N compare-adds total —
    ~1 M-cycle-scale at 1M particles, vs 7 ms of serialized scatter.

Capacity: keys per chunk beyond `kcap` are detected host-side (returned
overflow count; drivers regrow) — never silently miscounted.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpusph.core.config import SimConfig

KEY_BIG = jnp.int32(2**30)  # padding key: larger than any query
QS = 64  # queries per subtile (sublane count of the compare)


def _starts_kernel(
    lead_ref, cnt_ref, base_ref, aligned_ref, khbm, out_ref, kbuf, sem,
    *, chunk, nsub, kcap, bl,
):
    p = pl.program_id(0)
    nprog = pl.num_programs(0)
    part = kcap // 4
    lead = lead_ref[p].astype(jnp.int32)
    cnt = cnt_ref[p].astype(jnp.int32)
    base = base_ref[p].astype(jnp.int32)

    def get_dma(prog, i):
        return pltpu.make_async_copy(
            khbm.at[:, pl.ds(
                pl.multiple_of(aligned_ref[prog] + i * part, 128), part
            )],
            kbuf.at[prog % 2, :, pl.ds(i * part, part)],
            sem.at[prog % 2, i],
        )

    def start_all(prog):
        need = lead_ref[prog].astype(jnp.int32) + cnt_ref[prog].astype(
            jnp.int32
        )
        for i in range(4):
            @pl.when((i == 0) | (need > i * part))
            def _():
                get_dma(prog, i).start()

    @pl.when(p == 0)
    def _():
        start_all(0)

    @pl.when(p + 1 < nprog)
    def _():
        start_all(p + 1)

    need = lead + cnt
    for i in range(4):
        @pl.when((i == 0) | (need > i * part))
        def _():
            get_dma(p, i).wait()

    slot = p % 2
    c0 = p * chunk
    sub_iota = jax.lax.broadcasted_iota(jnp.int32, (QS, 1), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, bl), 1)
    # overflowing chunks (detected host-side) must not scan past the buffer
    need = jnp.minimum(need, kcap)
    nblk = pl.cdiv(need, bl)

    for j in range(nsub):
        # strided query assignment: table index k = c0 + s·nsub + j
        q = c0 + j + nsub * sub_iota  # (QS, 1)

        def blk(b, acc, q=q):
            kv = kbuf[slot, 0, pl.ds(b * bl, bl)][None, :]  # (1, bl)
            li = b * bl + lane
            ok = (li >= lead) & (li < need) & (kv < q)
            return acc + jnp.where(ok, 1.0, 0.0)

        acc = jax.lax.fori_loop(
            0, nblk, blk, jnp.zeros((QS, bl), jnp.float32)
        )
        out_ref[0, :, j : j + 1] = base + jnp.sum(
            acc, axis=1, keepdims=True
        ).astype(jnp.int32)


def starts_table_pallas(
    key_sorted: jnp.ndarray, cfg: SimConfig, *, interpret: bool = False
):
    """starts[k] = #keys < k as int32[num_cells + 2], from SORTED keys.
    Returns (starts, overflow): overflow > 0 means some chunk's key count
    exceeded pallas_starts_kcap (drivers regrow and re-trace)."""
    n = key_sorted.shape[0]
    chunk = cfg.pallas_starts_chunk
    kcap = cfg.pallas_starts_kcap
    bl = 256
    nsub = chunk // QS
    nc2 = cfg.num_cells + 2
    nprog = -(-nc2 // chunk)

    edges = jnp.minimum(
        jnp.arange(nprog + 1, dtype=jnp.int32) * chunk, jnp.int32(nc2)
    )
    edge_rank = jnp.searchsorted(key_sorted, edges, side="left").astype(
        jnp.int32
    )
    base = edge_rank[:-1]
    cnt = edge_rank[1:] - base
    aligned = (base // 128) * 128
    lead = base - aligned
    overflow = jnp.sum(jnp.maximum(lead + cnt - kcap, 0)).astype(jnp.int32)

    # pad so every (aligned + kcap) slice stays in bounds; padding keys are
    # KEY_BIG (≥ every query) and sit beyond the lead/cnt mask anyway
    khbm = jnp.concatenate(
        [key_sorted, jnp.full((kcap,), KEY_BIG, jnp.int32)]
    )[None, :]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(nprog,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec((1, QS, nsub), lambda i, *_: (i, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, 1, kcap), jnp.int32),
            pltpu.SemaphoreType.DMA((2, 4)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(
            _starts_kernel, chunk=chunk, nsub=nsub, kcap=kcap, bl=bl
        ),
        out_shape=jax.ShapeDtypeStruct((nprog, QS, nsub), jnp.int32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(lead, cnt, base, aligned, khbm)
    # flat index k = p·chunk + s·nsub + j — exactly C-order of (p, s, j)
    return out.reshape(nprog * chunk)[:nc2], overflow
