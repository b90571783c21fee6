"""Isolate supertile_columns' true in-context cost and race alternative
implementations of its starts-table lookups.

fields_profile measured prep at 0.21 ms isolated but glue_probe showed
2.48 ms in context at 262k (13+ ms at 1M): the isolated probe's fixed
`starts` let XLA hoist the starts-dependent majority. Here every variant
perturbs BOTH key_s and starts, so nothing hoists:

  * prep       — production supertile_columns
  * gathers    — just the 4 batched starts[...] gathers it performs
  * gather1    — same queries fused into ONE take
  * ranksort   — two-sort rank computation (rank_left(key_sorted, q) ==
                 starts[q] for q in [0, nc+1]) — no big-table gather at all
  * sorted1    — one 2-lane payload sort of N+Q (cost floor for ranksort)

Usage: python scripts/prep_bench.py [N] [steps...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

import jax.numpy as jnp

from scripts.profile_step import fence, slope_bench  # noqa: E402
from tpusph.core.config import default_config
from tpusph.core.init import init_state
from tpusph.engine.step import fields_from_state, step_pallas_fields
from tpusph.neighbors.cell_list import build_sorted_fields_1d
from tpusph.pallas.fused import (
    _geom_ranges,
    _stencil,
    _sup_stencil,
    _tile_key_span,
    effective_geometry,
    supertile_columns,
)


def _queries(key_s, valid_s, cfg):
    """All starts-table indices the production prep gathers (slab3/col9
    geometry: per-sub lo/hi + fast-flag prev/next, per-sup lo/hi)."""
    nc = cfg.num_cells
    pt, g = effective_geometry(key_s.shape[0], cfg)
    offsets, lo_pad, hi_pad = _stencil(cfg)
    offs = jnp.asarray(offsets, jnp.int32)
    period = nc // 1  # placeholder; replaced below per stencil
    c = cfg.num_cells_per_dim
    period = c * c if cfg.pallas_stencil == "slab3" else c

    kmin, kmax = _tile_key_span(key_s, valid_s, cfg, pt)
    skmin, skmax = _tile_key_span(key_s, valid_s, cfg, pt * g)
    qs = [
        jnp.clip(kmin[:, None] + offs[None, :] - lo_pad, 0, nc),
        jnp.clip(kmax[:, None] + offs[None, :] + hi_pad, 0, nc),
        jnp.clip(skmin[:, None] + offs[None, :] - lo_pad, 0, nc),
        jnp.clip(skmax[:, None] + offs[None, :] + hi_pad, 0, nc),
        jnp.clip(kmax[:, None] + offs[None, :] - period + hi_pad, 0, nc + 1),
        jnp.clip(kmin[:, None] + offs[None, :] + period - lo_pad, 0, nc + 1),
    ]
    return [q.astype(jnp.int32) for q in qs]


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 262_144
    probe_steps = [int(s) for s in sys.argv[2:]] or [60]
    from bench import config_overrides

    cfg = default_config(n, **config_overrides(n, os.environ))
    import dataclasses
    if os.environ.get("TPUSPH_QRANK_KCAP"):
        cfg = dataclasses.replace(
            cfg, pallas_qrank_kcap=int(os.environ["TPUSPH_QRANK_KCAP"])
        )
    if os.environ.get("TPUSPH_QRANK_CHUNKS"):
        cfg = dataclasses.replace(
            cfg, pallas_qrank_chunks=int(os.environ["TPUSPH_QRANK_CHUNKS"])
        )
    fs = fields_from_state(init_state(cfg))

    def advance(fs, k):
        @jax.jit
        def go(fs):
            def body(f, _):
                (f2, _, _, _), _aux = step_pallas_fields(f, cfg)
                return f2, None
            return jax.lax.scan(body, fs, None, length=k)[0]
        return go(fs)

    prev = 0
    for target in probe_steps:
        if target > prev:
            fs = advance(fs, target - prev)
            fence(fs)
            prev = target
        sf = jax.jit(
            lambda f: build_sorted_fields_1d(
                f.x, f.y, f.z, f.vx, f.vy, f.vz, f.valid, cfg
            )
        )(fs)
        key_s, valid_s, starts = sf.key_sorted, sf.valid_sorted, sf.starts
        fence(starts)
        print(f"--- step {target} (N={n}) "
              f"stencil={cfg.pallas_stencil} ---", flush=True)

        # every variant: perturb key_s AND starts with runtime zeros
        def inj(a, z):
            z32 = z.astype(jnp.int32)
            return (a[0] + z32, a[1], a[2] + z32)

        sel = os.environ.get("TPUSPH_PREP_VARIANTS", "").split(",")
        want = lambda name: not sel or not sel[0] or name in sel

        t = {}
        if want("prep"):
            t["prep"] = slope_bench(
                lambda k, v, s: supertile_columns(k, v, s, cfg),
                inj, key_s, valid_s, starts,
            )

        if want("gathers"):
            t["gathers"] = slope_bench(
                lambda k, v, s: [s[jnp.stack([a, b])] for a, b in zip(
                    _queries(k, v, cfg)[::2], _queries(k, v, cfg)[1::2])],
                inj, key_s, valid_s, starts,
            )

        def gather1(k, v, s):
            qs = _queries(k, v, cfg)
            flat = jnp.concatenate([q.reshape(-1) for q in qs])
            return s[flat]

        if want("gather1"):
            t["gather1"] = slope_bench(gather1, inj, key_s, valid_s, starts)

        def ranksort(k, v, s):
            # rank_left(key_sorted, q) == starts[q] without touching starts:
            # tag queries BELOW equal keys (2q vs 2k+1); after one 2-lane
            # payload sort the rank of a query is its position minus its
            # rank among queries, recovered by a second payload sort on the
            # original query index. (s enters only via the zero injection.)
            qs = _queries(k, v, cfg)
            flat = jnp.concatenate([q.reshape(-1) for q in qs]) + (s[0] * 0)
            nq = flat.shape[0]
            vals = jnp.concatenate([k * 2 + 1, flat * 2])
            idx = jnp.concatenate([
                jnp.full((k.shape[0],), nq, jnp.int32),
                jnp.arange(nq, dtype=jnp.int32),
            ])
            sv, si = jax.lax.sort((vals, idx), num_keys=1, is_stable=True)
            isq = (sv & 1) == 0
            pos = jnp.arange(sv.shape[0], dtype=jnp.int32)
            qrank = jnp.cumsum(isq.astype(jnp.int32)) - 1
            rank = pos - qrank  # rank among keys, valid where isq
            # unpermute: sort (si, rank) by si; queries come first (si<nq)
            _, r2 = jax.lax.sort(
                (jnp.where(isq, si, jnp.int32(2 ** 30)), rank),
                num_keys=1, is_stable=True,
            )
            return r2[:nq]

        if want("ranksort"):
            t["ranksort"] = slope_bench(
                ranksort, inj, key_s, valid_s, starts)

        def sorted1(k, v, s):
            qs = _queries(k, v, cfg)
            flat = jnp.concatenate([q.reshape(-1) for q in qs]) + (s[0] * 0)
            vals = jnp.concatenate([k * 2 + 1, flat * 2])
            idx = jnp.concatenate([
                jnp.zeros((k.shape[0],), jnp.int32),
                jnp.arange(flat.shape[0], dtype=jnp.int32),
            ])
            return jax.lax.sort((vals, idx), num_keys=1, is_stable=True)

        if want("sorted1"):
            t["sorted1"] = slope_bench(sorted1, inj, key_s, valid_s, starts)

        def qrank(k, v, s):
            # Pallas query-rank kernel: sort only the Q queries, rank the
            # sorted chunks against the keys with a mask-free chunked
            # outer-compare (pallas/qrank.py)
            from tpusph.pallas.qrank import rank_queries_pallas
            qs = _queries(k, v, cfg)
            flat = jnp.concatenate([q.reshape(-1) for q in qs]) + (s[0] * 0)
            ranks, ov = rank_queries_pallas(k, flat, cfg)
            return ranks, ov

        if want("qrank"):
            t["qrank"] = slope_bench(qrank, inj, key_s, valid_s, starts)
            _, ov = jax.jit(qrank)(key_s, valid_s, starts)
            print(f"  qrank overflow={int(ov)} "
                  f"(kcap={cfg.pallas_qrank_kcap} chunks/prog="
                  f"{cfg.pallas_qrank_chunks})", flush=True)

        def qsort_only(k, v, s):
            # floor: the two Q-only payload sorts of the qrank path
            qs = _queries(k, v, cfg)
            flat = jnp.concatenate([q.reshape(-1) for q in qs]) + (s[0] * 0)
            qv, qi = jax.lax.sort(
                (flat, jnp.arange(flat.shape[0], dtype=jnp.int32)),
                num_keys=1, is_stable=True,
            )
            return jax.lax.sort((qi, qv), num_keys=1, is_stable=True)

        if want("qsort"):
            t["qsort"] = slope_bench(
                qsort_only, inj, key_s, valid_s, starts)

        nq = sum(q.size for q in _queries(key_s, valid_s, cfg))
        parts = "  ".join(f"{k_}={v*1e3:7.3f}" for k_, v in t.items())
        print(f"{parts} ms  (queries={nq})", flush=True)


if __name__ == "__main__":
    main()
