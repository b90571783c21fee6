"""Measured z-slab decomposition census over the REAL dam-break trajectory.

The scaling model (scripts/scaling_model.py, SCALING.md) needs three
quantities that are pure physics — identical on any device count, so they
can be MEASURED on the one real chip by running the tuned single-chip
trajectory and cutting the box into D virtual z-slabs at every checkpoint:

  * load imbalance  lambda(step, D) = max_slab_count / (N / D)
    (the slowest device sets the step time — kernels scale with local rows)
  * halo-band occupancy: rows within 2h of each interior cut, per side
    (the per-boundary ppermute halo payload, dist/sharded.py one-round
    2h ghost layer)
  * next-step migration: rows that will cross a cut in the next dt
    (z on one side, z + vz*dt on the other — exact from the snapshot)

Output: scaling/census_n{N}.json — per-checkpoint rows for D in {2,4,8}.
Run on the real TPU (falls back to CPU functionally). The chunked chain is
the production fields-native loop (engine/step.py step_pallas_fields on
TPU), so the trajectory census'd is the exact benchmarked physics.

Usage: python scripts/slab_census.py [N] [steps] [chunk]
"""

from __future__ import annotations

import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(sys.argv[1]) if len(sys.argv) > 1 else 262_144
STEPS = int(sys.argv[2]) if len(sys.argv) > 2 else 100
CHUNK = int(sys.argv[3]) if len(sys.argv) > 3 else 10
DS = (2, 4, 8)

import jax

if os.environ.get("TPUSPH_FORCE_CPU") == "1":
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

import jax.numpy as jnp
import numpy as np

from tpusph.core.config import compiler_opts, default_config, tuned_overrides
from tpusph.core.init import init_state, lattice_capacity
from tpusph.engine.step import (
    BACKENDS,
    fields_from_state,
    step_pallas_fields,
)


def census(
    z: np.ndarray, vz: np.ndarray, cfg, bal_planes: dict | None = None
) -> dict:
    """Per-D slab occupancy / halo-band / next-step-crosser counts from one
    position snapshot (alive rows only). If `bal_planes` maps D → the
    balance-aware cell-plane partition (fixed from the step-0 snapshot —
    exactly what DistSimulator.setup ships by default), a parallel "bal"
    census is taken in CELL space, mirroring the engine's plane-based
    ownership (sharded._migration_predicates) and 2-cell halo bands
    (sharded._band_thresholds)."""
    out = {}
    band = 2.0 * cfg.h
    C = cfg.num_cells_per_dim
    zc = np.clip((z / np.float32(cfg.h)).astype(np.int32), 0, C - 1)
    z2 = z + vz * cfg.dt
    zc2 = np.clip((z2 / np.float32(cfg.h)).astype(np.int32), 0, C - 1)
    for d in DS:
        edges = cfg.box_dim * np.arange(1, d) / d
        slab = np.minimum((z / (cfg.box_dim / d)).astype(np.int64), d - 1)
        counts = np.bincount(slab, minlength=d)
        halo_up = halo_dn = mig = 0
        for e in edges:
            # halo sends: sender-side rows within 2h of the cut, per side
            halo_up = max(halo_up, int(np.sum((z >= e - band) & (z < e))))
            halo_dn = max(halo_dn, int(np.sum((z >= e) & (z < e + band))))
            # exact next-step one-hop crossers at this snapshot
            mig = max(
                mig,
                int(np.sum((z < e) & (z2 >= e))),
                int(np.sum((z >= e) & (z2 < e))),
            )
        out[str(d)] = {
            "max_slab": int(counts.max()),
            "min_slab": int(counts.min()),
            "imbalance": round(float(counts.max()) / (len(z) / d), 4),
            "max_halo_send": int(max(halo_up, halo_dn)),
            "max_migration": int(mig),
        }
        if bal_planes is not None:
            pl = bal_planes[d]
            interior = np.asarray(pl[1:-1], np.int64)
            counts_b = np.bincount(
                np.searchsorted(interior, zc, side="right"), minlength=d
            )
            bh = bm = 0
            for e in interior:
                # 2-cell send bands around each interior plane
                # (sharded._band_thresholds: dn band zc < pl+2, up band
                # zc >= pl-2 on the neighbors' sides of the cut)
                bh = max(
                    bh,
                    int(np.sum((zc >= e - 2) & (zc < e))),
                    int(np.sum((zc >= e) & (zc < e + 2))),
                )
                bm = max(
                    bm,
                    int(np.sum((zc < e) & (zc2 >= e))),
                    int(np.sum((zc >= e) & (zc2 < e))),
                )
            out[str(d)]["bal"] = {
                "max_slab": int(counts_b.max()),
                "imbalance": round(float(counts_b.max()) / (len(z) / d), 4),
                "max_halo_send": int(bh),
                "max_migration": int(bm),
            }
    return out


def main() -> None:
    cfg = default_config(N, **tuned_overrides(N))  # the benchmarked preset
    on_tpu = jax.default_backend() not in ("cpu",)
    backend = "pallas_sorted" if on_tpu else "cell_list"
    random_init = N > lattice_capacity(cfg)
    state0 = init_state(cfg, random_init=random_init)

    if backend == "pallas_sorted":

        def make_run(cfg):
            @partial(jax.jit, compiler_options=compiler_opts(cfg))
            def run_chunk(fs):
                def body(f, _):
                    (f2, _, _, _), aux = step_pallas_fields(f, cfg)
                    return f2, aux.window_overflow

                f2, ovf = jax.lax.scan(body, fs, None, length=CHUNK)
                return f2, jnp.sum(ovf)

            return run_chunk

        carry = fields_from_state(state0)

        def snapshot(c):
            return (
                np.asarray(jax.device_get(c.z)),
                np.asarray(jax.device_get(c.vz)),
                np.asarray(jax.device_get(c.valid)),
            )

    else:
        step = BACKENDS[backend]

        def make_run(cfg):
            @partial(jax.jit, compiler_options=compiler_opts(cfg))
            def run_chunk(s):
                def body(st, _):
                    s2, aux = step(st, cfg)
                    return s2, aux.window_overflow

                s2, ovf = jax.lax.scan(body, s, None, length=CHUNK)
                return s2, jnp.sum(ovf)

            return run_chunk

        carry = state0

        def snapshot(c):
            return (
                np.asarray(jax.device_get(c.position[:, 2])),
                np.asarray(jax.device_get(c.velocity[:, 2])),
                np.asarray(jax.device_get(c.valid)),
            )

    run_chunk = make_run(cfg)
    rows = []
    bal_planes = None
    t0 = time.perf_counter()
    for done in range(0, STEPS + 1, CHUNK):
        z, vz, valid = snapshot(carry)
        alive = valid.astype(bool)
        if bal_planes is None:
            # balance-aware partition from the INITIAL snapshot, held fixed
            # over the trajectory — DistSimulator.setup's default semantics
            from tpusph.dist.sharded import balanced_slab_planes

            bal_planes = {
                d: balanced_slab_planes(z[alive], cfg, d) for d in DS
            }
        row = {"step": done, "n_alive": int(alive.sum())}
        row.update(census(z[alive], vz[alive], cfg, bal_planes))
        rows.append(row)
        print(
            f"step {done:4d}: "
            + "  ".join(
                f"D={d} imb={row[str(d)]['imbalance']:.3f}"
                f"/bal={row[str(d)]['bal']['imbalance']:.3f} "
                f"halo={row[str(d)]['max_halo_send']} "
                f"mig={row[str(d)]['max_migration']}"
                for d in DS
            ),
            flush=True,
        )
        if done < STEPS:
            # pile-up transients can overflow fixed capacities mid-trajectory
            # (the bench pays this as an auto-grow recompile too): rewind to
            # the pre-chunk snapshot, double capacities, re-trace (physics
            # unchanged — the grown run replays the same chunk exactly)
            for _ in range(6):
                nxt, ovf = run_chunk(carry)
                if int(jax.device_get(ovf)) == 0:
                    carry = nxt
                    break
                import dataclasses

                cfg = dataclasses.replace(
                    cfg,
                    pallas_col_capacity=cfg.pallas_col_capacity * 2,
                    pallas_sub_blocks=cfg.pallas_sub_blocks * 2,
                    pallas_qrank_kcap=cfg.pallas_qrank_kcap * 2,
                    tile_cand_capacity=cfg.tile_cand_capacity * 2,
                )
                print(
                    f"capacity overflow at step {done}; growing to "
                    f"col={cfg.pallas_col_capacity} "
                    f"sub_blocks={cfg.pallas_sub_blocks}",
                    flush=True,
                )
                run_chunk = make_run(cfg)
            else:
                raise RuntimeError("capacity growth did not converge")
    dt = time.perf_counter() - t0

    out = {
        "n": N,
        "steps": STEPS,
        "chunk": CHUNK,
        "backend": backend,
        "init": "random" if random_init else "grid",
        "band_2h": 2.0 * cfg.h,
        "bal_planes": {str(d): list(p) for d, p in bal_planes.items()},
        "rows": rows,
        "wall_s": round(dt, 1),
    }
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "scaling",
        f"census_n{N}.json",
    )
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path} ({dt:.1f}s)", flush=True)


if __name__ == "__main__":
    main()
