"""Multi-chip scaling projection from single-chip measurements (SCALING.md).

Real multi-chip hardware is not reachable from this host (one v5e chip via
the axon tunnel), so this model projects the sharded engine's D-device
step time from quantities that ARE measurable here, each with provenance:

  t_step(N, D) = t_tier(N) * lambda(N, D) / D        per-device local work
               + tax(n_dev)                          halo/migration machinery
               + t_ici(halo_cap, mig_cap)            ppermute wire time

  * t_tier(N): the official single-chip 100-step bench (BENCH artifacts /
    BASELINE.md, parity-gated). Kernels, sorts and prep all scale with
    LOCAL row count at the global trajectory's pair density, so a slab
    holding lambda*N/D rows costs ~ t_tier(N)*lambda/D. (Sorts are mildly
    superlinear past ~1M rows — see BASELINE.md build-phase notes — which
    makes the 1/D local-work scaling slightly conservative-optimistic for
    D=1->2 at 4M and pessimistic below 1M; second-order either way.)
  * lambda(N, D) = max_slab_rows / (N/D): measured on the REAL trajectory
    by scripts/slab_census.py (cuts the single-chip run into D virtual
    z-slabs at every checkpoint; physics is device-count independent).
    The slowest device sets the step time under shard_map's SPMD step.
  * tax(n): the halo/migration machinery a device pays BEYOND the local
    physics (extra category sort, splice sorts, buffer packing) — measured
    directly on the real chip as full-machinery mesh-1 minus the
    single-chip step (TPUSPH_DIST_FULL_MACHINERY=1 disables the
    degenerate-mesh elisions: dead halo buffers and the migration sort run
    exactly as on a middle device of a real mesh, minus only the ppermute
    itself). TWO variants, each fit as a power law through its (262k, 1M)
    measured points: the always-sort tax (TPUSPH_DIST_FORCE_MIGSORT=1 —
    every step pays the category sort) and the production tax, where
    migration-free steps skip that sort via lax.cond (dist/sharded.py §6).
    The projection charges the former on the census-measured fraction of
    checkpoints with slab-crossers and the latter on the rest; capacities
    enter at the right-sized margin (DistSimulator.right_size: census
    max * 1.3).
  * t_ici: ppermute sends the full fixed-capacity buffers (halo rows
    25 B, migration rows 29 B — tpusph/dist/multislice.py, checked against
    the step's operand shapes by tests/test_multislice.py) over one ICI
    hop each way. v5e ICI is NOT measurable here; the stated assumption is
    45 GB/s per link per direction and 1 us per collective (4 ppermutes:
    halo up/dn + migration up/dn), serial with compute (no overlap
    assumed — conservative).

Run: python scripts/scaling_model.py   (no TPU needed — consumes the
checked-in scaling/ artifacts). Writes scaling/PROJECTION.json and prints
the strong-scaling table that SCALING.md embeds.
"""

from __future__ import annotations

import json
import math
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCALING = os.path.join(ROOT, "scaling")
sys.path.insert(0, ROOT)

# Official single-chip 100-step bench, ms/step (BASELINE.md round-4 rows,
# parity pass at every tier; BENCH_r04.json carries the 262k line).
TIER_MS = {
    65_536: 1.82,
    262_144: 7.63,
    1_048_576: 39.7,
    2_097_152: 108.0,
    4_194_304: 233.2,
}

# ICI assumptions (v5e; not measurable from this 1-chip host — see SCALING.md)
ICI_BYTES_PER_S = 45e9  # per link per direction
ICI_COLLECTIVE_LATENCY_S = 1e-6
PPERMUTES_PER_STEP = 4  # halo up/dn + migration up/dn (dist/sharded.py)
RIGHT_SIZE_MARGIN = 1.3  # DistSimulator.right_size margin for D >= 2


def _load(name):
    with open(os.path.join(SCALING, name)) as f:
        return json.load(f)


def machinery_tax_fit(kind="FULL"):
    """Power-law tax(n) through the two measured full-machinery points.

    kind="FULL": always-sort machinery (TPUSPH_DIST_FORCE_MIGSORT
    semantics — the migration/compaction category sort runs every step);
    kind="FULL_SKIP": the production path, where migration-free steps skip
    that sort via lax.cond (dist/sharded.py §6). The projection charges
    FULL on the census-measured fraction of migrating steps and FULL_SKIP
    on the rest."""
    pts = []
    for n in (262_144, 1_048_576):
        full = _load(f"DIST_{kind}_n{n}.json")
        assert full["full_machinery"] and full["parity"] == "pass"
        t_full = 1000.0 / full["value"]
        pts.append((n, t_full - TIER_MS[n]))
    (n0, t0), (n1, t1) = pts
    p = math.log(t1 / t0) / math.log(n1 / n0)
    scale = t1 / (n1**p)
    return (lambda n: scale * (n**p)), pts, p


def census_stats(n, variant="bal"):
    """Trajectory-max imbalance / halo / migration per D from the census,
    plus the fraction of checkpoints where ANY device migrates rows (the
    weight between the always-sort and sort-skipped machinery taxes).

    variant="bal" (default) reads the balance-aware cell-plane partition's
    sub-census — the partition DistSimulator.setup ships by default
    (sharded.balanced_slab_planes). variant="eq" reads the legacy
    equal-width slabs (balance=False)."""
    c = _load(f"census_n{n}.json")
    out = {}
    for d in (2, 4, 8):
        rows = [r[str(d)] for r in c["rows"]]
        if variant == "bal":
            rows = [r.get("bal", r) for r in rows]
        out[d] = {
            "lambda": max(r["imbalance"] for r in rows),
            "halo_rows": max(r["max_halo_send"] for r in rows),
            "mig_rows": max(r["max_migration"] for r in rows),
            "mig_frac": sum(r["max_migration"] > 0 for r in rows)
            / len(rows),
        }
    return out, c


def project(n, tax_force, tax_skip, variant="bal"):
    """Strong-scaling rows for global N over D in {1,2,4,8}."""
    stats, census = census_stats(n, variant)
    t1 = TIER_MS[n]
    rows = [
        {
            "d": 1,
            "ms_per_step": round(t1, 2),
            "steps_per_sec": round(1000.0 / t1, 1),
            "speedup": 1.0,
            "efficiency": 1.0,
            "lambda": 1.0,
            "tax_ms": 0.0,
            "ici_us": 0.0,
        }
    ]
    for d in (2, 4, 8):
        s = stats[d]
        lam = s["lambda"]
        n_dev = lam * n / d
        halo_cap = max(256, int(s["halo_rows"] * RIGHT_SIZE_MARGIN))
        mig_cap = max(256, int(s["mig_rows"] * RIGHT_SIZE_MARGIN))
        from tpusph.dist.multislice import halo_bytes_per_boundary

        wire_bytes = halo_bytes_per_boundary(halo_cap, mig_cap)
        t_ici = (
            PPERMUTES_PER_STEP * ICI_COLLECTIVE_LATENCY_S
            + wire_bytes / ICI_BYTES_PER_S
        ) * 1000.0
        # migration-weighted machinery: the census-measured fraction of
        # checkpoints with slab-crossers pays the category sort; the rest
        # take the lax.cond skip (dist/sharded.py §6). Charged at the
        # right-sized occupancy.
        f = s["mig_frac"]
        occ = n_dev * RIGHT_SIZE_MARGIN
        t_tax = f * tax_force(occ) + (1.0 - f) * tax_skip(occ)
        t = t1 * lam / d + t_tax + t_ici
        rows.append(
            {
                "d": d,
                "ms_per_step": round(t, 2),
                "steps_per_sec": round(1000.0 / t, 1),
                "speedup": round(t1 / t, 2),
                "efficiency": round(t1 / t / d, 3),
                "lambda": round(lam, 3),
                "tax_ms": round(t_tax, 2),
                "mig_frac": round(f, 2),
                "ici_us": round(t_ici * 1000.0, 1),
                "halo_cap": halo_cap,
                "mig_cap": mig_cap,
                "wire_bytes": wire_bytes,
            }
        )
    return {
        "n": n,
        "census_init": census["init"],
        "partition": "balanced" if variant == "bal" else "equal_width",
        "rows": rows,
    }


def main() -> None:
    tax_force, pts_f, p_f = machinery_tax_fit("FULL")
    tax_skip, pts_s, p_s = machinery_tax_fit("FULL_SKIP")
    print(
        "machinery tax (measured, full-machinery mesh-1 minus single-chip):"
        "\n  always-sort: "
        + ", ".join(f"{n}: {t:.2f} ms" for n, t in pts_f)
        + f"  -> ~ n^{p_f:.2f}"
        + "\n  sort-skipped (migration-free steps): "
        + ", ".join(f"{n}: {t:.2f} ms" for n, t in pts_s)
        + f"  -> ~ n^{p_s:.2f}"
    )
    tables = []
    tables_eq = []
    for n in sorted(TIER_MS):
        if not os.path.exists(os.path.join(SCALING, f"census_n{n}.json")):
            continue
        tbl = project(n, tax_force, tax_skip, "bal")
        tables.append(tbl)
        tables_eq.append(project(n, tax_force, tax_skip, "eq"))
        print(
            f"\nN = {n:,} (strong scaling, census init={tbl['census_init']},"
            " balanced partition):"
        )
        print("  D   ms/step  steps/s  speedup  eff    lambda  tax_ms  ici_us")
        for r in tbl["rows"]:
            print(
                f"  {r['d']}  {r['ms_per_step']:8.2f} {r['steps_per_sec']:8.1f}"
                f"  {r['speedup']:6.2f}  {r['efficiency']:5.3f}"
                f"  {r['lambda']:6.3f}  {r['tax_ms']:6.2f}  {r['ici_us']:6.1f}"
            )
    out = {
        "model": "t = t_tier(N)*lambda/D"
        " + mig_frac-weighted tax(n_dev*margin) + t_ici",
        "tax_points_ms": {str(n): round(t, 3) for n, t in pts_f},
        "tax_skip_points_ms": {str(n): round(t, 3) for n, t in pts_s},
        "tax_exponent": round(p_f, 3),
        "tax_skip_exponent": round(p_s, 3),
        "ici_assumption": {
            "bytes_per_s_per_link_per_dir": ICI_BYTES_PER_S,
            "collective_latency_s": ICI_COLLECTIVE_LATENCY_S,
            "ppermutes_per_step": PPERMUTES_PER_STEP,
        },
        "tier_ms_single_chip": {str(k): v for k, v in TIER_MS.items()},
        "tables": tables,
        "tables_equal_width": tables_eq,
    }
    path = os.path.join(SCALING, "PROJECTION.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"\nwrote {path}")


if __name__ == "__main__":
    main()
