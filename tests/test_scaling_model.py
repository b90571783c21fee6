"""Scaling-projection model (scripts/scaling_model.py, SCALING.md): the
model must run from the checked-in scaling/ artifacts alone (no TPU), its
measured machinery-tax fit must stay physical, and its wire-byte accounting
must agree with the multislice helper the step's ppermute shapes are tested
against (tests/test_multislice.py) — so the projection can't silently drift
from the implementation."""

import importlib.util
import json
import os

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_model():
    spec = importlib.util.spec_from_file_location(
        "scaling_model", os.path.join(ROOT, "scripts", "scaling_model.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def model():
    return _load_model()


@pytest.mark.parametrize("kind", ["FULL", "FULL_SKIP"])
def test_tax_fit_is_physical(model, kind):
    tax, pts, p = model.machinery_tax_fit(kind)
    # both measured points positive, near-linear growth in occupancy
    assert all(t > 0 for _, t in pts)
    assert 0.5 < p < 1.5
    # fit reproduces the measured points
    for n, t in pts:
        assert abs(tax(n) - t) < 1e-6
    # monotone in occupancy
    assert tax(2_000_000) > tax(500_000) > tax(50_000) > 0


def test_skip_tax_below_forced_tax(model):
    """The lax.cond sort skip must make migration-free machinery strictly
    cheaper than the always-sort machinery at both measured occupancies."""
    _, pts_f, _ = model.machinery_tax_fit("FULL")
    _, pts_s, _ = model.machinery_tax_fit("FULL_SKIP")
    for (n_f, t_f), (n_s, t_s) in zip(pts_f, pts_s):
        assert n_f == n_s
        assert t_s < t_f


def _taxes(model):
    tf, _, _ = model.machinery_tax_fit("FULL")
    ts, _, _ = model.machinery_tax_fit("FULL_SKIP")
    return tf, ts


def test_projection_shape(model):
    tbl = model.project(262_144, *_taxes(model))
    rows = {r["d"]: r for r in tbl["rows"]}
    assert set(rows) == {1, 2, 4, 8}
    # throughput strictly improves with D; efficiency never exceeds 1
    last = 0.0
    for d in (1, 2, 4, 8):
        r = rows[d]
        assert r["steps_per_sec"] > last
        last = r["steps_per_sec"]
        assert 0.0 < r["efficiency"] <= 1.0
        assert r["ms_per_step"] > 0
    # D=1 is the measured single-chip tier, exactly
    assert rows[1]["ms_per_step"] == round(model.TIER_MS[262_144], 2)


def test_wire_bytes_match_multislice_helper(model):
    from tpusph.dist.multislice import halo_bytes_per_boundary

    tbl = model.project(262_144, *_taxes(model))
    for r in tbl["rows"]:
        if r["d"] == 1:
            continue
        assert r["wire_bytes"] == halo_bytes_per_boundary(
            r["halo_cap"], r["mig_cap"]
        )


def test_tax_inputs_are_parity_gated():
    for kind in ("FULL", "FULL_SKIP"):
        for n in (262_144, 1_048_576):
            path = os.path.join(
                ROOT, "scaling", f"DIST_{kind}_n{n}.json"
            )
            with open(path) as f:
                art = json.load(f)
            assert art["parity"] == "pass"
            assert art["full_machinery"] is True


def test_balanced_partition_reduces_imbalance(model):
    """The balance-aware partition (the DistSimulator.setup default) must
    cut the census-measured load imbalance on the random-init tiers, where
    equal-width slabs are structurally imbalanced (edge slabs half-empty,
    lambda = 1.25 at D >= 4), and the headline projection must charge the
    balanced numbers."""
    for n in (2_097_152, 4_194_304):
        bal, _ = model.census_stats(n, "bal")
        eq, _ = model.census_stats(n, "eq")
        for d in (2, 4, 8):
            # never meaningfully worse (cell quantization noise only) ...
            assert bal[d]["lambda"] <= eq[d]["lambda"] + 0.01
        # ... and decisively better where equal-width is pathological
        for d in (4, 8):
            assert eq[d]["lambda"] > 1.2
            assert bal[d]["lambda"] < 1.12

    tf, _, _ = model.machinery_tax_fit("FULL")
    ts, _, _ = model.machinery_tax_fit("FULL_SKIP")
    tbl = model.project(2_097_152, tf, ts)  # default variant = balanced
    assert tbl["partition"] == "balanced"
    eff8 = {r["d"]: r["efficiency"] for r in tbl["rows"]}[8]
    assert eff8 > 0.8  # equal-width projected 0.74 here
