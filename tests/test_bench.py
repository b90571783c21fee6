"""bench.py smoke test (CPU: falls back to the cell_list backend)."""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow  # ~110 s on CPU: the full 3-step bench subprocess
def test_bench_emits_json_line():
    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        TPUSPH_BENCH_N="512",
        TPUSPH_BENCH_STEPS="3",
        TPUSPH_BENCH_BACKEND="cell_list",
    )
    r = subprocess.run(
        [sys.executable, "bench.py"],
        capture_output=True,
        text=True,
        cwd=REPO,
        env=env,
        timeout=600,
    )
    assert r.returncode == 0, r.stderr
    line = r.stdout.strip().splitlines()[-1]
    data = json.loads(line)
    assert set(data) == {"metric", "value", "unit", "vs_baseline", "parity"}
    assert data["metric"] == "sph_timesteps_per_sec_n512"
    assert data["value"] > 0


@pytest.mark.slow  # ~18 s: dist bench subprocess
def test_bench_dist_mode_smoke(tmp_path):
    """TPUSPH_BENCH_DIST runs the scan-chained sharded loop on a virtual
    CPU mesh and emits the dist metric line."""
    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        XLA_FLAGS=os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=2",
        TPUSPH_BENCH_DIST="2",
        TPUSPH_BENCH_N="512",
        TPUSPH_BENCH_STEPS="3",
        TPUSPH_BENCH_ARTIFACT_DIR=str(tmp_path),
    )
    r = subprocess.run(
        [
            sys.executable,
            "-c",
            "import jax; jax.config.update('jax_platforms', 'cpu'); "
            "import bench; bench.main()",
        ],
        capture_output=True,
        text=True,
        cwd=REPO,
        env=env,
        timeout=600,
    )
    assert r.returncode == 0, r.stderr
    data = json.loads(r.stdout.strip().splitlines()[-1])
    assert data["metric"] == "sph_dist_timesteps_per_sec_n512_d2"
    assert data["value"] > 0 and data["parity"] == "pass"


def test_config_overrides_presets():
    """Env overrides and the measured per-N presets (hybrid stencil + 128x8
    geometry + pile-up capacities at N >= 1M; no overrides below)."""
    sys.path.insert(0, REPO)
    from bench import config_overrides

    assert config_overrides(262_144, {}) == {
        "pallas_group": 32, "pallas_col_capacity": 8192,
        "pallas_desc": True, "pallas_desc_blocks": 24,
        "pallas_desc_unroll": 4, "pallas_desc_unroll_force": 2,
        "pallas_force_fold": True, "pallas_force_split": True,
        "pallas_force_split_factor": 4, "pallas_force_lane_split": True,
        "pallas_query_rank": True, "pallas_force_slim": True,
        "pallas_align128": True, "pallas_force_selfless": True,
    }
    kw = config_overrides(1_048_576, {})
    assert kw == {
        "pallas_stencil": "hybrid", "pallas_tile": 128, "pallas_group": 16,
        "pallas_col_capacity": 32768, "pallas_sub_blocks": 80,
        "pallas_desc": True, "pallas_desc_unroll": 4,
        "pallas_desc_unroll_force": 2, "pallas_force_fold": True,
        "pallas_force_split": True, "pallas_force_split_factor": 4,
        "pallas_query_rank": True, "pallas_slow_unroll": 2,
        "pallas_stream_desc": True, "pallas_desc_blocks": 32,
        "pallas_ranged_maskless": True, "pallas_force_slim": True,
        "pallas_align128": True, "pallas_force_selfless": True,
    }
    kw2 = config_overrides(2_097_152, {})
    assert kw2["pallas_stream_desc"] is True
    assert kw2["pallas_desc_blocks"] == 32  # streamed-records A/B at 2M
    assert kw2["pallas_col_capacity"] == 65536
    # -15% FULL-step A/B at both probes; slim re-enables double-buffering
    assert kw2["pallas_ranged_maskless"] and kw2["pallas_force_slim"]
    # desc can be forced off (and the unroll preset goes with it)
    kw = config_overrides(262_144, {"TPUSPH_BENCH_DESC": "0"})
    assert kw["pallas_desc"] is False and "pallas_desc_unroll" not in kw
    kw = config_overrides(
        1_048_576,
        {"TPUSPH_BENCH_STENCIL": "slab3", "TPUSPH_BENCH_COL_CAP": "8192"},
    )
    assert kw["pallas_stencil"] == "slab3"  # explicit env wins over preset
    assert kw["pallas_col_capacity"] == 8192
    # the geometry + capacity presets survive a stencil-only override
    assert kw["pallas_tile"] == 128 and kw["pallas_group"] == 16
    assert kw["pallas_sub_blocks"] == 80
    # geometry env overrides (on top of the sub-1M desc preset)
    kw = config_overrides(512, {"TPUSPH_BENCH_TILE": "64",
                                "TPUSPH_BENCH_GROUP": "4",
                                "TPUSPH_BENCH_BLOCK_LANES": "128"})
    assert kw["pallas_tile"] == 64 and kw["pallas_group"] == 4
    assert kw["pallas_block_lanes"] == 128 and kw["pallas_desc"] is True
