"""bench.py smoke test (CPU: falls back to the cell_list backend)."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


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
