"""Golden-trajectory regression tests (SURVEY.md §4c): fixed seed, K steps,
compare against stored state snapshots. Regenerate with
`python tests/test_golden.py` after an *intentional* physics change."""

import os

import numpy as np

from tpusph.core.config import default_config
from tpusph.core.init import init_state
from tpusph.engine.step import make_step

GOLDEN = os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden")
STEPS = 15


def _run():
    cfg = default_config(256, chunk_size=256)
    st = init_state(cfg, random_init=True, seed=42)
    step = make_step(cfg, "cell_list")
    for _ in range(STEPS):
        st, _ = step(st)
    v = np.asarray(st.valid)
    return {
        "position": np.asarray(st.position)[v],
        "velocity": np.asarray(st.velocity)[v],
        "density": np.asarray(st.density)[v],
    }


def test_golden_trajectory():
    got = _run()
    path = os.path.join(GOLDEN, "traj_rand256_15.npz")
    assert os.path.exists(path), "golden file missing — run tests/test_golden.py"
    with np.load(path) as ref:
        for k in got:
            np.testing.assert_allclose(
                got[k], ref[k], rtol=1e-5, atol=1e-6,
                err_msg=f"golden mismatch in {k}",
            )


if __name__ == "__main__":
    os.makedirs(GOLDEN, exist_ok=True)
    np.savez_compressed(os.path.join(GOLDEN, "traj_rand256_15.npz"), **_run())
    print("golden regenerated")
