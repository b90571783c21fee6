"""Measure the Pallas starts-table rank kernel vs the bincount histogram on
the real TPU (slope method), and assert exact equality on device.

Usage: python scripts/starts_bench.py [N] [step] (env TPUSPH_SB_CHUNK,
TPUSPH_SB_KCAP override the kernel geometry)
"""

from __future__ import annotations

import dataclasses
import os
import sys

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))
from profile_step import fence, slope_bench  # noqa: E402
from bench import config_overrides  # noqa: E402

from tpusph.core.config import default_config
from tpusph.core.init import init_state
from tpusph.engine.step import step_pallas_sorted
from tpusph.neighbors.cell_list import starts_table
from tpusph.neighbors.grid import compute_keys
from tpusph.pallas.starts import starts_table_pallas


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 262_144
    step = int(sys.argv[2]) if len(sys.argv) > 2 else 60
    cfg0 = default_config(n, **config_overrides(n, os.environ))
    state = init_state(cfg0)
    if step:
        @jax.jit
        def adv(s):
            def body(s, _):
                s2, _ = step_pallas_sorted(s, cfg0)
                return s2, None
            return jax.lax.scan(body, s, None, length=step)[0]
        state = adv(state)
        fence(state)
    keys = jax.jit(lambda s: compute_keys(s.position, s.valid, cfg0))(state)
    key = keys.key
    key_sorted = jax.jit(lambda k: jax.lax.sort((k,), num_keys=1)[0])(key)

    t_hist = slope_bench(
        lambda k, z32: starts_table(k + z32, cfg0),
        lambda a, z: (a[0], z.astype(jnp.int32)),
        key, jnp.int32(0),
    )
    print(f"hist: {t_hist * 1e3:6.2f} ms", flush=True)

    chunks = (
        [int(os.environ["TPUSPH_SB_CHUNK"])]
        if os.environ.get("TPUSPH_SB_CHUNK")
        else [1024, 2048, 4096]
    )
    kcap = int(os.environ.get(
        "TPUSPH_SB_KCAP", "131072" if n >= 1_000_000 else "16384"
    ))
    ref = None
    for chunk in chunks:
        cfg = dataclasses.replace(
            cfg0, pallas_starts=True, pallas_starts_chunk=chunk,
            pallas_starts_kcap=kcap,
        )
        got, ovf = jax.jit(
            lambda k: starts_table_pallas(k, cfg)
        )(key_sorted)
        ovf = int(jax.device_get(ovf))
        if ref is None:
            ref = np.asarray(jax.device_get(
                jax.jit(lambda k: starts_table(k, cfg0))(key)
            ))
        got_h = np.asarray(jax.device_get(got))
        eq = "EQUAL" if np.array_equal(got_h, ref) else "MISMATCH!"
        t_k = slope_bench(
            lambda ks, z32: starts_table_pallas(ks + z32, cfg)[0],
            lambda a, z: (a[0], z.astype(jnp.int32)),
            key_sorted, jnp.int32(0),
        )
        print(
            f"rank kernel chunk={chunk:5d} kcap={kcap}: {t_k * 1e3:6.2f} ms "
            f"overflow={ovf} {eq}",
            flush=True,
        )


if __name__ == "__main__":
    main()
