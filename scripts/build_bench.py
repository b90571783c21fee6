"""Measure build-phase alternatives on the attached device (slope method):

  sort      — the payload lax.sort of (key, 6 field lanes)
  hist      — counts scatter-add with UNSORTED keys (current production)
  hist_s    — counts scatter-add with SORTED keys + indices_are_sorted hint
  bound     — boundary scatter-set of first-occurrence index + reverse cummin
              backfill (starts directly, no counts/cumsum)
  cumsum    — the 1M-cell exclusive prefix sum alone

Usage: python scripts/build_bench.py [N]
"""

from __future__ import annotations

import sys

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

import jax.numpy as jnp
import numpy as np

from tpusph.core.config import default_config
from tpusph.core.init import init_state
from tpusph.neighbors.grid import compute_keys_fields

sys.path.insert(0, "scripts")
from profile_step import slope_bench  # noqa: E402


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 262_144
    cfg = default_config(n)
    st = init_state(cfg)
    x, y, z = st.position[:, 0], st.position[:, 1], st.position[:, 2]
    vx, vy, vz = st.velocity[:, 0], st.velocity[:, 1], st.velocity[:, 2]
    key, _ = jax.jit(lambda x, y, z, v: compute_keys_fields(x, y, z, v, cfg))(
        x, y, z, st.valid
    )
    key_sorted = jax.jit(lambda k: jax.lax.sort((k,), num_keys=1)[0])(key)
    nc = cfg.num_cells

    def sort_payload(key, x, y, z, vx, vy, vz):
        return jax.lax.sort((key, x, y, z, vx, vy, vz), num_keys=1,
                            is_stable=True)[0]

    def hist(key):
        return jnp.zeros((nc + 1,), jnp.int32).at[key].add(1)

    def hist_sorted(key_sorted):
        return jnp.zeros((nc + 1,), jnp.int32).at[key_sorted].add(
            1, indices_are_sorted=True
        )

    def bound(key_sorted):
        i = jnp.arange(key_sorted.shape[0], dtype=jnp.int32)
        # reversed write order → the FIRST occurrence's index wins
        raw = jnp.full((nc + 2,), jnp.int32(n)).at[key_sorted[::-1]].set(i[::-1])
        # backfill empty cells with the next occupied cell's start
        rev = jax.lax.associative_scan(jnp.minimum, raw[::-1])[::-1]
        return rev

    def merge(key_sorted):
        # starts[c] = #keys < c via sort instead of scatter: stable-sort the
        # keys merged with the nc+2 cell boundaries (boundaries tie-break
        # BEFORE equal keys → side='left' semantics); a boundary c landing at
        # merged position m has exactly c boundaries before it, so
        # starts[c] = m − c. A second 1-key sort compacts the boundary rows
        # back to cell order (stable sort preserves their ascending-c order).
        nb = nc + 2
        npart = key_sorted.shape[0]
        val = jnp.concatenate(
            [key_sorted, jnp.arange(nb, dtype=jnp.int32)]
        )
        tag = jnp.concatenate(
            [jnp.ones(npart, jnp.int32), jnp.zeros(nb, jnp.int32)]
        )
        val, tag = jax.lax.sort((val, tag), num_keys=2, is_stable=False)
        res = jnp.arange(val.shape[0], dtype=jnp.int32) - val
        _, starts = jax.lax.sort((tag, res), num_keys=1, is_stable=True)
        return starts[:nb]

    def cumsum(counts):
        return jnp.concatenate(
            [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts, dtype=jnp.int32)]
        )

    # searchsorted over the ~26k cell-boundary queries supertile prep makes
    # (slab3 geometry: 2048 tiles × 3 windows × 4 bounds + supertile level) —
    # the candidate replacement for the dense starts histogram
    nq = 26_624
    queries = (jnp.arange(nq, dtype=jnp.int32) * 37) % jnp.int32(nc + 2)

    def ssorted(q):
        return jnp.searchsorted(key_sorted, q, side="left").astype(jnp.int32)

    counts = jax.jit(hist)(key)

    t = {}
    t["sort"] = slope_bench(
        sort_payload, lambda a, z: (a[0], a[1] + z) + a[2:],
        key, x, y, z, vx, vy, vz,
    )
    t["hist"] = slope_bench(
        lambda k, z32: hist(k + z32), lambda a, z: (a[0], z.astype(jnp.int32)),
        key, jnp.int32(0),
    )
    t["hist_s"] = slope_bench(
        lambda k, z32: hist_sorted(k + z32),
        lambda a, z: (a[0], z.astype(jnp.int32)),
        key_sorted, jnp.int32(0),
    )
    t["bound"] = slope_bench(
        lambda k, z32: bound(k + z32), lambda a, z: (a[0], z.astype(jnp.int32)),
        key_sorted, jnp.int32(0),
    )
    t["cumsum"] = slope_bench(
        lambda c, z32: cumsum(c + z32), lambda a, z: (a[0], z.astype(jnp.int32)),
        counts, jnp.int32(0),
    )
    t["merge"] = slope_bench(
        lambda k, z32: merge(k + z32), lambda a, z: (a[0], z.astype(jnp.int32)),
        key_sorted, jnp.int32(0),
    )
    t["ssorted"] = slope_bench(
        lambda q, z32: ssorted(q + z32),
        lambda a, z: (a[0], z.astype(jnp.int32)),
        queries, jnp.int32(0),
    )
    print("  ".join(f"{k}={v*1e3:6.2f}ms" for k, v in t.items()), flush=True)

    # correctness cross-check of `bound` and `merge` against hist+cumsum
    starts_ref = np.asarray(jax.device_get(jax.jit(cumsum)(counts)))
    starts_new = np.asarray(jax.device_get(jax.jit(bound)(key_sorted)))
    np.testing.assert_array_equal(starts_new, starts_ref)
    starts_mrg = np.asarray(jax.device_get(jax.jit(merge)(key_sorted)))
    np.testing.assert_array_equal(starts_mrg, starts_ref)
    print("bound == merge == hist+cumsum: OK", flush=True)


if __name__ == "__main__":
    main()
