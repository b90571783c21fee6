"""Measures the non-kernel 'glue' ops of the sorted step at N=262k on TPU:
argsort, gather layouts, bincount+cumsum, transposes, stacking — each via the
slope method with a full-reduction carry so XLA cannot DCE any output.

Usage: python scripts/glue_bench.py [N]
"""

from __future__ import annotations

import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

import jax.numpy as jnp
import numpy as np

from tpusph.core.config import default_config
from tpusph.core.init import init_state
from tpusph.neighbors.cell_list import build_cell_list

K = 16


def fence(x):
    jax.device_get(jax.tree_util.tree_leaves(x)[0].ravel()[0])


def slope(fn, *args, reps=4):
    """fn(z, *args) -> array(s); z is a float32 0 the compiler can't fold.
    Carry = sum of every output leaf (forces full materialization)."""

    def chained(k):
        @jax.jit
        def run(*args):
            def body(carry, _):
                z = jnp.where(jnp.isnan(carry), jnp.float32(1), jnp.float32(0))
                out = fn(z, *args)
                s = sum(jnp.sum(l).astype(jnp.float32)
                        for l in jax.tree_util.tree_leaves(out))
                return s, None
            c, _ = jax.lax.scan(body, jnp.float32(0), None, length=k)
            return c
        return run

    ts = {}
    for k in (1, K):
        run = chained(k)
        out = run(*args)
        fence(out)
        best = 1e9
        for _ in range(reps):
            t0 = time.perf_counter()
            out = run(*args)
            fence(out)
            best = min(best, time.perf_counter() - t0)
        ts[k] = best
    return (ts[K] - ts[1]) / (K - 1)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 262_144
    cfg = default_config(n)
    state = init_state(cfg)
    cl = jax.jit(lambda s: build_cell_list(s.position, s.valid, cfg))(state)
    fence(cl)
    pos, vel, valid = state.position, state.velocity, state.valid
    key = cl.key_sorted  # stand-in unsorted keys for sort timing
    perm = cl.perm
    packed8 = jnp.concatenate(
        [pos, vel, key[:, None].astype(jnp.float32), valid[:, None]], axis=1
    )
    key_i = jnp.asarray(np.random.default_rng(0).permutation(
        np.asarray(jax.device_get(key))), jnp.int32)

    t = {}
    t["argsort_262k"] = slope(
        lambda z, k: jnp.argsort(k + z.astype(jnp.int32), stable=True), key_i)
    t["sort_kv"] = slope(
        lambda z, k, v: jax.lax.sort((k + z.astype(jnp.int32), v), num_keys=1),
        key_i, jnp.arange(n, dtype=jnp.int32))
    t["gather_pos_vel"] = slope(
        lambda z, p, v, pm: (p[pm] + z, v[pm]), pos, vel, perm)
    t["gather_packed8"] = slope(
        lambda z, pk, pm: pk[pm] + z, packed8, perm)
    t["gather_key_valid"] = slope(
        lambda z, k, va, pm: (k[pm] + z.astype(jnp.int32), va[pm]), key_i, valid, perm)
    t["bincount_1e6"] = slope(
        lambda z, k: jnp.cumsum(jnp.bincount(k + z.astype(jnp.int32),
                                             length=cfg.num_cells + 1)), key_i)
    t["transpose_n3"] = slope(lambda z, p: (p + z).T, pos)
    t["transpose_n8"] = slope(lambda z, pk: (pk + z).T, packed8)
    t["concat_stack16"] = slope(
        lambda z, p, v: jnp.concatenate([
            (p + z).T, v.T,
            jnp.zeros((2, n), jnp.float32),
            jnp.zeros((8, n), jnp.float32),
        ]), pos, vel)
    t["scatter_add_1e6"] = slope(
        lambda z, k: jnp.zeros((cfg.num_cells + 2,), jnp.int32)
        .at[k + z.astype(jnp.int32)].add(1), key_i)
    t["integrate_elem"] = slope(
        lambda z, p, v: (p + 0.01 * (v + z), v * 0.99 + z), pos, vel)

    for name, v in t.items():
        print(f"  {name:18s}: {v*1e3:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()


def extra():
    """Payload-sort vs argsort+gather, and searchsorted-starts vs bincount."""
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 262_144
    cfg = default_config(n)
    state = init_state(cfg)
    pos, vel, valid = state.position, state.velocity, state.valid
    cl = jax.jit(lambda s: build_cell_list(s.position, s.valid, cfg))(state)
    fence(cl)
    key_i = jnp.asarray(np.random.default_rng(0).permutation(
        np.asarray(jax.device_get(cl.key_sorted))), jnp.int32)

    t = {}
    t["argsort_gather_all"] = slope(
        lambda z, k, p, v, va: (
            lambda perm: (k[perm], p[perm] + z, v[perm], va[perm])
        )(jnp.argsort(k, stable=True).astype(jnp.int32)),
        key_i, pos, vel, valid)
    t["payload_sort7"] = slope(
        lambda z, k, p, v: jax.lax.sort(
            (k,) + tuple(p[:, i] + z for i in range(3))
            + tuple(v[:, i] for i in range(3)),
            num_keys=1),
        key_i, pos, vel)
    t["payload_sort7_unstable_iota"] = slope(
        lambda z, k, p, v: jax.lax.sort(
            (k, jnp.arange(k.shape[0], dtype=jnp.int32))
            + tuple(p[:, i] + z for i in range(3))
            + tuple(v[:, i] for i in range(3)),
            num_keys=2),
        key_i, pos, vel)
    t["bincount_cumsum"] = slope(
        lambda z, k: jnp.concatenate([
            jnp.zeros((1,), jnp.int32),
            jnp.cumsum(jnp.zeros((cfg.num_cells + 1,), jnp.int32)
                       .at[k + z.astype(jnp.int32)].add(1), dtype=jnp.int32)]),
        key_i)
    qs = jnp.asarray(np.random.default_rng(1).integers(
        0, cfg.num_cells, size=(46080,)), jnp.int32)
    t["searchsorted_46k"] = slope(
        lambda z, ks, q: jnp.searchsorted(
            ks, q + z.astype(jnp.int32), side="left"),
        cl.key_sorted, qs)
    t["slice_n3_to_cols"] = slope(
        lambda z, p: tuple(p[:, i] + z for i in range(3)), pos)
    for name, v in t.items():
        print(f"  {name:26s}: {v*1e3:7.3f} ms", flush=True)


if __name__ == "__main__" and "--extra" in sys.argv:
    sys.argv.remove("--extra")
    extra()
    sys.exit(0)
