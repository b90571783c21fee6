"""Isolate the production kernels' per-block overhead on the real TPU.

The density-mix microbench (vpu_microbench.py) reaches ~114-134
Gpair-lanes/s with a STATIC trip count and STATIC loads; the production
kernels achieve roughly half that, and the desc-loop A/B showed the scalar
select chain is NOT the gap. This probe decomposes the remainder:

  V0 static-trip, static-offset loads  (the microbench ideal, at bl)
  V1 static-trip, dynamic 128-aligned offset loads (offset from SMEM)
  V2 dynamic-trip (SMEM scalar), static loads
  V3 dynamic-trip, dynamic loads            (≈ production fast path)
  V4 = V3 unrolled ×2 per fori iteration
  V5 = V3 with the force-kernel op mix (3 accumulators, rsqrt)

Usage: python scripts/loop_probe.py [pt] [bl]
"""

from __future__ import annotations

import functools
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R = 4096  # base rounds
CAP = 16384  # candidate buffer lanes


def fence(x):
    jax.device_get(jax.tree_util.tree_leaves(x)[0].ravel()[0])


def timed(kj, *args, reps=5):
    out = kj(*args)
    fence(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = kj(*args)
        fence(out)
        ts.append(time.perf_counter() - t0)
    return min(ts)


def make_kernel(variant, pt, bl, rounds):
    dyn_trip = variant in ("V2", "V3", "V4", "V5")
    dyn_load = variant in ("V1", "V3", "V4", "V5")
    unroll = 2 if variant == "V4" else 1
    force_mix = variant == "V5"

    def kernel(desc_ref, t_ref, cand_ref, o_ref):
        tx = t_ref[0:pt, 0:1]
        ty = t_ref[0:pt, 1:2]
        tz = t_ref[0:pt, 2:3]
        h2 = jnp.float32(0.01)
        h = jnp.float32(0.1)
        eps = jnp.float32(1e-4)

        def load(b):
            if dyn_load:
                off = desc_ref[b].astype(jnp.int32) * 128
                sl = pl.ds(pl.multiple_of(off, 128), bl)
            else:
                sl = pl.ds(0, bl)
            return (
                cand_ref[0, sl][None, :],
                cand_ref[1, sl][None, :],
                cand_ref[2, sl][None, :],
            )

        if force_mix:
            def one(b, carry):
                fx, fy, fz = carry
                cx, cy, cz = load(b)
                dx = tx - cx
                dy = ty - cy
                dz = tz - cz
                r2 = dx * dx + dy * dy + dz * dz
                inv_r = jax.lax.rsqrt(r2)
                r = r2 * inv_r
                live = r >= eps
                hr = jnp.maximum(h - r, 0.0)
                s_p = jnp.where(live, hr * hr * inv_r, 0.0)
                fx = fx + s_p * dx
                fy = fy + s_p * dy
                fz = fz + s_p * dz
                s_v = jnp.where(live, hr, 0.0)
                fx = fx + s_v * cx
                fy = fy + s_v * cy
                fz = fz + s_v * cz
                return fx, fy, fz

            z = jnp.zeros((pt, bl), jnp.float32)
            init = (z, z, z)
        else:
            def one(b, acc):
                cx, cy, cz = load(b)
                dx = tx - cx
                dy = ty - cy
                dz = tz - cz
                r2 = dx * dx + dy * dy + dz * dz
                w = jnp.maximum(h2 - r2, 0.0)
                return acc + w * w * w

            init = jnp.zeros((pt, bl), jnp.float32)

        def body(i, acc):
            if unroll == 1:
                return one(i, acc)
            acc = one(i * 2, acc)
            return one(i * 2 + 1, acc)

        n = desc_ref[rounds].astype(jnp.int32) if dyn_trip else rounds
        acc = jax.lax.fori_loop(0, n // unroll, body, init)
        out = acc[0] + acc[1] + acc[2] if force_mix else acc
        o_ref[:] = out

    return kernel


def run(variant, pt, bl):
    rng = np.random.default_rng(0)
    t = jnp.asarray(rng.uniform(1, 9, (max(pt, 8), 4)), jnp.float32)
    cand = jnp.asarray(rng.uniform(1, 9, (8, CAP)), jnp.float32)
    ts = {}
    for rounds in (R, 4 * R):
        desc = np.zeros((rounds + 8,), np.int16)
        desc[:rounds] = rng.integers(0, (CAP - bl) // 128, rounds)
        desc[rounds] = rounds  # dynamic trip count slot
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(1,),
            in_specs=[
                pl.BlockSpec((max(pt, 8), 4), lambda i, *_: (0, 0)),
                pl.BlockSpec((8, CAP), lambda i, *_: (0, 0)),
            ],
            out_specs=pl.BlockSpec((pt, bl), lambda i, *_: (0, 0)),
        )
        k = pl.pallas_call(
            make_kernel(variant, pt, bl, rounds),
            out_shape=jax.ShapeDtypeStruct((pt, bl), jnp.float32),
            grid_spec=grid_spec,
        )
        ts[rounds] = timed(jax.jit(k), jnp.asarray(desc), t, cand)
    dt = (ts[4 * R] - ts[R]) / (3 * R)
    return pt * bl / dt / 1e9, dt


def main():
    pt = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    bl = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    for variant in ("V0", "V1", "V2", "V3", "V4", "V5"):
        gl, dt = run(variant, pt, bl)
        print(
            f"{variant} pt={pt} bl={bl}: {gl:7.2f} Gpair-lanes/s "
            f"({dt * 1e9:7.1f} ns/block)",
            flush=True,
        )


if __name__ == "__main__":
    main()
