"""VPU throughput microbenchmark on the real TPU: achieved elementwise rate
for f32 vs bf16 and the SPH density inner-loop op mix.

The axon relay adds ~25-40 ms per dispatch, so every measurement uses the
slope method: time ROUNDS=R and R*4 in-kernel repetitions and divide the
difference. Mosaic on this stack cannot compile bf16 comparisons (verified:
'Target does not support this comparison'), so the bf16 density mix does its
compares in f32 and arithmetic in bf16.
"""

from __future__ import annotations

import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R = 20_000
SUB = 256


def fence(x):
    jax.device_get(x.ravel()[0])


def timed(kj, *args, reps=6):
    out = kj(*args)
    fence(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = kj(*args)
        fence(out)
        ts.append(time.perf_counter() - t0)
    return min(ts)


def make_fma_kernel(dtype, rounds, streams):
    """`streams` independent accumulators, 1 fma each per round (tests ILP)."""

    def kernel(x_ref, o_ref):
        c1 = jnp.asarray(1.0000001, dtype)
        c2 = jnp.asarray(1e-9, dtype)

        def body(i, accs):
            return tuple(a * c1 + c2 for a in accs)

        accs = tuple(
            x_ref[:] + jnp.asarray(k, dtype) for k in range(streams)
        )
        accs = jax.lax.fori_loop(0, rounds, body, accs)
        out = accs[0]
        for a in accs[1:]:
            out = out + a
        o_ref[:] = out

    return kernel


def run_fma(dtype, streams):
    x = jnp.ones((SUB, 128), dtype)
    ts = {}
    for rounds in (R, 4 * R):
        k = pl.pallas_call(
            make_fma_kernel(dtype, rounds, streams),
            out_shape=jax.ShapeDtypeStruct((SUB, 128), dtype),
        )
        ts[rounds] = timed(jax.jit(k), x)
    dt = (ts[4 * R] - ts[R]) / (3 * R)
    ops = streams * SUB * 128  # fmas per round
    return ops / dt / 1e12, dt


def make_density_mix_kernel(dtype, pt, rounds):
    """Density inner-loop op mix on a (pt,128) candidate block. Arithmetic in
    `dtype`; compares in f32 (Mosaic bf16-compare unsupported)."""

    def kernel(t_ref, c_ref, o_ref):
        tx = t_ref[0:pt, 0:1]
        ty = t_ref[0:pt, 1:2]
        tz = t_ref[0:pt, 2:3]
        tk = t_ref[0:pt, 3:4].astype(jnp.float32)
        h2 = jnp.asarray(0.01, dtype)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1).astype(jnp.float32)

        def body(i, acc):
            cx = c_ref[0, :][None, :]
            cy = c_ref[1, :][None, :]
            cz = c_ref[2, :][None, :]
            ck = c_ref[3, :][None, :].astype(jnp.float32)
            dx = tx - cx
            dy = ty - cy
            dz = tz - cz
            r2 = dx * dx + dy * dy + dz * dz
            keyhit = jnp.abs(ck - tk) <= 1.0
            live = keyhit & (lane < 100.0 + i.astype(jnp.float32) * 0.0)
            w = jnp.maximum(h2 - r2, jnp.asarray(0, dtype))
            w = w * w * w
            return acc + jnp.where(live, w, jnp.asarray(0, dtype))

        acc = jax.lax.fori_loop(
            0, rounds, body, jnp.zeros((pt, 128), dtype)
        )
        o_ref[:] = acc.astype(jnp.float32)

    return kernel


def run_density_mix(dtype, pt):
    t = jnp.ones((max(pt, 8), 4), dtype)
    c = jnp.ones((8, 128), dtype)
    ts = {}
    for rounds in (R // 4, R):
        k = pl.pallas_call(
            make_density_mix_kernel(dtype, pt, rounds),
            out_shape=jax.ShapeDtypeStruct((pt, 128), jnp.float32),
        )
        ts[rounds] = timed(jax.jit(k), t, c)
    dt = (ts[R] - ts[R // 4]) / (R - R // 4)
    return pt * 128 / dt / 1e9, dt


def main():
    print(f"fma slope bench (SUB={SUB}, R={R}):", flush=True)
    for dtype in (jnp.float32, jnp.bfloat16):
        for streams in (1, 4, 8):
            tops, dt = run_fma(dtype, streams)
            print(f"  {jnp.dtype(dtype).name:9s} streams={streams}: "
                  f"{tops:6.3f} Tfma/s ({dt*1e9:7.1f} ns/round)", flush=True)
    print("density-mix slope bench (pair-lanes/s):", flush=True)
    for dtype in (jnp.float32, jnp.bfloat16):
        for pt in (8, 64, 128, 256):
            gl, dt = run_density_mix(dtype, pt)
            print(f"  {jnp.dtype(dtype).name:9s} pt={pt:4d}: {gl:7.2f} Gpair-lanes/s "
                  f"({dt*1e9:7.1f} ns/block)", flush=True)


if __name__ == "__main__":
    main()
