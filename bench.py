"""Headline benchmark: SPH timesteps/sec at N=262,144 on one TPU chip.

Protocol mirrors the reference's `-m time` mode (100 timesteps, grid init,
/root/reference/src/main.cpp:68-76) on the BASELINE.json headline config,
using the production engine: sort-based cell lists + fused Pallas density and
force megakernels, chained on-device via lax.scan (steps are sequentially
dependent; scan removes per-step host dispatch, matching how a production
sim loop runs). Capacity overflow is checked after the run — a nonzero count
re-runs with doubled capacity so the timed physics is never degraded.

Prints ONE JSON line; vs_baseline is relative to the 100 steps/s north-star
target (BASELINE.json: ">=100 timesteps/sec at 262k particles").

Every bench line carries its own correctness proof: before timing, a parity
check runs ON THE SAME DEVICE — K chained steps of the timed backend vs the
XLA cell-list backend at N=4096 (multiset-compared: the sorted variant
permutes particle identity), plus one step of cell_list vs the independent
NumPy oracle (tests/oracle_numpy.py), PLUS one step of the timed backend vs
the XLA tile path at the HEADLINE N with the exact timed config (catches
geometry/capacity-dependent bugs small N cannot see) — asserting ≤1e-4
relative density and ≤1e-4 positions, the BASELINE.json budget. The JSON
line reports "parity": "pass"/"fail"; set TPUSPH_BENCH_VERIFY=0 to skip.

Env overrides: TPUSPH_BENCH_N, TPUSPH_BENCH_STEPS, TPUSPH_BENCH_BACKEND;
TPUSPH_BENCH_COL_CAP / TPUSPH_BENCH_SUB_BLOCKS / TPUSPH_BENCH_STENCIL
preset the Pallas capacities and stencil
(skips the auto-grow recompiles at N where the defaults are known to
overflow, e.g. 1M+ dam-break pile-ups need col=16384 sub_blocks=80).
"""

from __future__ import annotations

import json
import os
import sys
import time
from functools import partial


def _canon(pos, *fields):
    """Order particle records by lexicographic position (multiset compare)."""
    import numpy as np

    order = np.lexsort(pos.T)
    return (pos[order],) + tuple(f[order] for f in fields)


def verify_parity(backend: str, verify_steps: int = 10, n: int = 4096) -> str:
    """On-device physics parity: timed backend vs cell_list vs NumPy oracle.
    Returns 'pass' or 'fail' (details to stderr). Semantics bar:
    /root/reference/src/simulator.cu:84-130,149-318."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from tpusph.core.config import default_config
    from tpusph.core.init import init_state
    from tpusph.engine.step import (
        BACKENDS,
        fields_from_state,
        state_from_fields,
        step_cell_list,
        step_pallas_fields,
    )

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tests"))
    from oracle_numpy import oracle_step

    cfg = default_config(n, chunk_size=min(4096, n))
    state0 = init_state(cfg)

    def chain(stepfn):
        @jax.jit
        def run(s):
            def body(s, _):
                s2, aux = stepfn(s, cfg)
                return s2, aux.window_overflow
            s2, ovf = jax.lax.scan(body, s, None, length=verify_steps)
            return s2, jnp.sum(ovf)
        return run

    if backend == "pallas_sorted":
        # verify the ACTUAL fields-native loop the bench times
        @jax.jit
        def chain_timed(s):
            def body(carry, _):
                fs, rho, prs = carry
                (fs2, rho2, p2, _), aux = step_pallas_fields(fs, cfg)
                return (fs2, rho2, p2), aux.window_overflow
            fs0 = fields_from_state(s)
            z = jnp.zeros_like(fs0.x)
            (fs2, rho2, p2), ovf = jax.lax.scan(
                body, (fs0, z, z), None, length=verify_steps
            )
            return state_from_fields(fs2, density=rho2, pressure=p2), jnp.sum(ovf)
    else:
        chain_timed = chain(BACKENDS[backend])

    ok = True

    def check(name, a, b, rtol, atol):
        nonlocal ok
        try:
            np.testing.assert_allclose(a, b, rtol=rtol, atol=atol)
        except AssertionError as e:
            ok = False
            print(f"parity FAIL [{name}]: {e}", file=sys.stderr)

    # --- K chained steps: timed backend vs cell_list, multiset-compared
    sa, ovf_a = jax.device_get(chain_timed(state0))
    sb, ovf_b = jax.device_get(chain(step_cell_list)(state0))
    if int(ovf_a) or int(ovf_b):
        print(f"parity FAIL: overflow a={int(ovf_a)} b={int(ovf_b)}", file=sys.stderr)
        ok = False
    va, vb = np.asarray(sa.valid), np.asarray(sb.valid)
    if va.sum() != vb.sum() or int(va.sum()) != cfg.num_particles:
        print("parity FAIL: particle count mismatch", file=sys.stderr)
        ok = False
    pa, ra = _canon(np.asarray(sa.position)[va], np.asarray(sa.density)[va])
    pb, rb = _canon(np.asarray(sb.position)[vb], np.asarray(sb.density)[vb])
    check(f"{backend} vs cell_list positions ({verify_steps} steps)", pa, pb,
          rtol=0, atol=1e-4)
    check(f"{backend} vs cell_list density ({verify_steps} steps)", ra, rb,
          rtol=1e-4, atol=0)

    # --- one step of cell_list vs the independent NumPy oracle
    s1, _ = jax.device_get(jax.jit(lambda s: step_cell_list(s, cfg))(state0))
    v = np.asarray(state0.valid)
    ref = oracle_step(
        np.asarray(state0.position)[v], np.asarray(state0.velocity)[v], cfg
    )
    check("cell_list vs oracle density", np.asarray(s1.density)[v],
          ref["density"], rtol=1e-4, atol=0)
    check("cell_list vs oracle positions", np.asarray(s1.position)[v],
          ref["position"], rtol=0, atol=1e-5)
    return "pass" if ok else "fail"


def verify_headline(cfg, state0, backend: str) -> str:
    """One ON-DEVICE step of the timed backend vs the independent XLA
    cell-list tile path at the HEADLINE N and the exact timed config
    (stencil/geometry/capacities), multiset-compared. Catches geometry- or
    capacity-dependent Mosaic bugs that the small-N gate cannot see (the
    fast-path/hybrid machinery only engages at production N). Returns
    'pass'/'fail'."""
    if backend != "pallas_sorted":
        return "pass"  # the timed backend IS the reference path
    import dataclasses

    import numpy as np
    import jax

    from tpusph.core.config import compiler_opts
    from tpusph.engine.step import step_cell_list, step_pallas_sorted

    # forward the config's compiler options (raised scoped-VMEM budget at
    # the 4M tier) exactly like the timed make_run does — without them the
    # gate compile OOMs scoped VMEM at capacities the preset raised the
    # budget for
    a, aux_a = jax.jit(
        lambda s: step_pallas_sorted(s, cfg), compiler_options=compiler_opts(cfg)
    )(state0)
    a, aux_a = jax.device_get((a, aux_a))
    if int(aux_a.window_overflow):
        print("headline parity FAIL: pallas overflow", file=sys.stderr)
        return "fail"
    ccfg = cfg
    for _ in range(4):
        b, aux_b = jax.jit(lambda s: step_cell_list(s, ccfg))(state0)
        b, aux_b = jax.device_get((b, aux_b))
        if int(aux_b.window_overflow) == 0:
            break
        ccfg = dataclasses.replace(
            ccfg, tile_cand_capacity=ccfg.tile_cand_capacity * 2
        )
    else:
        print("headline parity FAIL: cell_list overflow", file=sys.stderr)
        return "fail"
    va, vb = np.asarray(a.valid), np.asarray(b.valid)
    if va.sum() != vb.sum():
        print("headline parity FAIL: count mismatch", file=sys.stderr)
        return "fail"
    pa, ra = _canon(np.asarray(a.position)[va], np.asarray(a.density)[va])
    pb, rb = _canon(np.asarray(b.position)[vb], np.asarray(b.density)[vb])
    ok = True
    try:
        np.testing.assert_allclose(ra, rb, rtol=1e-4, atol=0)
        np.testing.assert_allclose(pa, pb, rtol=0, atol=1e-4)
    except AssertionError as e:
        ok = False
        print(f"headline parity FAIL: {e}", file=sys.stderr)
    return "pass" if ok else "fail"


def config_overrides(n: int, env) -> dict:
    """SimConfig overrides: measured per-N presets first, then TPUSPH_BENCH_*
    env vars on top (each env var replaces its preset piece independently).
    At N >= 1M (dense pile-up regime) the hybrid stencil's per-sub col9
    windows beat plain slab3 (v5e 1M dam-break: 14.3 vs 12.3 steps/s), the
    geometry optimum stays at 128x8 (64x16, the 262k optimum, measured
    13.7/11.6 there — wider slab windows amortize better over bigger tiles
    when every padded cell is full), and the dam-break pile-up transients
    need col=16384 sub_blocks=80 — preset so the bench never pays the
    auto-grow recompile loop at 1M."""
    from tpusph.core.config import tuned_overrides

    kw = tuned_overrides(n)
    # env vars override any preset piece independently
    if env.get("TPUSPH_BENCH_COL_CAP"):
        kw["pallas_col_capacity"] = int(env["TPUSPH_BENCH_COL_CAP"])
    if env.get("TPUSPH_BENCH_SUB_BLOCKS"):
        kw["pallas_sub_blocks"] = int(env["TPUSPH_BENCH_SUB_BLOCKS"])
    if env.get("TPUSPH_BENCH_STENCIL"):
        kw["pallas_stencil"] = env["TPUSPH_BENCH_STENCIL"]
    if env.get("TPUSPH_BENCH_TILE"):
        kw["pallas_tile"] = int(env["TPUSPH_BENCH_TILE"])
    if env.get("TPUSPH_BENCH_GROUP"):
        kw["pallas_group"] = int(env["TPUSPH_BENCH_GROUP"])
    if env.get("TPUSPH_BENCH_BLOCK_LANES"):
        kw["pallas_block_lanes"] = int(env["TPUSPH_BENCH_BLOCK_LANES"])
    if env.get("TPUSPH_BENCH_DESC"):
        kw["pallas_desc"] = env["TPUSPH_BENCH_DESC"] == "1"
        if not kw["pallas_desc"]:
            kw.pop("pallas_desc_unroll", None)
            kw.pop("pallas_desc_unroll_force", None)
    if env.get("TPUSPH_BENCH_DESC_UNROLL"):
        kw["pallas_desc_unroll"] = int(env["TPUSPH_BENCH_DESC_UNROLL"])
        kw["pallas_desc"] = True
    if env.get("TPUSPH_BENCH_STREAM"):
        kw["pallas_stream_desc"] = env["TPUSPH_BENCH_STREAM"] == "1"
    # raised scoped-VMEM stack budget (xla_tpu_scoped_vmem_limit_kib,
    # forwarded per-compile — XLA_FLAGS can't carry TPU-only flag names):
    # 4M-class candidate buffers (16 rows x 9 windows x 32768 lanes =
    # 18 MiB) exceed the 16 MiB v5e default
    if env.get("TPUSPH_SCOPED_VMEM_KIB"):
        kw["pallas_scoped_vmem_kib"] = int(env["TPUSPH_SCOPED_VMEM_KIB"])
    return kw


def verify_dist_parity(sim, cfg, state0_host, gate_steps: int = 3) -> str:
    """ON-DEVICE physics parity for the sharded engine AT THE TIMED N: run
    `gate_steps` sharded steps from the timed initial state, collect by pid
    (the sharded engine preserves global particle identity), and compare
    per-particle against the independent single-chip XLA cell-list chain
    from the same init — the dist analog of verify_headline (catches
    geometry/capacity/halo bugs that small-N CPU tests cannot see).
    Restores sim.state. Returns 'pass'/'fail'."""
    import dataclasses

    import numpy as np
    import jax

    from tpusph.core.config import compiler_opts
    from tpusph.engine.step import step_cell_list

    saved = sim.state
    sim.run(gate_steps)
    got = sim.get_position()  # ordered by pid == original slot index
    sim.state = saved

    ccfg = cfg
    for _ in range(4):
        @partial(jax.jit, compiler_options=compiler_opts(ccfg))
        def chain(s, ccfg=ccfg):
            def body(s, _):
                s2, aux = step_cell_list(s, ccfg)
                return s2, aux.window_overflow
            import jax.numpy as jnp

            s2, ovf = jax.lax.scan(body, s, None, length=gate_steps)
            return s2, jnp.sum(ovf)

        ref, ovf = jax.device_get(chain(state0_host))
        if int(ovf) == 0:
            break
        ccfg = dataclasses.replace(
            ccfg, tile_cand_capacity=ccfg.tile_cand_capacity * 2
        )
    else:
        print("dist parity FAIL: cell_list overflow", file=sys.stderr)
        return "fail"
    ref_pos = np.asarray(ref.position)[: cfg.num_particles]
    try:
        np.testing.assert_allclose(got, ref_pos, rtol=0, atol=1e-4)
    except AssertionError as e:
        print(f"dist parity FAIL [positions, {gate_steps} steps]: {e}",
              file=sys.stderr)
        return "fail"
    return "pass"


def main_dist() -> None:
    """Sharded-engine bench mode (TPUSPH_BENCH_DIST=<ndev>): the scan-chained
    multi-chip production loop, ONE dispatch for the whole run, held to the
    single-chip bench's rigor — an ON-DEVICE physics parity gate at the
    timed N (sharded chain vs the independent XLA cell-list chain, per-pid
    compared; TPUSPH_BENCH_VERIFY=0 skips) plus conservation/overflow
    hard-fails inside run(). Emits the JSON line AND writes it with its
    capacity provenance to DIST_BENCH.json.

    Capacities: measured, not guessed — default_dist_config's slack-2.0
    start is right-sized from a 10-step warmup's utilization stats
    (DistSimulator.right_size; oversized slack costs real sort width:
    15.4 → 11.6 ms at 262k mesh-1 for 2.0 → 1.25). Set
    TPUSPH_BENCH_DIST_SLACK to pin a hand slack instead.

    On this 1-chip host ndev=1 runs the sharded engine end to end on the
    real TPU (shard_map + pid tagging + the degenerate-mesh elisions);
    ndev>1 needs XLA_FLAGS=--xla_force_host_platform_device_count=<ndev>
    for a CPU functional smoke — the same code path is the real multi-chip
    bench when hardware shows up."""
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    from tpusph.core.config import default_config
    from tpusph.core.init import init_state, lattice_capacity
    from tpusph.dist.simulator import DistSimulator, default_dist_config

    ndev = int(os.environ["TPUSPH_BENCH_DIST"])
    n = int(os.environ.get("TPUSPH_BENCH_N", 262_144))
    steps = int(os.environ.get("TPUSPH_BENCH_STEPS", 100))
    devices = jax.devices()
    if len(devices) < ndev:
        print(
            f"need {ndev} devices, have {len(devices)} — set XLA_FLAGS="
            f"--xla_force_host_platform_device_count={ndev} for a CPU smoke",
            file=sys.stderr,
        )
        raise SystemExit(2)
    cfg = default_config(n, **config_overrides(n, os.environ))
    random_init = os.environ.get("TPUSPH_BENCH_INIT") == "random"
    if n > lattice_capacity(cfg) and not random_init:
        print(f"dist bench: N={n} exceeds the grid-lattice ceiling — using "
              "random init", file=sys.stderr)
        random_init = True

    slack_env = os.environ.get("TPUSPH_BENCH_DIST_SLACK")
    dcfg = None
    if slack_env:
        dcfg = default_dist_config(cfg, ndev, slack=float(slack_env))
    sim = DistSimulator(
        cfg, devices=devices[:ndev], dcfg=dcfg, random_init=random_init
    )
    sim.setup()
    state0_host = init_state(cfg, random_init=random_init)

    parity = "skipped"
    if os.environ.get("TPUSPH_BENCH_VERIFY", "1") != "0":
        parity = verify_dist_parity(sim, cfg, state0_host)

    right_sized = False
    if not slack_env:
        sim.right_size(warmup_steps=10)  # restores the initial state
        right_sized = True

    state0 = sim.state
    # warmup: compile the full scan-chain program AND settle capacities on
    # the exact trajectory (the timed run must be a pure cache hit — the
    # 100-step compile costs minutes through the remote-compile relay)
    sim.run(steps)
    sim.state = state0
    t0 = time.perf_counter()
    sim.run(steps)  # one dispatch
    dt = time.perf_counter() - t0
    line = {
        "metric": f"sph_dist_timesteps_per_sec_n{n}_d{ndev}",
        "value": round(steps / dt, 3),
        "unit": "timesteps/s",
        "vs_baseline": round(steps / dt / 100.0, 4),
        "parity": parity,
    }
    print(json.dumps(line))
    artifact = dict(line)
    artifact.update(
        steps=steps,
        backend="pallas" if sim.use_pallas else "xla",
        dev_capacity=sim.dcfg.dev_capacity,
        halo_capacity=sim.dcfg.halo_capacity,
        migration_capacity=sim.dcfg.migration_capacity,
        right_sized=right_sized,
        slack=(float(slack_env) if slack_env else None),
    )
    # the full-machinery diagnostic run (TPUSPH_DIST_FULL_MACHINERY=1 —
    # mesh-1 with the degenerate-mesh elisions disabled) gets its own
    # artifact so it never shadows the production number
    name = (
        "DIST_BENCH_FULL"
        if os.environ.get("TPUSPH_DIST_FULL_MACHINERY") == "1"
        else "DIST_BENCH"
    )
    if n != 262_144:  # non-headline tiers get their own artifact
        name += f"_n{n}"
    name += ".json"
    artifact["full_machinery"] = (
        os.environ.get("TPUSPH_DIST_FULL_MACHINERY") == "1"
    )
    # tests point this at a tmp dir so smoke runs don't litter the repo root
    art_dir = os.environ.get("TPUSPH_BENCH_ARTIFACT_DIR") or os.path.dirname(
        os.path.abspath(__file__)
    )
    with open(os.path.join(art_dir, name), "w") as f:
        json.dump(artifact, f, indent=1)


def main() -> None:
    if os.environ.get("TPUSPH_BENCH_DIST"):
        main_dist()
        return
    import jax

    # persistent compile cache: the 100-step scan program compiles once per
    # kernel revision (~minutes through the remote-compile relay), then loads
    # in seconds on every subsequent bench run
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    import jax.numpy as jnp

    from tpusph.core.config import compiler_opts, default_config
    from tpusph.core.init import init_state
    from tpusph.engine.step import (
        BACKENDS,
        fields_from_state,
        step_pallas_fields,
    )

    n = int(os.environ.get("TPUSPH_BENCH_N", 262_144))
    steps = int(os.environ.get("TPUSPH_BENCH_STEPS", 100))
    backend = os.environ.get("TPUSPH_BENCH_BACKEND", "pallas_sorted")
    on_tpu = jax.default_backend() not in ("cpu",)
    if not on_tpu and backend == "pallas_sorted":
        backend = "cell_list"  # Pallas compiled path needs TPU

    cfg = default_config(n, **config_overrides(n, os.environ))
    # capacities grown on overflow below

    def make_run(cfg):
        copts = compiler_opts(cfg)
        if backend == "pallas_sorted":
            # fields-native loop: state stays as 1-D field rows across steps
            @partial(jax.jit, compiler_options=copts)
            def run(state):
                def body(fs, _):
                    (fs2, _, _, _), aux = step_pallas_fields(fs, cfg)
                    return fs2, aux.window_overflow
                fs2, ovf = jax.lax.scan(
                    body, fields_from_state(state), None, length=steps
                )
                return fs2, jnp.sum(ovf)
        else:
            step = BACKENDS[backend]

            @partial(jax.jit, compiler_options=copts)
            def run(state):
                def body(s, _):
                    s2, aux = step(s, cfg)
                    return s2, aux.window_overflow
                s2, ovf = jax.lax.scan(body, state, None, length=steps)
                return s2, jnp.sum(ovf)

        return run

    # TPUSPH_BENCH_INIT=random for N past the grid-init ceiling (the 0.9h
    # lattice caps at 1.29M particles in the 10^3 box — reference
    # simulator.cu:438-453 semantics); past the ceiling the fallback is
    # automatic so `TPUSPH_BENCH_N=2097152 python bench.py` just works
    from tpusph.core.init import lattice_capacity

    lattice_cap = lattice_capacity(cfg)
    random_init = os.environ.get("TPUSPH_BENCH_INIT") == "random"
    if n > lattice_cap and not random_init:
        print(f"bench: N={n} exceeds the {lattice_cap} grid-lattice ceiling "
              "— using random init", file=sys.stderr)
        random_init = True
    state0 = init_state(cfg, random_init=random_init)

    parity = "skipped"
    if os.environ.get("TPUSPH_BENCH_VERIFY", "1") != "0":
        parity = verify_parity(backend)
        if parity == "pass":
            # the gate must cover the configuration it reports: one step at
            # the headline N with the exact timed config
            parity = verify_headline(cfg, state0, backend)

    # warmup: compile + verify capacity holds over the full horizon
    for _ in range(6):
        run = make_run(cfg)
        _, ovf = run(state0)
        if int(jax.device_get(ovf)) == 0:
            break
        import dataclasses

        cfg = dataclasses.replace(
            cfg,
            pallas_col_capacity=cfg.pallas_col_capacity * 2,
            pallas_sub_blocks=cfg.pallas_sub_blocks * 2,
            pallas_qrank_kcap=cfg.pallas_qrank_kcap * 2,
            tile_cand_capacity=cfg.tile_cand_capacity * 2,
        )
        print(
            f"capacity overflow; growing to col={cfg.pallas_col_capacity} "
            f"sub_blocks={cfg.pallas_sub_blocks}",
            file=sys.stderr,
        )
    else:
        print("warning: capacity growth did not converge", file=sys.stderr)

    t0 = time.perf_counter()
    final, ovf = run(state0)
    jax.device_get(ovf)
    dt = time.perf_counter() - t0

    steps_per_sec = steps / dt
    target = 100.0  # BASELINE.json north star
    print(
        json.dumps(
            {
                "metric": f"sph_timesteps_per_sec_n{n}",
                "value": round(steps_per_sec, 3),
                "unit": "timesteps/s",
                "vs_baseline": round(steps_per_sec / target, 4),
                "parity": parity,
            }
        )
    )


if __name__ == "__main__":
    main()
