"""Benchmark: batched env-steps/s on MiniGrid-Empty-8x8-v0.

Measures the full production path — auto-resetting step including the
egocentric observation encode, rolled out on device — and prints one JSON
line:

    {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Three engine paths (--path):
  * vmap   — `core.rollout.build_rollout`: vmap-over-envs PyTree layout.
  * packed — `ops.fused_rollout.build_packed_xla_rollout`: batch-in-lanes
             packed layout under lax.scan (the default where supported).
  * pallas — `ops.fused_rollout.build_fused_rollout`: the single-kernel
             Pallas backend (state resident in VMEM across steps).
All three are step-for-step equivalent under the same key
(tests/test_fused_rollout.py); `auto` picks packed where the env supports
it and falls back to vmap.

`vs_baseline`: the reference publishes no numbers (BASELINE.md); the
comparison point is 3,000 env-steps/s, the top of the externally reported
1–3K steps/s range for pure-Python MiniGrid-class envs on one CPU core
(NAVIX, arXiv:2407.19396).
"""

from __future__ import annotations

import argparse
import json
import time

import jax

# Persistent compile cache: the packed rollout's XLA:TPU compile is minutes
# (the scan body itself is seconds; the cost is the surrounding
# prepare/finish programs on the tunneled backend) — cache executables
# across bench invocations so only the first run pays it.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

import minigrid_tpu
from minigrid_tpu.core.rollout import build_rollout
from minigrid_tpu.ops.fused_rollout import (
    build_fused_rollout,
    build_packed_xla_rollout,
    fused_rollout_supported,
)

REFERENCE_STEPS_PER_SEC = 3_000.0  # pure-Python MiniGrid, 1 CPU core (external)

# Round-4 lesson (VERDICT.md): selecting the engine by string-comparing
# `jax.default_backend() == "tpu"` silently routed the driver's capture
# onto the packed XLA twin (~208M steps/s) instead of the Pallas kernel
# (~500M) — a 2.5x scoreboard under-report with no trace in the artifact.
# Probe the real capability instead (utils/platform.py), and record the
# resolved path in the JSON line.
from minigrid_tpu.utils.platform import mosaic_available


def pick_path(env, requested: str, mode: str) -> str:
    if requested != "auto":
        return requested
    if not fused_rollout_supported(env, mode=mode):
        return "vmap"
    # The Pallas kernel (state resident in VMEM across steps) wins on real
    # TPU hardware; the packed XLA twin is the portable fast path.  Decide
    # by probing Mosaic, not by matching the backend name (see above).
    return "pallas" if mosaic_available() else "packed"


# Provenance for the driver artifact: which engine/backend/surface the
# number actually measured, plus raw per-iteration seconds.  Filled by the
# run_* functions, merged into the printed JSON line by main().
PROV: dict = {}


def _prov(path: str, **extra) -> None:
    PROV.update(
        path=path,
        backend=jax.default_backend(),
        device=jax.devices()[0].device_kind,
        **extra,
    )


def build(
    env, path: str, num_steps: int, mode: str, as_carry: bool = False,
    regen_chunk: int = 32, refresh_block=None, lane_block=None,
):
    if path == "vmap":
        if as_carry:
            raise ValueError("--carry needs a packed path (packed/pallas)")
        return build_rollout(env, num_steps=num_steps, autoreset_mode=mode)
    if path == "packed":
        return build_packed_xla_rollout(
            env, num_steps=num_steps, mode=mode, as_carry=as_carry,
            regen_chunk=regen_chunk, refresh_block=refresh_block,
        )
    if path == "pallas":
        return build_fused_rollout(
            env, num_steps=num_steps, mode=mode, as_carry=as_carry,
            regen_chunk=regen_chunk, refresh_block=refresh_block,
            lane_block=lane_block,
        )
    raise ValueError(f"unknown path {path!r}")


def run(
    env_id: str,
    batch_size: int,
    num_steps: int,
    iters: int,
    path: str,
    mode: str,
    carry: bool = False,
    regen_chunk: int = 32,
    refresh_block=None,
    lane_block=None,
) -> float:
    env = minigrid_tpu.make(env_id)
    path = pick_path(env, path, mode)
    if carry and path == "vmap":
        carry = False  # vmap has no packed carry; measure the plain surface
    _prov(path, surface="carry" if carry else "rollout")

    key = jax.random.PRNGKey(0)
    key, k_reset = jax.random.split(key)
    states, _ = jax.jit(env.reset_batch, static_argnums=1)(k_reset, batch_size)

    def fence(states, metrics):
        # Force full materialization with actual host fetches —
        # block_until_ready alone has proven unreliable on tunneled
        # backends for timing purposes.
        return float(metrics.total_reward) + float(jnp.sum(states.step_count))

    if carry:
        # Steady-state surface: a production loop calls the rollout
        # back-to-back, so the one-time packed_init (pack + template
        # generation) is excluded and each timed call runs only the
        # kernel + action stream (ops/fused_rollout.py carry API).
        from minigrid_tpu.ops.fused_rollout import R_SC, packed_init

        step = jax.jit(
            build(env, path, num_steps, mode, as_carry=True,
                  regen_chunk=regen_chunk, refresh_block=refresh_block,
                  lane_block=lane_block)
        )
        c = jax.jit(lambda s: packed_init(env, s, mode))(states)

        def fence_c(c, metrics):
            return float(metrics.total_reward) + float(jnp.sum(c.regs[R_SC]))

        c, metrics = step(key, c)  # compile + warm up
        fence_c(c, metrics)
        best = 0.0
        for i in range(iters):
            key = jax.random.fold_in(key, i)
            t0 = time.perf_counter()
            c, metrics = step(key, c)
            fence_c(c, metrics)
            dt = time.perf_counter() - t0
            PROV.setdefault("iter_secs", []).append(round(dt, 4))
            best = max(best, batch_size * num_steps / dt)
        return best

    rollout = jax.jit(
        build(env, path, num_steps, mode,
              regen_chunk=regen_chunk, refresh_block=refresh_block,
              lane_block=lane_block)
    )

    # Compile + warm up.
    states, metrics = rollout(key, states)
    fence(states, metrics)

    best = 0.0
    for i in range(iters):
        key = jax.random.fold_in(key, i)
        t0 = time.perf_counter()
        states, metrics = rollout(key, states)
        fence(states, metrics)
        dt = time.perf_counter() - t0
        PROV.setdefault("iter_secs", []).append(round(dt, 4))
        best = max(best, batch_size * num_steps / dt)
    return best


def run_train(
    env_id: str, batch_size: int, num_steps: int, iters: int, path: str,
    mode: str, time_chunk: int = 4,
) -> float:
    """env-steps/s through the FULL training loop: packed simulation +
    actor-critic inference + loss + optimizer update in one jitted program
    (parallel/train.py). path='vmap' uses the PyTree train step."""
    from minigrid_tpu.parallel.sharding import make_env_mesh, shard_states
    from minigrid_tpu.parallel.train import (
        build_packed_train_step,
        build_train_step,
        init_train_state,
    )

    from minigrid_tpu.ops.policy_rollout import policy_rollout_supported

    env = minigrid_tpu.make(env_id)
    mesh = make_env_mesh()
    if path == "auto":
        if not fused_rollout_supported(env, mode=mode):
            path = "vmap"
        elif mosaic_available() and policy_rollout_supported(
            env, mode, collect=True
        ):
            path = "pallas"
        else:
            path = "packed"
    if path == "pallas" and not policy_rollout_supported(
        env, mode, collect=True
    ):
        print("# --train --path pallas: fused train rollout unsupported for "
              f"{env_id} mode={mode}; using the packed XLA train step")
        path = "packed"
    _prov(path, surface="train")

    key = jax.random.PRNGKey(0)
    key, k_env, k_model = jax.random.split(key, 3)
    ts = init_train_state(k_model, env, mesh)
    states, _ = jax.jit(env.reset_batch, static_argnums=1)(k_env, batch_size)
    states = shard_states(states, mesh)

    if path == "pallas":
        # Fully fused train step: policy-in-kernel rollout with trajectory
        # spill, over the steady PackedCarry surface.
        from minigrid_tpu.ops.fused_rollout import packed_init
        from minigrid_tpu.parallel.train import build_fused_train_step

        step = build_fused_train_step(
            env, mesh, num_steps=num_steps, mode=mode, time_chunk=time_chunk
        )
        carry = jax.jit(lambda s: packed_init(env, s, mode))(states)
        ts, carry, metrics = step(ts, carry, key)  # compile + warm up
        float(metrics["loss"])
        best = 0.0
        for i in range(iters):
            key = jax.random.fold_in(key, i)
            t0 = time.perf_counter()
            ts, carry, metrics = step(ts, carry, key)
            float(metrics["loss"])
            dt = time.perf_counter() - t0
            PROV.setdefault("iter_secs", []).append(round(dt, 4))
            best = max(best, batch_size * num_steps / dt)
        return best

    if path == "vmap":
        step = build_train_step(
            env, mesh, num_steps=num_steps, mode=mode, time_chunk=time_chunk
        )
    else:
        step = build_packed_train_step(
            env, mesh, num_steps=num_steps, mode=mode, time_chunk=time_chunk
        )

    ts, states, metrics = step(ts, states, key)  # compile + warm up
    float(metrics["loss"])

    best = 0.0
    for i in range(iters):
        key = jax.random.fold_in(key, i)
        t0 = time.perf_counter()
        ts, states, metrics = step(ts, states, key)
        float(metrics["loss"])
        dt = time.perf_counter() - t0
        PROV.setdefault("iter_secs", []).append(round(dt, 4))
        best = max(best, batch_size * num_steps / dt)
    return best


def run_policy_eval(
    env_id: str, batch_size: int, num_steps: int, iters: int, path: str,
    mode: str,
) -> float:
    """env-steps/s with the ACTOR in the loop (policy-in-kernel evaluation
    rollout, ops/policy_rollout.py) on the steady carry surface."""
    from minigrid_tpu.ops.fused_rollout import R_SC, packed_init
    from minigrid_tpu.ops.policy_rollout import build_policy_eval_rollout
    from minigrid_tpu.parallel.train import init_train_state, make_model
    from minigrid_tpu.parallel.sharding import make_env_mesh

    env = minigrid_tpu.make(env_id)
    mesh = make_env_mesh()
    if path in ("auto", "vmap"):
        path = "pallas" if mosaic_available() else "xla"
    if path == "packed":
        path = "xla"
    _prov(path, surface="policy_eval")
    key = jax.random.PRNGKey(0)
    key, k_env, k_model = jax.random.split(key, 3)
    params = init_train_state(k_model, env, mesh).params
    states, _ = jax.jit(env.reset_batch, static_argnums=1)(k_env, batch_size)
    step = jax.jit(
        build_policy_eval_rollout(
            env, params, num_steps, mode=mode, backend=path, as_carry=True
        )
    )
    c = jax.jit(lambda s: packed_init(env, s, mode))(states)

    def fence(c, metrics):
        return float(metrics.total_reward) + float(jnp.sum(c.regs[R_SC]))

    c, metrics = step(key, c)  # compile + warm
    fence(c, metrics)
    best = 0.0
    for i in range(iters):
        key = jax.random.fold_in(key, i)
        t0 = time.perf_counter()
        c, metrics = step(key, c)
        fence(c, metrics)
        dt = time.perf_counter() - t0
        PROV.setdefault("iter_secs", []).append(round(dt, 4))
        best = max(best, batch_size * num_steps / dt)
    return best


def run_mixed_policy_eval(
    env_ids: str, batch_size: int, num_steps: int, iters: int, path: str,
    mode: str,
) -> float:
    """env-steps/s on a heterogeneous batch with each member family's OWN
    actor fused into its step kernel (parallel.mixed.build_mixed_policy_eval;
    steady carry surface)."""
    from minigrid_tpu.models.policy import ActorCritic
    from minigrid_tpu.ops.fused_rollout import packed_init
    from minigrid_tpu.parallel.mixed import build_mixed_policy_eval

    ids = [e.strip() for e in env_ids.split(",")]
    per = batch_size // len(ids)
    key = jax.random.PRNGKey(0)
    key, k_reset = jax.random.split(key)
    params = []
    envs = [minigrid_tpu.make(e) for e in ids]
    for i, env in enumerate(envs):
        v = env.config.agent_view_size
        model = ActorCritic(num_actions=env.num_actions)
        params.append(
            model.init(
                jax.random.fold_in(key, 100 + i),
                jnp.zeros((1, v, v, 3), jnp.uint8),
            )
        )
    carries = tuple(
        jax.jit(lambda s, e=e: packed_init(e, s, mode))(
            jax.jit(e.reset_batch, static_argnums=1)(
                jax.random.fold_in(k_reset, i), per
            )[0]
        )
        for i, e in enumerate(envs)
    )
    backend = "pallas" if mosaic_available() else "xla"
    if path in ("packed", "xla"):
        backend = "xla"
    step = build_mixed_policy_eval(ids, params, num_steps, mode=mode,
                                   backend=backend)
    _prov(backend, surface="mixed_policy_eval")

    def fence(metrics):
        return float(metrics.total_reward) + int(metrics.total_steps)

    carries, metrics = step(key, carries)  # compile + warm
    fence(metrics)
    best = 0.0
    n = per * len(ids)
    for i in range(iters):
        key = jax.random.fold_in(key, i)
        t0 = time.perf_counter()
        carries, metrics = step(key, carries)
        fence(metrics)
        dt = time.perf_counter() - t0
        PROV.setdefault("iter_secs", []).append(round(dt, 4))
        best = max(best, n * num_steps / dt)
    return best


def run_mixed(
    env_ids: str, batch_size: int, num_steps: int, iters: int, path: str,
    mode: str, carry: bool = False,
) -> float:
    """env-steps/s on a heterogeneous batch (BASELINE config #5): the batch
    splits evenly across the comma-separated families. path='vmap' steps the
    lax.switch MixedEnv; otherwise one packed lane block per family.
    `carry` measures the steady-state surface (packed_init per member once,
    then kernel-only calls)."""
    from minigrid_tpu.parallel.mixed import (
        MixedEnv,
        build_mixed_rollout,
        build_packed_mixed_rollout,
    )
    from minigrid_tpu.parallel.sharding import make_env_mesh, shard_states

    ids = [e.strip() for e in env_ids.split(",")]
    mesh = make_env_mesh()
    key = jax.random.PRNGKey(0)
    key, k_reset = jax.random.split(key)

    if path == "vmap":
        menv = MixedEnv.create(ids)
        member_ids = jnp.arange(batch_size, dtype=jnp.int32) % len(ids)
        states, _ = jax.jit(menv.reset_batch)(k_reset, member_ids)
        states = shard_states(states, mesh)
        rollout = build_mixed_rollout(menv, num_steps, mesh)
    else:
        per = batch_size // len(ids)
        states = tuple(
            shard_states(
                jax.jit(
                    minigrid_tpu.make(e).reset_batch, static_argnums=1
                )(jax.random.fold_in(k_reset, i), per)[0],
                mesh,
            )
            for i, e in enumerate(ids)
        )
        backend = "pallas" if mosaic_available() else "packed"
        rollout = build_packed_mixed_rollout(
            ids, num_steps, mesh=mesh, mode=mode, backend=backend,
            as_carry=carry,
        )
        if carry:
            from minigrid_tpu.ops.fused_rollout import packed_init
            from minigrid_tpu.parallel.packed import shard_carry

            states = tuple(
                shard_carry(
                    jax.jit(
                        lambda s, e=e: packed_init(
                            minigrid_tpu.make(e), s, mode
                        )
                    )(st),
                    mesh,
                )
                for e, st in zip(ids, states)
            )
        batch_size = per * len(ids)

    _prov(
        path if path == "vmap" else backend,
        surface="mixed_carry" if (carry and path != "vmap") else "mixed",
    )

    def fence(metrics):
        return float(metrics.total_reward) + int(metrics.total_steps)

    states, metrics = rollout(key, states)  # compile + warm up
    fence(metrics)
    best = 0.0
    for i in range(iters):
        key = jax.random.fold_in(key, i)
        t0 = time.perf_counter()
        states, metrics = rollout(key, states)
        fence(metrics)
        dt = time.perf_counter() - t0
        PROV.setdefault("iter_secs", []).append(round(dt, 4))
        best = max(best, batch_size * num_steps / dt)
    return best


def emit(metric: str, value: float, mode: str) -> None:
    """Print the one-line JSON record, including full provenance: which
    engine (`path`), backend platform, device kind, measured surface, and
    the raw per-iteration seconds — so a scoreboard anomaly like round 4's
    (packed twin silently measured instead of the kernel) is diagnosable
    from the artifact alone."""
    rec = {
        "metric": metric,
        "value": round(value, 1),
        "unit": "steps/s",
        "vs_baseline": round(value / REFERENCE_STEPS_PER_SEC, 2),
        "mode": mode,
        **PROV,
    }
    print(json.dumps(rec))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--env-id", default="MiniGrid-Empty-8x8-v0")
    p.add_argument("--batch-size", type=int, default=2097152)
    p.add_argument("--num-steps", type=int, default=256)
    p.add_argument("--iters", type=int, default=5)
    p.add_argument(
        "--path", default="auto", choices=["auto", "vmap", "packed", "pallas"]
    )
    p.add_argument(
        "--mode",
        default="regen",
        choices=["regen", "cached"],
        help="auto-reset mode; 'cached' unlocks the packed engines on every "
        "family except dynamicobstacles (see ops/fused_rollout.py)",
    )
    p.add_argument(
        "--carry",
        action=argparse.BooleanOptionalAction,
        default=True,
        help="measure the steady-state carry surface (packed_init once, "
        "then kernel-only calls — the number a production loop actually "
        "sees; the default). --no-carry measures the legacy "
        "rollout(key, states) surface, which re-packs, re-generates the "
        "auto-reset template, and unpacks every call",
    )
    p.add_argument(
        "--regen-chunk", type=int, default=32,
        help="regen-mode template-refresh chunk length (exact for any "
        "value; larger amortizes per-chunk refresh overhead)",
    )
    p.add_argument(
        "--refresh-block", type=int, default=None,
        help="compacted template-regeneration slice size (default B/8)",
    )
    p.add_argument(
        "--lane-block", type=int, default=None,
        help="pallas kernel lanes per batch block (default min(512, VMEM "
        "auto); (1, block) rows fill whole (8,128) vregs at multiples of "
        "1024)",
    )
    p.add_argument(
        "--train",
        action="store_true",
        help="bench the full train step (rollout + actor-critic + update) "
        "instead of the plain rollout",
    )
    p.add_argument(
        "--time-chunk", type=int, default=4,
        help="--train: gradient-accumulation time-chunk length "
        "(parallel/train._trajectory_grads)",
    )
    p.add_argument(
        "--policy-eval",
        action="store_true",
        help="bench the policy-in-kernel evaluation rollout (actor fused "
        "into the step kernel, ops/policy_rollout.py) instead of the "
        "random-policy rollout",
    )
    p.add_argument(
        "--mixed",
        default=None,
        metavar="ID1,ID2,...",
        help="bench a heterogeneous batch split evenly across these env ids "
        "(BASELINE config #5); --path vmap = lax.switch MixedEnv, otherwise "
        "one packed lane block per family",
    )
    args = p.parse_args()

    if args.mixed and args.policy_eval:
        steps_per_sec = run_mixed_policy_eval(
            args.mixed, args.batch_size, args.num_steps, args.iters,
            args.path, args.mode,
        )
        emit(
            f"mixed_policy_eval_env_steps_per_sec[{args.mixed} "
            f"B={args.batch_size}]",
            steps_per_sec,
            args.mode,
        )
        return

    if args.mixed:
        steps_per_sec = run_mixed(
            args.mixed, args.batch_size, args.num_steps, args.iters,
            args.path, args.mode, carry=args.carry and args.path != "vmap",
        )
        mtag = "steady_" if args.carry and args.path != "vmap" else ""
        emit(
            f"{mtag}mixed_env_steps_per_sec[{args.mixed} "
            f"B={args.batch_size}]",
            steps_per_sec,
            args.mode,
        )
        return

    if args.policy_eval:
        steps_per_sec = run_policy_eval(
            args.env_id, args.batch_size, args.num_steps, args.iters,
            args.path, args.mode,
        )
        emit(
            f"policy_eval_env_steps_per_sec[{args.env_id} "
            f"B={args.batch_size}]",
            steps_per_sec,
            args.mode,
        )
        return

    if args.train:
        steps_per_sec = run_train(
            args.env_id, args.batch_size, args.num_steps, args.iters,
            args.path, args.mode, time_chunk=args.time_chunk,
        )
    else:
        steps_per_sec = run(
            args.env_id, args.batch_size, args.num_steps, args.iters,
            args.path, args.mode, carry=args.carry,
            regen_chunk=args.regen_chunk, refresh_block=args.refresh_block,
            lane_block=args.lane_block,
        )
    tag = "train_" if args.train else ""
    if args.carry and not args.train:
        tag = "steady_" + tag
    emit(
        f"{tag}env_steps_per_sec[{args.env_id} B={args.batch_size}]",
        steps_per_sec,
        args.mode,
    )


if __name__ == "__main__":
    main()
