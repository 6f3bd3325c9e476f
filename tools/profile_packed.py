"""Per-stage cost attribution for the packed Pallas rollout kernel.

The kernel is one fused `pallas_call`, so `jax.profiler` traces show a
single opaque op; to attribute time BETWEEN the step's stages we instead
rebuild the kernel with individual stages ablated (`_step_core`'s
`ablate` switch) and difference the runtimes:

    stage cost ≈ t(full) − t(full minus stage)

Stages (see `_step_core`):
  roll      — the post-move agent-re-centering rolls (4× `_roll_static`
              of the (HW, B) grid + 4 selects) — O(8·HW·B)/step
  fwdwrite  — forward-cell write-back (iota mask + where) — O(2·HW·B)
  reset     — template auto-reset select — O(HW·B)
  obs       — egocentric view read + occlusion flood + checksum —
              O(4V²·B) + O(V²·B) flood

Usage:  python tools/profile_packed.py [--env-id ID] [--batch-size B]
            [--num-steps T] [--trace DIR]

`--trace DIR` additionally wraps one full-kernel run in
`jax.profiler.trace(DIR)` for perfetto inspection.

Findings are recorded in BASELINE.md ("Large-grid packed-engine
profile").
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import minigrid_tpu
from minigrid_tpu.ops.fused_rollout import build_fused_rollout


def _time_rollout(env, batch_size, num_steps, iters, ablate, surface="carry"):
    """Best-of-`iters` seconds per rollout call.

    surface="carry" times the steady-state surface (`packed_init` ONCE
    outside the loop, then kernel-only `step(key, carry)` calls) so stage
    shares are relative to KERNEL time; surface="legacy" times the
    `rollout(key, states)` surface whose per-call prepare (template
    `vmap(generate)` + pack/roll/unpack) dominates on procedural families
    — reported separately as "legacy prepare overhead"."""
    from minigrid_tpu.ops.fused_rollout import packed_init

    key = jax.random.PRNGKey(0)
    states = jax.vmap(lambda k: env.generate(k, env.config))(
        jax.random.split(key, batch_size)
    )

    def fence_metrics(metrics):
        # Actual host fetches — block_until_ready alone has proven
        # unreliable on tunneled backends for timing purposes (bench.py).
        return float(metrics.total_reward) + int(metrics.obs_checksum)

    if surface == "carry":
        step = jax.jit(
            build_fused_rollout(
                env, num_steps, mode="cached", _ablate=frozenset(ablate),
                as_carry=True,
            )
        )
        carry = jax.jit(lambda s: packed_init(env, s, "cached"))(states)
        carry, m = step(key, carry)
        fence_metrics(m)  # compile + warm
        best = float("inf")
        for i in range(iters):
            k = jax.random.fold_in(key, i)
            t0 = time.perf_counter()
            carry, m = step(k, carry)
            fence_metrics(m)
            best = min(best, time.perf_counter() - t0)
        return best

    rollout = jax.jit(
        build_fused_rollout(env, num_steps, mode="cached", _ablate=frozenset(ablate))
    )

    def fence(out):
        st, metrics = out
        return fence_metrics(metrics) + float(jnp.sum(st.step_count))

    fence(rollout(key, states))  # compile + warm
    best = float("inf")
    for i in range(iters):
        k = jax.random.fold_in(key, i)
        t0 = time.perf_counter()
        fence(rollout(k, states))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--env-id", default="MiniGrid-MultiRoom-N4-S5-v0")
    p.add_argument("--batch-size", type=int, default=32768)
    p.add_argument("--num-steps", type=int, default=256)
    p.add_argument("--iters", type=int, default=5)
    p.add_argument("--trace", default=None, metavar="DIR")
    args = p.parse_args()

    env = minigrid_tpu.make(args.env_id)
    cfg = env.config
    steps = args.batch_size * args.num_steps

    t_full = _time_rollout(env, args.batch_size, args.num_steps, args.iters, ())
    print(
        f"{args.env_id}  {cfg.width}x{cfg.height} (HW={cfg.width*cfg.height})"
        f"  B={args.batch_size}  T={args.num_steps}  [steady carry surface]"
    )
    print(f"{'full kernel':<28} {t_full*1e3:8.2f} ms   "
          f"{steps/t_full/1e6:8.1f} M steps/s")
    t_legacy = _time_rollout(
        env, args.batch_size, args.num_steps, args.iters, (), surface="legacy"
    )
    print(f"{'legacy surface (1 call)':<28} {t_legacy*1e3:8.2f} ms   "
          f"{steps/t_legacy/1e6:8.1f} M steps/s   "
          f"prepare ≈ {max(0.0, (t_legacy - t_full) / t_legacy):5.1%}")

    for stage in ("roll", "fwdwrite", "reset", "obs"):
        t = _time_rollout(
            env, args.batch_size, args.num_steps, args.iters, (stage,)
        )
        share = max(0.0, (t_full - t) / t_full)
        print(
            f"{'minus ' + stage:<28} {t*1e3:8.2f} ms   "
            f"{steps/t/1e6:8.1f} M steps/s   stage ≈ {share:5.1%}"
        )

    # Everything but the scalar transition math.
    t = _time_rollout(
        env, args.batch_size, args.num_steps, args.iters,
        ("roll", "fwdwrite", "reset", "obs"),
    )
    print(
        f"{'scalar-math floor':<28} {t*1e3:8.2f} ms   "
        f"{steps/t/1e6:8.1f} M steps/s"
    )

    if args.trace:
        rollout = jax.jit(build_fused_rollout(env, args.num_steps, mode="cached"))
        key = jax.random.PRNGKey(0)
        states = jax.vmap(lambda k: env.generate(k, env.config))(
            jax.random.split(key, args.batch_size)
        )
        jax.block_until_ready(rollout(key, states))
        with jax.profiler.trace(args.trace):
            jax.block_until_ready(rollout(key, states))
        print(f"trace written to {args.trace}")


if __name__ == "__main__":
    main()
