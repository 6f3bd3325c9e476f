"""Benchmark tool — parity with the reference's `benchmark.py` (~70 LoC):
times reset rate, step FPS, and render FPS for a single env through the
stateful adapter, then adds what the reference cannot measure: batched
on-device rollout throughput.

Usage: python benchmark.py --env-name MiniGrid-LavaGapS7-v0
"""

from __future__ import annotations

import argparse
import time


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--env-name", default="MiniGrid-LavaGapS7-v0")
    parser.add_argument("--num_resets", type=int, default=200)
    parser.add_argument("--num_frames", type=int, default=5000)
    parser.add_argument("--batch-size", type=int, default=8192)
    parser.add_argument("--batched-steps", type=int, default=256)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    import minigrid_tpu
    from minigrid_tpu.compat import gym_make
    from minigrid_tpu.core.rollout import build_rollout

    env = gym_make(args.env_name)

    # Warm up compiles.
    env.reset(seed=0)
    env.step(0)
    env.render()

    t0 = time.time()
    for i in range(args.num_resets):
        env.reset(seed=i)
    t1 = time.time()
    reset_time = (1000 * (t1 - t0)) / args.num_resets

    env.reset(seed=0)
    t0 = time.time()
    for i in range(args.num_frames):
        _, _, terminated, truncated, _ = env.step(i % 3)
        if terminated or truncated:
            env.reset()
    t1 = time.time()
    frames_per_sec = args.num_frames / (t1 - t0)

    t0 = time.time()
    for _ in range(100):
        env.render()
    t1 = time.time()
    render_fps = 100 / (t1 - t0)

    # Batched on-device rollout (the TPU-native number).
    fenv = minigrid_tpu.make(args.env_name)
    rollout = jax.jit(build_rollout(fenv, num_steps=args.batched_steps))
    key = jax.random.PRNGKey(0)
    states, _ = jax.jit(fenv.reset_batch, static_argnums=1)(key, args.batch_size)
    states, metrics = rollout(key, states)
    float(metrics.total_reward)  # compile fence
    t0 = time.time()
    states, metrics = rollout(jax.random.fold_in(key, 1), states)
    _ = float(metrics.total_reward) + float(jnp.sum(states.step_count))
    dt = time.time() - t0
    batched_fps = args.batch_size * args.batched_steps / dt

    print(f"Env reset time: {reset_time:.1f} ms")
    print(f"Single-env FPS: {frames_per_sec:.0f}")
    print(f"Render FPS    : {render_fps:.0f}")
    print(f"Batched FPS   : {batched_fps:,.0f} (B={args.batch_size} on-device)")


if __name__ == "__main__":
    main()
