"""Sweep Pallas rollout tuning knobs (lane_block × step_chunk) on real TPU.

The packed kernel's VMEM residency is
  ~4·HW·lane_block·4B (grid blocks, partly double-buffered by the pipeline)
  + step_chunk·lane_block·4B (actions chunk, double-buffered),
so large grids (MultiRoom: HW=625) sit near the 16 MiB VMEM ceiling at the
defaults (lane_block=512, step_chunk=128) — this sweep finds the knee.
Prints one line per config: env, lane_block, step_chunk, steps/s.

Run: python tools/tune_packed.py [--env-id ...] [--batch-size N]
"""

from __future__ import annotations

import argparse
import itertools
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

import minigrid_tpu
from minigrid_tpu.ops.fused_rollout import _auto_lane_block, build_fused_rollout


def measure(env, batch, num_steps, lane_block, step_chunk, iters=3):
    rollout = jax.jit(
        build_fused_rollout(
            env,
            num_steps=num_steps,
            lane_block=lane_block,
            step_chunk=step_chunk,
            mode="cached",
        )
    )
    key = jax.random.PRNGKey(0)
    key, k_reset = jax.random.split(key)
    states, _ = jax.jit(env.reset_batch, static_argnums=1)(k_reset, batch)
    states, metrics = rollout(key, states)
    float(metrics.total_reward)  # fence (compile + warm)
    best = 0.0
    for i in range(iters):
        key = jax.random.fold_in(key, i)
        t0 = time.perf_counter()
        states, metrics = rollout(key, states)
        float(metrics.total_reward) + int(jnp.sum(states.step_count))
        dt = time.perf_counter() - t0
        best = max(best, batch * num_steps / dt)
    return best


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--env-id", default="MiniGrid-MultiRoom-N4-S5-v0")
    p.add_argument("--batch-size", type=int, default=32768)
    p.add_argument("--num-steps", type=int, default=256)
    p.add_argument("--lane-blocks", default="128,256,512")
    p.add_argument("--step-chunks", default="32,64,128,256")
    args = p.parse_args()

    env = minigrid_tpu.make(args.env_id)
    hw = env.config.width * env.config.height
    lbs = [int(x) for x in args.lane_blocks.split(",")]
    tcs = [int(x) for x in args.step_chunks.split(",")]
    for lb, tc in itertools.product(lbs, tcs):
        if lb > _auto_lane_block(hw, tc):
            print(f"{args.env_id} lane_block={lb} step_chunk={tc}: over VMEM budget")
            continue
        try:
            sps = measure(env, args.batch_size, args.num_steps, lb, tc)
            print(
                f"{args.env_id} lane_block={lb} step_chunk={tc}: "
                f"{sps / 1e6:.1f}M steps/s",
                flush=True,
            )
        except Exception as e:
            print(f"{args.env_id} lane_block={lb} step_chunk={tc}: FAILED {e}")


if __name__ == "__main__":
    main()
