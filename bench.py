"""Benchmark: batched env-steps/s on MiniGrid-Empty-8x8-v0.

Measures the full production path — vmap'd auto-resetting step including the
egocentric observation encode, rolled out with `lax.scan` on device — and
prints one JSON line:

    {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

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
import jax.numpy as jnp

import minigrid_tpu
from minigrid_tpu.core.rollout import build_rollout

REFERENCE_STEPS_PER_SEC = 3_000.0  # pure-Python MiniGrid, 1 CPU core (external)


def run(env_id: str, batch_size: int, num_steps: int, iters: int) -> float:
    env = minigrid_tpu.make(env_id)
    rollout = jax.jit(build_rollout(env, num_steps=num_steps))

    key = jax.random.PRNGKey(0)
    key, k_reset = jax.random.split(key)
    states, _ = jax.jit(env.reset_batch, static_argnums=1)(k_reset, batch_size)

    def fence(states, metrics):
        # Force full materialization with actual host fetches —
        # block_until_ready alone has proven unreliable on tunneled
        # backends for timing purposes.
        return float(metrics.total_reward) + float(jnp.sum(states.step_count))

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
        best = max(best, batch_size * num_steps / dt)
    return best


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--env-id", default="MiniGrid-Empty-8x8-v0")
    p.add_argument("--batch-size", type=int, default=8192)
    p.add_argument("--num-steps", type=int, default=256)
    p.add_argument("--iters", type=int, default=5)
    args = p.parse_args()

    steps_per_sec = run(args.env_id, args.batch_size, args.num_steps, args.iters)
    print(
        json.dumps(
            {
                "metric": f"env_steps_per_sec[{args.env_id} B={args.batch_size}]",
                "value": round(steps_per_sec, 1),
                "unit": "steps/s",
                "vs_baseline": round(steps_per_sec / REFERENCE_STEPS_PER_SEC, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
