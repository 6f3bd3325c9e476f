"""Component attribution for the packed train step (VERDICT r3 #4).

One full train step = packed rollout with the actor-critic in the loop
(simulation + per-step inference) + time-chunked gradient accumulation
(`parallel.train._trajectory_grads`) + optimizer update. This script times

  * the full jitted train step,
  * the rollout alone (policy-in-loop simulation, no grads/update),
  * the gradient pass alone on a pre-collected trajectory (per
    `--time-chunk` setting),

so BASELINE.md's "train-step profile" can attribute the budget. Timings
are scalar-fetch fenced (block_until_ready alone is unreliable on the
tunneled backend — bench.py).

Usage: python tools/profile_train.py [--batch-size B] [--num-steps T]
           [--env-id ID] [--iters N] [--time-chunks 8,32,128]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

import minigrid_tpu
from minigrid_tpu.parallel.sharding import make_env_mesh, shard_states
from minigrid_tpu.parallel import train as T


def _best(fn, iters):
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--env-id", default="MiniGrid-Empty-8x8-v0")
    p.add_argument("--batch-size", type=int, default=32768)
    p.add_argument("--num-steps", type=int, default=256)
    p.add_argument("--iters", type=int, default=4)
    p.add_argument("--time-chunks", default="8,32,128")
    args = p.parse_args()

    env = minigrid_tpu.make(args.env_id)
    mesh = make_env_mesh()
    key = jax.random.PRNGKey(0)
    key, k_env, k_model = jax.random.split(key, 3)
    ts = T.init_train_state(k_model, env, mesh)
    states, _ = jax.jit(env.reset_batch, static_argnums=1)(
        k_env, args.batch_size
    )
    states = shard_states(states, mesh)
    steps = args.batch_size * args.num_steps
    print(f"{args.env_id}  B={args.batch_size}  T={args.num_steps}")

    # Full train step.
    step = T.build_packed_train_step(env, mesh, num_steps=args.num_steps)
    out = step(ts, states, key)  # compile
    float(out[2]["loss"])

    def run_full():
        o = step(ts, states, key)
        float(o[2]["loss"])

    t_full = _best(run_full, args.iters)
    print(f"{'full train step':<26} {t_full*1e3:8.1f} ms  "
          f"{steps/t_full/1e6:7.1f} M steps/s")

    # Gradient pass alone on a synthetic trajectory of the real shapes;
    # rollout+update ≈ full − grad (the update is sub-ms at 315K params).
    model = T.make_model(env)
    obs = jnp.zeros(
        (args.num_steps, args.batch_size, env.config.agent_view_size,
         env.config.agent_view_size, 3), jnp.uint8,
    )
    actions = jnp.zeros((args.num_steps, args.batch_size), jnp.int32)
    fvals = jnp.zeros((args.num_steps, args.batch_size), jnp.float32)
    done = jnp.zeros((args.num_steps, args.batch_size), bool)
    traj = (obs, actions, fvals, fvals, fvals, done)

    for tc in [int(x) for x in args.time_chunks.split(",")]:
        gfn = jax.jit(
            lambda params, traj, tc=tc: T._trajectory_grads(
                model, params, traj, 0.99, 0.5, 0.01, time_chunk=tc
            )[0]
        )
        g = gfn(ts.params, traj)
        jax.block_until_ready(g)

        def run_g():
            g = gfn(ts.params, traj)
            float(jax.tree.leaves(g)[0].sum())

        t_g = _best(run_g, args.iters)
        print(f"{'grad pass (chunk=%d)' % tc:<26} {t_g*1e3:8.1f} ms  "
              f"({t_g/t_full:5.1%} of full)")

    print(f"{'rollout+update (full-grad)':<26} "
          f"≈ full − grad pass above")


if __name__ == "__main__":
    main()
