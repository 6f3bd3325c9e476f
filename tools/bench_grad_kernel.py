"""Time the fused fwd+bwd Pallas gradient kernel vs the XLA packed pass
at production shapes (B=32768, T=256). Usage:
  python tools/bench_grad_kernel.py [B] [T] [tc] [bt]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

import minigrid_tpu
from minigrid_tpu.ops.fused_rollout import packed_init
from minigrid_tpu.ops.grad_kernel import build_grad_kernel
from minigrid_tpu.ops.policy_rollout import (
    build_fused_train_rollout,
    train_weights_from_params,
)
from minigrid_tpu.parallel import train as T
from minigrid_tpu.parallel.sharding import make_env_mesh


def main() -> None:
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 32768
    Tk = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    tc = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    bt = int(sys.argv[4]) if len(sys.argv) > 4 else 512

    env = minigrid_tpu.make("MiniGrid-Empty-8x8-v0")
    ts = T.init_train_state(jax.random.PRNGKey(0), env, make_env_mesh())
    states, _ = jax.jit(env.reset_batch, static_argnums=1)(
        jax.random.PRNGKey(1), B
    )
    carry = jax.jit(lambda s: packed_init(env, s, "cached"))(states)
    roll = jax.jit(
        build_fused_train_rollout(
            env, Tk, mode="cached", backend="pallas", raw_obs=True
        )
    )
    _, traj, _ = roll(ts.params, jax.random.PRNGKey(2), carry)
    obs_w, actions, _, value, reward, done = traj
    v = env.config.agent_view_size
    returns = T._trajectory_returns(reward, done, 0.99)
    adv = returns - value
    denom = float(Tk * B)
    w = train_weights_from_params(ts.params, v)

    gk = jax.jit(build_grad_kernel(
        v, env.num_actions, Tk, B, denom, 0.5, 0.01, tc=tc, bt=bt,
    ))
    t0 = time.time()
    gw_k, sums = gk(w, obs_w, actions, adv, returns)
    jax.block_until_ready(gw_k)
    print(f"kernel compile+first: {time.time()-t0:.2f}s  sums={np.asarray(sums)}")
    n = 5
    t0 = time.time()
    for _ in range(n):
        gw_k, sums = gk(w, obs_w, actions, adv, returns)
    jax.block_until_ready(gw_k)
    k_ms = (time.time() - t0) / n * 1e3
    print(f"pallas grad kernel ({tc=}, {bt=}): {k_ms:.1f} ms")

    # XLA packed pass for comparison (same inputs/loss).
    xg = jax.jit(lambda p, tr: T._trajectory_grads_packed(
        p, tr, v, env.num_actions, 0.99, 0.5, 0.01, time_chunk=4,
    ))
    try:
        out = xg(ts.params, traj)
        jax.block_until_ready(out)
        t0 = time.time()
        for _ in range(n):
            out = xg(ts.params, traj)
        jax.block_until_ready(out)
        x_ms = (time.time() - t0) / n * 1e3
        print(f"xla packed pass: {x_ms:.1f} ms  (kernel speedup {x_ms/k_ms:.2f}x)")
        # On-chip numeric cross-check: kernel EvalWeights cotangents vs
        # the XLA pass's flax grads mapped through the same transform VJP.
        gflax, _ = out
        _, jvp_out = jax.jvp(
            lambda p: train_weights_from_params(p, v), (ts.params,), (gflax,)
        )
        # jvp of a linear map pushes flax-grads forward into kernel layout
        # ONLY for orthonormal transforms; instead compare losses'
        # directional derivative: <gw_k, t> == <gflax, pullback... skip —
        # compare the pulled-back kernel grads directly:
        w0, pullback = jax.vjp(lambda p: train_weights_from_params(p, v),
                               ts.params)
        gk_flax = pullback(type(w)(*[x.astype(y.dtype) for x, y in
                                     zip(gw_k, w0)]))[0]
        import jax.tree_util as jtu
        for (kp, a), (_, b) in zip(
            jtu.tree_flatten_with_path(gflax)[0][:8],
            jtu.tree_flatten_with_path(gk_flax)[0][:8],
        ):
            a = np.asarray(a, np.float32)
            b = np.asarray(b, np.float32)
            rel = np.abs(a - b).max() / (np.abs(a).max() + 1e-9)
            print(f"  {jtu.keystr(kp):28s} max-rel-diff {rel:.2e}")
    except Exception as e:  # signature drift — timing is the point here
        print(f"xla pass comparison skipped: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
