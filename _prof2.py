"""Decomposition profile on the real chip: where does the step time go?"""
import time
import jax, jax.numpy as jnp

import minigrid_tpu
from minigrid_tpu.core import obs as obs_mod
import minigrid_tpu.core.rollout as rollout_mod

B, T = 8192, 256
key = jax.random.PRNGKey(0)


def bench(label):
    env = minigrid_tpu.make("MiniGrid-Empty-8x8-v0")
    r = jax.jit(rollout_mod.build_rollout(env, num_steps=T))
    states, _ = jax.jit(env.reset_batch, static_argnums=1)(key, B)
    s2, m = r(key, states)
    _ = float(m.total_reward) + float(jnp.sum(s2.step_count))
    best = 0.0
    for i in range(4):
        k = jax.random.fold_in(key, i)
        t0 = time.perf_counter()
        s2, m = r(k, states)
        _ = float(m.total_reward) + float(jnp.sum(s2.step_count))
        best = max(best, B * T / (time.perf_counter() - t0))
    print(f"{label}: {best/1e6:.2f} M steps/s", flush=True)
    return best


bench("full (baseline)")

orig_vis = obs_mod.process_vis
obs_mod.process_vis = lambda vg: jnp.ones(vg.shape[:2], dtype=bool)
bench("no-vision (mask=1)")
obs_mod.process_vis = orig_vis

orig_img = obs_mod.gen_obs_image
obs_mod.gen_obs_image = lambda state, config: jnp.zeros(
    (config.agent_view_size, config.agent_view_size, 3), dtype=jnp.uint8
)
bench("step-only (const obs)")
obs_mod.gen_obs_image = orig_img
