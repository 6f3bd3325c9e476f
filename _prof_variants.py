"""Profile rollout variants on the real TPU chip."""
import time, functools
import jax, jax.numpy as jnp
from jax import lax
import minigrid_tpu
from minigrid_tpu.core import constants as C
from minigrid_tpu.core.autoreset import make_autoreset_step
from minigrid_tpu.core.obs import gen_obs_image, gen_obs_grid
from minigrid_tpu.core.vision import process_vis
from minigrid_tpu.core.state import CARRY_TYPE, CARRY_COLOR, CARRY_CONT_TYPE, CARRY_CONT_COLOR

env = minigrid_tpu.make("MiniGrid-Empty-8x8-v0")
cfg = env.config
B, T = 8192, 256
key = jax.random.PRNGKey(0)
states, _ = jax.jit(env.reset_batch, static_argnums=1)(key, B)

def time_rollout(body_builder, label, carry_obs=False):
    auto = jax.vmap(make_autoreset_step(env))
    body = body_builder(auto)
    def rollout(key, states):
        keys = jax.random.split(key, T)
        if carry_obs:
            obs0 = jax.vmap(lambda s: gen_obs_image(s, cfg))(states)
            (states2, _, chk), _ = lax.scan(body, (states, obs0, jnp.int32(0)), keys)
        else:
            (states2, chk), _ = lax.scan(body, (states, jnp.int32(0)), keys)
        return states2, chk
    r = jax.jit(rollout)
    s2, chk = r(key, states); jax.block_until_ready(chk); float(jnp.sum(s2.step_count))
    best = 0.0
    for i in range(4):
        k = jax.random.fold_in(key, i)
        t0 = time.perf_counter()
        s2, chk = r(k, states)
        _ = float(chk) + float(jnp.sum(s2.step_count))
        dt = time.perf_counter() - t0
        best = max(best, B*T/dt)
    print(f"{label}: {best/1e6:.2f} M steps/s")
    return best

# Variant 0: current production rollout
from minigrid_tpu.core.rollout import build_rollout
r = jax.jit(build_rollout(env, num_steps=T))
s2, m = r(key, states); _ = float(m.total_reward)
best = 0.0
for i in range(4):
    k = jax.random.fold_in(key, i)
    t0 = time.perf_counter(); s2, m = r(k, states)
    _ = float(m.total_reward) + float(jnp.sum(s2.step_count))
    best = max(best, B*T/(time.perf_counter()-t0))
print(f"current build_rollout: {best/1e6:.2f} M steps/s")

# Variant 1: step only, no obs at all (upper bound of transition kernel)
def v1(auto):
    def body(carry, key_t):
        states, chk = carry
        actions = jax.random.randint(key_t, (B,), 0, 7, dtype=jnp.int32)
        states, obs, rew, term, trunc = auto(states, actions)
        chk = chk + jnp.sum(term.astype(jnp.int32))
        return (states, chk), None
    return body
# note: auto_step includes observe() in env.step... check: make_autoreset_step calls env.step which calls observe.
time_rollout(v1, "autoreset step incl obs once (checksum only term)")

# Variant 2: carry obs forward (obs computed once per step)
def v2(auto):
    def body(carry, key_t):
        states, obs_img, chk = carry
        actions = jax.random.randint(key_t, (B,), 0, 7, dtype=jnp.int32)
        states, obs, rew, term, trunc = auto(states, actions)
        chk = chk + jnp.sum(obs["image"].astype(jnp.int32))
        return (states, obs["image"], chk), None
    return body
time_rollout(v2, "carry-obs rollout", carry_obs=True)
