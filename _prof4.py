"""Where does the packed-path step time go? Ablate _step_core pieces."""
import time, functools
import jax, jax.numpy as jnp
from jax import lax
import numpy as np
import minigrid_tpu
from minigrid_tpu.core import constants as C
from minigrid_tpu.ops import fused_rollout as F

env = minigrid_tpu.make("MiniGrid-Empty-8x8-v0")
cfg = env.config
B, T = 8192, 256
key = jax.random.PRNGKey(0)
states, _ = jax.jit(env.reset_batch, static_argnums=1)(key, B)


def timeit(label, fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    best = 0.0
    for i in range(4):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        dt = time.perf_counter() - t0
        best = max(best, B * T / dt)
    print(f"{label}: {best/1e6:.2f} M steps/s")
    return best


# Full packed rollout (baseline).
r = jax.jit(F.build_packed_xla_rollout(env, num_steps=T))
timeit("packed full", r, key, states)

# Ablations: scan over a stripped step.
words0, regs0, tmpl_words, tmpl_regs, actions = jax.jit(
    lambda k, s: F._prepare(env, T, "regen", k, s)
)(key, states)

hw = cfg.width * cfg.height
view = cfg.agent_view_size


def make_scan(step_fn):
    def rollout(words0, regs0, actions):
        def body(carry, a_t):
            words, regs, acc = carry
            words2, regs2, extra = step_fn(words, regs, a_t[None, :])
            return (words2, regs2, acc + extra), None
        zeros = jnp.zeros((1, words0.shape[1]), jnp.int32)
        (w, r, acc), _ = lax.scan(body, (words0, regs0, zeros), actions)
        return w, r, acc
    return jax.jit(rollout)


full_core = functools.partial(
    F._step_core,
    tmpl_words=tmpl_words, tmpl_regs=tmpl_regs, gather=F._masked_sum_gather,
    width=cfg.width, height=cfg.height, view=view,
    max_steps=cfg.max_steps, see_through_walls=cfg.see_through_walls,
)

def step_full(words, regs, a):
    w2, r2, rew, done, osum = full_core(words, regs, a)
    return w2, r2, osum
timeit("scan: full step_core", make_scan(step_full), words0, regs0, actions)


# No obs at all: transition + autoreset only.
def step_noobs(words, regs, a):
    w2, r2, rew, done, osum = full_core(words, regs, a)
    return w2, r2, done.astype(jnp.int32)

# Hack: rebuild step math but return before the gather. Easiest: copy the
# cheap parts by calling _step_core with view=1 (gather of 1 cell).
cheap_core = functools.partial(
    F._step_core,
    tmpl_words=tmpl_words, tmpl_regs=tmpl_regs, gather=F._masked_sum_gather,
    width=cfg.width, height=cfg.height, view=1,
    max_steps=cfg.max_steps, see_through_walls=True,
)
def step_v1(words, regs, a):
    w2, r2, rew, done, osum = cheap_core(words, regs, a)
    return w2, r2, osum
timeit("scan: view=1 (≈no gather)", make_scan(step_v1), words0, regs0, actions)


# Gather only: no transition, just the view gather of static state.
def step_gather_only(words, regs, a):
    kvec = lax.broadcasted_iota(jnp.int32, (view * view, 1), 0)
    rd = (view - 1) - kvec // view
    co = kvec % view - view // 2
    x = regs[0:1]; y = regs[1:2]; d = regs[2:3]
    f0 = (d == 0).astype(jnp.int32) - (d == 2).astype(jnp.int32)
    f1 = (d == 1).astype(jnp.int32) - (d == 3).astype(jnp.int32)
    wx = x + f0 * rd - f1 * co
    wy = y + f1 * rd + f0 * co
    wflat = jnp.clip(wy, 0, cfg.height - 1) * cfg.width + jnp.clip(wx, 0, cfg.width - 1)
    vw = F._masked_sum_gather(words, wflat)
    return words, regs, jnp.sum(vw, axis=0, keepdims=True) + a * 0
timeit("scan: gather only", make_scan(step_gather_only), words0, regs0, actions)
