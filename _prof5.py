"""Bisect XLA:TPU compile time of the packed rolled-layout scan body."""
import time, functools
import numpy as np
import jax, jax.numpy as jnp
from jax import lax
import minigrid_tpu
from minigrid_tpu.ops import fused_rollout as F

env = minigrid_tpu.make("MiniGrid-Empty-8x8-v0")
cfg = env.config
B, T = 8192, 256
key = jax.random.PRNGKey(0)
states, _ = jax.jit(env.reset_batch, static_argnums=1)(key, B)
words0, regs0, tmpl_words, tmpl_regs, actions = jax.jit(
    lambda k, s: F._prepare(env, T, "regen", k, s)
)(key, states)
jax.block_until_ready(words0)

hw = cfg.width * cfg.height


def ctime(label, fn, *args):
    t0 = time.perf_counter()
    lowered = jax.jit(fn).lower(*args)
    c = lowered.compile()
    print(f"{label}: compile {time.perf_counter()-t0:.1f}s")
    return c


step_math = functools.partial(
    F._step_core,
    width=cfg.width, height=cfg.height, view=cfg.agent_view_size,
    max_steps=cfg.max_steps, see_through_walls=cfg.see_through_walls,
    row_reader=F._matmul_rows,
)


def scan_full(words0, regs0, tmplw, tmplr, actions):
    def body(carry, a_t):
        words, regs, acc = carry
        w2, r2, rew, done, osum = step_math(words, regs, a_t[None, :], tmplw, tmplr)
        return (w2, r2, acc + osum), None
    z = jnp.zeros((1, B), jnp.int32)
    (w, r, acc), _ = lax.scan(body, (words0, regs0, z), actions)
    return w, r, acc

ctime("full body scan", scan_full, words0, regs0, tmpl_words, tmpl_regs, actions)


# Variant: no move-rolls (replace the 4-roll recenter with identity).
orig_roll = F._roll_static
F._roll_static = lambda x, k: x
ctime("no move-rolls", scan_full, words0, regs0, tmpl_words, tmpl_regs, actions)
F._roll_static = orig_roll

# Variant: no view read (osum from fwd word only).
def scan_noview(words0, regs0, tmplw, tmplr, actions):
    def body(carry, a_t):
        words, regs, acc = carry
        w2, r2, rew, done, osum = step_math(words, regs, a_t[None, :], tmplw, tmplr)
        return (w2, r2, acc + jnp.sum(r2[0:1] * 0) + rew.astype(jnp.int32)), None
    z = jnp.zeros((1, B), jnp.int32)
    (w, r, acc), _ = lax.scan(body, (words0, regs0, z), actions)
    return w, r, acc
# (view read still traced but dead-code-eliminable)
ctime("view dead", scan_noview, words0, regs0, tmpl_words, tmpl_regs, actions)
