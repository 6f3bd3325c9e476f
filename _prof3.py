"""Microprofile the obs kernel stages standalone on the real chip."""
import time
import jax, jax.numpy as jnp
import numpy as np
from jax import lax

import minigrid_tpu
from minigrid_tpu.core import constants as C
from minigrid_tpu.core.obs import gen_obs_image

B, T = 8192, 256
env = minigrid_tpu.make("MiniGrid-Empty-8x8-v0")
cfg = env.config
key = jax.random.PRNGKey(0)
states, _ = jax.jit(env.reset_batch, static_argnums=1)(key, B)
H, W, V = cfg.height, cfg.width, cfg.agent_view_size


def timeit(label, fn_single):
    """Scan T iterations of vmap(fn_single)(states) with a perturbation so
    XLA can't CSE iterations; checksum in carry."""
    vf = jax.vmap(fn_single)

    def body(carry, t):
        states, chk = carry
        # cheap perturbation: rotate agent_dir each iteration
        states = states.replace(agent_dir=(states.agent_dir + 1) % 4)
        out = vf(states)
        chk = chk + jnp.sum(out.astype(jnp.int32))
        return (states, chk), None

    def run(states):
        (s2, chk), _ = lax.scan(body, (states, jnp.int32(0)), jnp.arange(T))
        return chk

    r = jax.jit(run)
    _ = float(r(states))
    best = 0.0
    for i in range(4):
        t0 = time.perf_counter()
        _ = float(r(states))
        best = max(best, B * T / (time.perf_counter() - t0))
    print(f"{label}: {best/1e6:.2f} M calls/s", flush=True)


# Stage A: full obs image
timeit("A full gen_obs_image", lambda s: gen_obs_image(s, cfg))


# Stage B: index computation + onehot build only (no einsum)
def idx_onehot(s):
    v = V
    f = jnp.asarray(C.DIR_TO_VEC)[s.agent_dir]
    r = jnp.stack([-f[1], f[0]])
    rows = (v - 1) - jnp.arange(v)
    cols = jnp.arange(v) - v // 2
    wx = s.agent_pos[0] + f[0] * rows[:, None] + r[0] * cols[None, :]
    wy = s.agent_pos[1] + f[1] * rows[:, None] + r[1] * cols[None, :]
    wxc = jnp.clip(wx, 0, W - 1)
    wyc = jnp.clip(wy, 0, H - 1)
    flat_idx = wyc * W + wxc
    onehot = (flat_idx[:, :, None] == jnp.arange(H * W)).astype(jnp.bfloat16)
    return jnp.sum(onehot, axis=(0, 1))  # (64,) to reduce output size


timeit("B onehot build only", idx_onehot)


# Stage C: onehot + einsum (no vis, no encode)
def onehot_einsum(s):
    v = V
    f = jnp.asarray(C.DIR_TO_VEC)[s.agent_dir]
    r = jnp.stack([-f[1], f[0]])
    rows = (v - 1) - jnp.arange(v)
    cols = jnp.arange(v) - v // 2
    wx = s.agent_pos[0] + f[0] * rows[:, None] + r[0] * cols[None, :]
    wy = s.agent_pos[1] + f[1] * rows[:, None] + r[1] * cols[None, :]
    wxc = jnp.clip(wx, 0, W - 1)
    wyc = jnp.clip(wy, 0, H - 1)
    flat_idx = wyc * W + wxc
    onehot = (flat_idx[:, :, None] == jnp.arange(H * W)).astype(jnp.bfloat16)
    grid_flat = s.grid.reshape(H * W, 5).astype(jnp.bfloat16)
    view = jnp.einsum("abn,nc->abc", onehot, grid_flat,
                      preferred_element_type=jnp.float32).astype(jnp.uint8)
    return view


timeit("C onehot+einsum", onehot_einsum)


# Stage D: separable gather (two small matmuls, parity select)
def separable(s):
    v = V
    f = jnp.asarray(C.DIR_TO_VEC)[s.agent_dir]
    r = jnp.stack([-f[1], f[0]])
    rows = (v - 1) - jnp.arange(v)
    cols = jnp.arange(v) - v // 2
    grid = s.grid.astype(jnp.bfloat16)  # (H, W, 5) — indexed [y, x]? check grid layout
    # x-coordinate onehots
    xs = jnp.arange(W)
    ys = jnp.arange(H)
    # even dir (f0 != 0): wx = px + f0*rows[row], wy = py + r1*cols[col]
    ux_r = (jnp.clip(s.agent_pos[0] + f[0] * rows, 0, W - 1)[:, None] == xs).astype(jnp.bfloat16)  # (V, W)
    uy_c = (jnp.clip(s.agent_pos[1] + r[1] * cols, 0, H - 1)[:, None] == ys).astype(jnp.bfloat16)  # (V, H)
    # odd dir: wx = px + r0*cols[col], wy = py + f1*rows[row]
    ux_c = (jnp.clip(s.agent_pos[0] + r[0] * cols, 0, W - 1)[:, None] == xs).astype(jnp.bfloat16)
    uy_r = (jnp.clip(s.agent_pos[1] + f[1] * rows, 0, H - 1)[:, None] == ys).astype(jnp.bfloat16)
    # NOTE grid in this repo is (H*W,5) reshaped from state.grid; assume state.grid is (H, W, 5) [y, x]
    g = grid.reshape(H, W, 5)
    t_e = jnp.einsum("rX,YXc->rYc", ux_r, g)          # (V, H, 5)
    view_e = jnp.einsum("cY,rYk->rck", uy_c, t_e)     # (V, V, 5)
    t_o = jnp.einsum("rY,YXc->rXc", uy_r, g)
    view_o = jnp.einsum("cX,rXk->rck", ux_c, t_o)
    even = (s.agent_dir % 2) == 0
    view = jnp.where(even, view_e, view_o)
    return view.astype(jnp.uint8)


timeit("D separable gather", separable)
