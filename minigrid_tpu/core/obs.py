"""Egocentric observation encoder.

Reference pipeline (`gen_obs_grid`/`gen_obs`, minigrid.py:~1162-1215):
world-frame window → rotate to egocentric (agent facing up, bottom-center) →
occlusion mask → carried-object overlay → `(V, V, 3)` uint8 encode.

TPU-native shape: the window crop is a wall-padded `dynamic_slice`, the
rotation is a 4-way `lax.switch` over static `rot90`s (XLA lowers each to a
copy with permuted layout), the occlusion mask is the unrolled shift-OR scan
in `vision.py`, and the encode is a masked select — one fused elementwise
program per step under jit, batched for free under `vmap`.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np
from jax import lax

from minigrid_tpu.core import constants as C
from minigrid_tpu.core.grid import encode, slice_with_wall_fill
from minigrid_tpu.core.state import (
    CARRY_COLOR,
    CARRY_CONT_COLOR,
    CARRY_CONT_TYPE,
    CARRY_TYPE,
    EnvConfig,
    EnvState,
)
from minigrid_tpu.core.vision import process_vis

# Per-direction offset of the view window's top-left corner relative to the
# agent (reference `get_view_exts`, minigrid.py:~1030-1060: the 4-way branch
# flattened into a lookup table). Index 0=right, 1=down, 2=left, 3=up.
def _view_ext_tables(view_size: int) -> Tuple[np.ndarray, np.ndarray]:
    half = view_size // 2
    dx = np.array([0, -half, -view_size + 1, -half], dtype=np.int32)
    dy = np.array([-half, 0, -half, -view_size + 1], dtype=np.int32)
    return dx, dy


def gen_obs_grid(state: EnvState, config: EnvConfig) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """The egocentric `(V, V, 5)` view grid and its `(V, V)` visibility mask.

    Matches `MiniGridEnv.gen_obs_grid` (minigrid.py:~1162-1195) — but where
    the reference slices a window, wall-fills out-of-bounds cells, and
    rotates `agent_dir + 1` times CCW, we fuse all three into ONE gather:
    egocentric view cell (row, col) maps affinely to world coordinates

        world = agent_pos + f_vec·(V-1-row) + r_vec·(col - V//2)

    (f_vec = heading, r_vec = its right-perpendicular — the same transform
    the reference uses for its render highlight mask, minigrid.py:~1255).
    Under `vmap` a `lax.switch` over rotations would compute all four
    branches and select; the affine gather does the work once.
    """
    v = config.agent_view_size
    h, w = config.height, config.width

    f = jnp.asarray(C.DIR_TO_VEC)[state.agent_dir]  # (2,) heading
    r = jnp.stack([-f[1], f[0]])  # right-perpendicular

    rows = (v - 1) - jnp.arange(v)  # forward distance per view row
    cols = jnp.arange(v) - v // 2  # lateral offset per view col
    wx = state.agent_pos[0] + f[0] * rows[:, None] + r[0] * cols[None, :]
    wy = state.agent_pos[1] + f[1] * rows[:, None] + r[1] * cols[None, :]

    in_bounds = (wx >= 0) & (wx < w) & (wy >= 0) & (wy < h)
    wxc = jnp.clip(wx, 0, w - 1)
    wyc = jnp.clip(wy, 0, h - 1)

    # Extract the V×V window as a one-hot contraction instead of a gather:
    # TPU gathers scalarize, but `onehot(idx) @ grid` is an MXU matmul.
    # Cell values (≤ 10) are exact in bf16; accumulation in f32 is exact.
    flat_idx = wyc * w + wxc  # (V, V) int32
    onehot = (flat_idx[:, :, None] == jnp.arange(h * w)).astype(jnp.bfloat16)
    grid_flat = state.grid.reshape(h * w, 5).astype(jnp.bfloat16)
    view = jnp.einsum(
        "abn,nc->abc", onehot, grid_flat, preferred_element_type=jnp.float32
    ).astype(jnp.uint8)
    wall = jnp.array((C.WALL, C.GREY, 0, 0, 0), dtype=jnp.uint8)
    view = jnp.where(in_bounds[:, :, None], view, wall)

    if config.see_through_walls:
        vis_mask = jnp.ones((v, v), dtype=bool)
    else:
        vis_mask = process_vis(view)

    # Overlay the carried object (or nothing) on the agent's own cell
    # (minigrid.py:~1185-1192).
    carrying = state.carrying
    has_item = carrying[CARRY_TYPE] > 0
    agent_cell = jnp.where(
        has_item,
        jnp.stack(
            [
                carrying[CARRY_TYPE],
                carrying[CARRY_COLOR],
                jnp.zeros((), jnp.uint8),
                carrying[CARRY_CONT_TYPE],
                carrying[CARRY_CONT_COLOR],
            ]
        ),
        jnp.array([C.EMPTY, 0, 0, 0, 0], dtype=jnp.uint8),
    )
    view = view.at[v - 1, v // 2, :].set(agent_cell)
    return view, vis_mask


def gen_obs_image(state: EnvState, config: EnvConfig) -> jnp.ndarray:
    """The `(V, V, 3)` uint8 partial observation (reference `gen_obs`'s
    `obs['image']`, minigrid.py:~1197-1215; indexed `[x, y]` like the
    reference's encode)."""
    view, vis_mask = gen_obs_grid(state, config)
    return encode(view, vis_mask)


def gen_obs(state: EnvState, config: EnvConfig):
    """Full observation: image + direction + mission ids.

    The reference returns `{'image', 'direction', 'mission': str}`; mission
    strings are host-side artifacts, so on device we carry the integer
    mission encoding (template id + slots) and detokenize at the API
    boundary (see `minigrid_tpu.envs.missions`).
    """
    return {
        "image": gen_obs_image(state, config),
        "direction": state.agent_dir,
        "mission": state.mission,
    }
