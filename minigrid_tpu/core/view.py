"""World <-> egocentric-view coordinate transforms.

Functional equivalents of the reference's `MiniGridEnv` pose helpers and
view-frame geometry (minigrid.py:~972-1085): `dir_vec`, `right_vec`,
`front_pos`, `get_view_exts`, `get_view_coords`, `relative_coords`,
`in_view`, and `agent_sees`. All are pure jnp functions of the pose arrays,
so they jit/vmap like every other kernel; the stateful adapter in
`minigrid_tpu.compat.gym_env` exposes them under the reference's
method/property names.

View-frame convention (identical to the reference): `(vx, vy)` with
`vx` ∈ [0, V) the lateral index (left edge of the view = 0) and `vy` ∈ [0, V)
the forward index (far edge = 0); the agent sits at `(V // 2, V - 1)` facing
`vy = 0`.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from minigrid_tpu.core import constants as C
from minigrid_tpu.core.state import EnvConfig, EnvState


def dir_vec(agent_dir: jnp.ndarray) -> jnp.ndarray:
    """(2,) heading unit vector (`MiniGridEnv.dir_vec`, minigrid.py:~972)."""
    return jnp.asarray(C.DIR_TO_VEC)[agent_dir]


def right_vec(agent_dir: jnp.ndarray) -> jnp.ndarray:
    """(2,) right-perpendicular of the heading (`right_vec`, minigrid.py:~980)."""
    d = dir_vec(agent_dir)
    return jnp.stack([-d[1], d[0]])


def front_pos(agent_pos: jnp.ndarray, agent_dir: jnp.ndarray) -> jnp.ndarray:
    """The cell directly in front of the agent (`front_pos`, minigrid.py:~988)."""
    return agent_pos + dir_vec(agent_dir)


def get_view_exts(
    agent_pos: jnp.ndarray, agent_dir: jnp.ndarray, view_size: int
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(topX, topY, botX, botY) world extents of the view window.

    The reference's 4-way branch on `agent_dir` (`get_view_exts`,
    minigrid.py:~1030-1060) flattened into offset lookup tables; the agent is
    centered on the bottom row of the window.
    """
    half = view_size // 2
    dx = jnp.asarray([0, -half, -view_size + 1, -half], dtype=jnp.int32)
    dy = jnp.asarray([-half, 0, -half, -view_size + 1], dtype=jnp.int32)
    top_x = agent_pos[0] + dx[agent_dir]
    top_y = agent_pos[1] + dy[agent_dir]
    return top_x, top_y, top_x + view_size, top_y + view_size


def get_view_coords(
    agent_pos: jnp.ndarray, agent_dir: jnp.ndarray, view_size: int, i, j
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """World cell (i, j) -> view-frame (vx, vy) (`get_view_coords`,
    minigrid.py:~997-1028). The result may fall outside [0, V) — callers
    needing validity use `relative_coords`/`in_view`."""
    f = dir_vec(agent_dir)
    r = right_vec(agent_dir)
    half = view_size // 2
    # World position of the view's far-left corner (vx=0, vy=0).
    top = agent_pos + f * (view_size - 1) - r * half
    lx = jnp.asarray(i, jnp.int32) - top[0]
    ly = jnp.asarray(j, jnp.int32) - top[1]
    vx = r[0] * lx + r[1] * ly
    vy = -(f[0] * lx + f[1] * ly)
    return vx, vy


def relative_coords(
    agent_pos: jnp.ndarray, agent_dir: jnp.ndarray, view_size: int, x, y
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(vx, vy, valid): view coords plus an in-view flag.

    The reference (`relative_coords`, minigrid.py:~1062-1072) returns None
    for out-of-view cells; fixed-shape code returns an explicit bool.
    """
    vx, vy = get_view_coords(agent_pos, agent_dir, view_size, x, y)
    valid = (vx >= 0) & (vx < view_size) & (vy >= 0) & (vy < view_size)
    return vx, vy, valid


def in_view(
    agent_pos: jnp.ndarray, agent_dir: jnp.ndarray, view_size: int, x, y
) -> jnp.ndarray:
    """Whether world cell (x, y) lies inside the agent's view window
    (`in_view`, minigrid.py:~1074)."""
    return relative_coords(agent_pos, agent_dir, view_size, x, y)[2]


def agent_sees(state: EnvState, config: EnvConfig, x, y) -> jnp.ndarray:
    """Whether the agent actually observes world cell (x, y) — in the view
    window AND not occlusion-masked (`agent_sees`, minigrid.py:~1076-1085:
    decode the obs image and compare cell types against the world grid)."""
    from minigrid_tpu.core.obs import gen_obs_image
    from minigrid_tpu.core.state import CH_TYPE

    vx, vy, valid = relative_coords(
        state.agent_pos, state.agent_dir, config.agent_view_size, x, y
    )
    v = config.agent_view_size
    vxc = jnp.clip(vx, 0, v - 1)
    vyc = jnp.clip(vy, 0, v - 1)
    image = gen_obs_image(state, config)  # (V, V, 3), [vx, vy]-indexed
    obs_type = image[vxc, vyc, 0].astype(jnp.int32)
    world_type = state.grid[
        jnp.asarray(y, jnp.int32), jnp.asarray(x, jnp.int32), CH_TYPE
    ].astype(jnp.int32)
    return valid & (obs_type == world_type)
