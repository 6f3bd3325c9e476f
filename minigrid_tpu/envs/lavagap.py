"""Lava gap environment.

Reference: `LavaGapEnv` (envs/lavagap.py:~1-60) — one vertical obstacle
column at random x ∈ [2, width-2) spanning rows 1..height-2 with a single
gap at random y ∈ [1, height-1); agent fixed at (1, 1) facing right, goal
bottom-right.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from minigrid_tpu.core import constants as C
from minigrid_tpu.core import grid as G
from minigrid_tpu.core.state import EnvConfig, EnvState, empty_state
from minigrid_tpu.core.step import base_step
from minigrid_tpu.envs import missions

MISSION_LAVA = missions.register_template(
    "avoid the lava and get to the green goal square"
)
MISSION_WALL = missions.register_template(
    "find the opening and get to the green goal square"
)


def generate(key: jax.Array, config: EnvConfig) -> EnvState:
    key, k_reset = jax.random.split(key)
    state = empty_state(config, rng=k_reset)
    w, h = config.width, config.height

    grid = G.wall_rect(state.grid, 0, 0, w, h)
    grid = G.set_cell(grid, w - 2, h - 2, (C.GOAL, C.GREEN, 0, 0, 0))

    k_x, k_y = jax.random.split(key)
    gap_x = jax.random.randint(k_x, (), 2, w - 2, dtype=jnp.int32)
    gap_y = jax.random.randint(k_y, (), 1, h - 1, dtype=jnp.int32)

    if config.obstacle_type == "wall":
        obst = G.WALL_CELL
        mission = MISSION_WALL
    else:
        obst = (C.LAVA, C.RED, 0, 0, 0)
        mission = MISSION_LAVA
    grid = G.paint_rect(grid, gap_x, 1, gap_x + 1, h - 1, obst)
    grid = G.set_cell(grid, gap_x, gap_y, G.EMPTY_CELL)

    return state.replace(
        grid=grid,
        agent_pos=jnp.asarray((1, 1), dtype=jnp.int32),
        agent_dir=jnp.zeros((), dtype=jnp.int32),
        mission=jnp.asarray(missions.encode(mission)),
    )


step = base_step
