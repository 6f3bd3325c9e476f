"""Empty room environment family.

Reference: `EmptyEnv` (envs/empty.py:~1-55) — a walled rectangle with a goal
fixed at `(width-2, height-2)`; the agent starts at `(1, 1)` facing right for
the fixed variants or is placed uniformly at random (`place_agent`) for the
`-Random-` variants. Mission: "get to the green goal square".
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from minigrid_tpu.core import constants as C
from minigrid_tpu.core import grid as G
from minigrid_tpu.core import sampling
from minigrid_tpu.core.state import EnvConfig, EnvState, empty_state
from minigrid_tpu.core.step import base_step
from minigrid_tpu.envs import missions

MISSION = missions.register_template("get to the green goal square")

FAMILY = "empty"


def generate(key: jax.Array, config: EnvConfig) -> EnvState:
    key, k_reset = jax.random.split(key)
    state = empty_state(config, rng=k_reset)
    w, h = config.width, config.height

    grid = G.wall_rect(state.grid, 0, 0, w, h)
    grid = G.set_cell(grid, w - 2, h - 2, (C.GOAL, C.GREEN, 0, 0, 0))

    if config.agent_start_pos is not None:
        agent_pos = jnp.asarray(config.agent_start_pos, dtype=jnp.int32)
        agent_dir = jnp.asarray(config.agent_start_dir or 0, dtype=jnp.int32)
    else:
        k_pos, k_dir = jax.random.split(key)
        mask = sampling.free_cell_mask(grid, None)
        x, y = sampling.sample_cell(k_pos, mask)
        agent_pos = jnp.stack([x, y])
        agent_dir = sampling.sample_direction(k_dir)

    return state.replace(
        grid=grid,
        agent_pos=agent_pos,
        agent_dir=agent_dir,
        mission=jnp.asarray(missions.encode(MISSION)),
    )


step = base_step
