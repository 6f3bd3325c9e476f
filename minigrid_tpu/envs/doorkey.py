"""Door-key environment.

Reference: `DoorKeyEnv` (envs/doorkey.py:~1-60) — a vertical wall at random
`splitIdx ∈ [2, width-2)` divides the room; a locked yellow door sits in the
wall at random height, a yellow key lies somewhere left of the wall, the
goal is fixed at `(width-2, height-2)`, and the agent starts in the left
region. `max_steps = 10·size²`.
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

MISSION = missions.register_template(
    "use the key to open the door and then get to the goal"
)


def generate(key: jax.Array, config: EnvConfig) -> EnvState:
    key, k_reset = jax.random.split(key)
    state = empty_state(config, rng=k_reset)
    w, h = config.width, config.height

    grid = G.wall_rect(state.grid, 0, 0, w, h)
    grid = G.set_cell(grid, w - 2, h - 2, (C.GOAL, C.GREEN, 0, 0, 0))

    ks = jax.random.split(key, 5)
    split_x = jax.random.randint(ks[0], (), 2, w - 2, dtype=jnp.int32)
    grid = G.paint_rect(grid, split_x, 0, split_x + 1, h, G.WALL_CELL)

    # Agent in the left region (place_agent(size=(splitIdx, height))).
    left = sampling.rect_mask(h, w, 0, 0, split_x, h)
    ax, ay = sampling.sample_cell(ks[1], sampling.free_cell_mask(grid, None) & left)
    agent_pos = jnp.stack([ax, ay])
    agent_dir = sampling.sample_direction(ks[2])

    # Locked yellow door in the split wall at random y ∈ [1, height-2)
    # (the reference draws `_rand_int(1, width-2)`; grids are square).
    door_y = jax.random.randint(ks[3], (), 1, w - 2, dtype=jnp.int32)
    grid = G.set_cell(
        grid, split_x, door_y, (C.DOOR, C.YELLOW, C.STATE_LOCKED, 0, 0)
    )

    # Yellow key left of the wall, avoiding the agent.
    kx, ky = sampling.sample_cell(
        ks[4], sampling.free_cell_mask(grid, agent_pos) & left
    )
    grid = G.set_cell(grid, kx, ky, (C.KEY, C.YELLOW, 0, 0, 0))

    return state.replace(
        grid=grid,
        agent_pos=agent_pos,
        agent_dir=agent_dir,
        mission=jnp.asarray(missions.encode(MISSION)),
    )


step = base_step
