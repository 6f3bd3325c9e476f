"""Playground sandbox environment (no reward).

Reference: `PlaygroundV0` (envs/playground_v0.py:~1-90) — a 19×19 grid of
3×3 rooms with random-colored doors between neighbors and 12 random
objects scattered around; empty mission, no reward.
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
from minigrid_tpu.envs.roomgrid import rand_color

NUM_OBJECTS = 12


def generate(key: jax.Array, config: EnvConfig) -> EnvState:
    key, k_reset = jax.random.split(key)
    state = empty_state(config, rng=k_reset)
    w, h = config.width, config.height
    room_w, room_h = w // 3, h // 3

    grid = G.wall_rect(state.grid, 0, 0, w, h)

    keys = iter(jax.random.split(key, 9 * 2 * 2 + NUM_OBJECTS * 3 + 2))
    z = jnp.uint8(0)
    for j in range(3):
        for i in range(3):
            x_l, y_t = i * room_w, j * room_h
            x_r, y_b = x_l + room_w, y_t + room_h
            if i + 1 < 3:
                grid = G.vert_wall(grid, x_r, y_t, room_h)
                dy = jax.random.randint(next(keys), (), y_t + 1, y_b - 1)
                cell = jnp.stack(
                    [jnp.uint8(C.DOOR), rand_color(next(keys)),
                     jnp.uint8(C.STATE_CLOSED), z, z]
                )
                grid = G.set_cell(grid, x_r, dy, cell)
            if j + 1 < 3:
                grid = G.horz_wall(grid, x_l, y_b, room_w)
                dx = jax.random.randint(next(keys), (), x_l + 1, x_r - 1)
                cell = jnp.stack(
                    [jnp.uint8(C.DOOR), rand_color(next(keys)),
                     jnp.uint8(C.STATE_CLOSED), z, z]
                )
                grid = G.set_cell(grid, dx, y_b, cell)

    for _ in range(NUM_OBJECTS):
        t = jnp.asarray([C.KEY, C.BALL, C.BOX], jnp.uint8)[
            jax.random.randint(next(keys), (), 0, 3)
        ]
        col = rand_color(next(keys))
        x, y = sampling.sample_cell(next(keys), sampling.free_cell_mask(grid, None))
        grid = G.set_cell(grid, x, y, jnp.stack([t, col, z, z, z]))

    ax, ay = sampling.sample_cell(next(keys), sampling.free_cell_mask(grid, None))
    agent_pos = jnp.stack([ax, ay])
    agent_dir = sampling.sample_direction(next(keys))

    return state.replace(
        grid=grid,
        agent_pos=agent_pos,
        agent_dir=agent_dir,
        mission=jnp.asarray(missions.encode(0)),  # empty mission
    )


step = base_step
