"""Four-rooms environment.

Reference: `FourRoomsEnv` (envs/fourrooms.py:~1-70) — a 19×19 grid split
into 2×2 rooms by a cross of walls, with one random gap in each of the four
wall segments; agent and goal placed uniformly at random.
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

MISSION = missions.register_template("Reach the goal")


def generate(key: jax.Array, config: EnvConfig) -> EnvState:
    key, k_reset = jax.random.split(key)
    state = empty_state(config, rng=k_reset)
    w, h = config.width, config.height
    room_w, room_h = w // 2, h // 2

    grid = G.wall_rect(state.grid, 0, 0, w, h)
    # Cross walls (reference paints per-room segments; the union is the
    # full cross).
    grid = G.vert_wall(grid, room_w, 0)
    grid = G.horz_wall(grid, 0, room_h)

    # One gap per wall segment, matching the reference's four draws:
    # right wall of room (0,0): gap y ∈ [1, room_h)
    # bottom wall of room (0,0): gap x ∈ [1, room_w)
    # bottom wall of room (0,1): gap x ∈ [room_w+1, w-1)
    # right wall of room (1,0): gap y ∈ [room_h+1, h-1)
    ks = jax.random.split(key, 7)
    gap_v0 = jax.random.randint(ks[0], (), 1, room_h, dtype=jnp.int32)
    gap_h0 = jax.random.randint(ks[1], (), 1, room_w, dtype=jnp.int32)
    gap_h1 = jax.random.randint(ks[2], (), room_w + 1, w - 1, dtype=jnp.int32)
    gap_v1 = jax.random.randint(ks[3], (), room_h + 1, h - 1, dtype=jnp.int32)
    grid = G.set_cell(grid, room_w, gap_v0, G.EMPTY_CELL)
    grid = G.set_cell(grid, gap_h0, room_h, G.EMPTY_CELL)
    grid = G.set_cell(grid, gap_h1, room_h, G.EMPTY_CELL)
    grid = G.set_cell(grid, room_w, gap_v1, G.EMPTY_CELL)

    # Random agent, then random goal avoiding the agent (minigrid.py:~897).
    ax, ay = sampling.sample_cell(ks[4], sampling.free_cell_mask(grid, None))
    agent_pos = jnp.stack([ax, ay])
    agent_dir = sampling.sample_direction(ks[5])
    gx, gy = sampling.sample_cell(ks[6], sampling.free_cell_mask(grid, agent_pos))
    grid = G.set_cell(grid, gx, gy, (C.GOAL, C.GREEN, 0, 0, 0))

    return state.replace(
        grid=grid,
        agent_pos=agent_pos,
        agent_dir=agent_dir,
        mission=jnp.asarray(missions.encode(MISSION)),
    )


step = base_step
