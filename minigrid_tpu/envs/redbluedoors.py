"""Red/blue ordered-doors environment.

Reference: `RedBlueDoorEnv` (envs/redbluedoors.py:~1-70) — a `2s × s`
outer area with an `s × s` inner room; a red door on the room's left wall
and a blue door on its right wall at random heights. Opening red then blue
→ reward and done; opening blue while red is still closed → done with 0.
`aux[0:2]` = red door position, `aux[2:4]` = blue door position.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from minigrid_tpu.core import constants as C
from minigrid_tpu.core import grid as G
from minigrid_tpu.core import sampling
from minigrid_tpu.core.state import EnvConfig, EnvState, empty_state
from minigrid_tpu.core.step import StepResult, base_step, success_reward
from minigrid_tpu.envs import missions

MISSION = missions.register_template("open the red door then the blue door")


def generate(key: jax.Array, config: EnvConfig) -> EnvState:
    key, k_reset = jax.random.split(key)
    state = empty_state(config, rng=k_reset)
    size = config.height  # room size; total width is 2*size

    grid = G.wall_rect(state.grid, 0, 0, 2 * size, size)
    grid = G.wall_rect(grid, size // 2, 0, size, size)

    ks = jax.random.split(key, 4)
    # Agent inside the middle room.
    room = sampling.rect_mask(size, 2 * size, size // 2, 0, size, size)
    ax, ay = sampling.sample_cell(ks[0], sampling.free_cell_mask(grid, None) & room)
    agent_pos = jnp.stack([ax, ay])
    agent_dir = sampling.sample_direction(ks[1])

    red_x = jnp.int32(size // 2)
    red_y = jax.random.randint(ks[2], (), 1, size - 1, dtype=jnp.int32)
    grid = G.set_cell(grid, red_x, red_y, (C.DOOR, C.RED, C.STATE_CLOSED, 0, 0))
    blue_x = jnp.int32(size // 2 + size - 1)
    blue_y = jax.random.randint(ks[3], (), 1, size - 1, dtype=jnp.int32)
    grid = G.set_cell(grid, blue_x, blue_y, (C.DOOR, C.BLUE, C.STATE_CLOSED, 0, 0))

    aux = (
        state.aux.at[0].set(red_x).at[1].set(red_y)
        .at[2].set(blue_x).at[3].set(blue_y)
    )
    return state.replace(
        grid=grid,
        agent_pos=agent_pos,
        agent_dir=agent_dir,
        aux=aux,
        mission=jnp.asarray(missions.encode(MISSION)),
    )


def _door_open(grid, x, y):
    return (grid[y, x, 0] == C.DOOR) & (grid[y, x, 2] == C.STATE_OPEN)


def step(state: EnvState, action: jnp.ndarray, config: EnvConfig) -> StepResult:
    aux = state.aux
    red_before = _door_open(state.grid, aux[0], aux[1])
    blue_before = _door_open(state.grid, aux[2], aux[3])

    res = base_step(state, action, config)
    red_after = _door_open(res.state.grid, aux[0], aux[1])
    blue_after = _door_open(res.state.grid, aux[2], aux[3])

    # Reference order: blue-open dominates (success iff red was already
    # open before this step); otherwise opening red after blue was open
    # fails with reward 0.
    success = blue_after & red_before
    fail_blue_first = blue_after & ~red_before
    fail_red_late = ~blue_after & red_after & blue_before

    reward = jnp.where(
        success, success_reward(res.state.step_count, config.max_steps), res.reward
    )
    reward = jnp.where(fail_blue_first | fail_red_late, 0.0, reward)
    terminated = res.terminated | success | fail_blue_first | fail_red_late
    return StepResult(res.state, reward, terminated, res.truncated)
