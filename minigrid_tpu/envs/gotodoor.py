"""Go-to-door environment.

Reference: `GoToDoorEnv` (envs/gotodoor.py:~1-85) — the room's width/height
are re-randomized in [5, size] each reset (the grid array stays size×size;
cells beyond the sub-room are unreachable), four doors of distinct colors
sit at random positions on the four walls, and the agent must perform the
`done` action while cross-adjacent to the target door. Toggling any door
ends the episode. `aux[0:2]` = target position, `aux[2]` = target color.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from minigrid_tpu.core import constants as C
from minigrid_tpu.core import grid as G
from minigrid_tpu.core import sampling
from minigrid_tpu.core.state import Actions, EnvConfig, EnvState, empty_state
from minigrid_tpu.core.step import StepResult, base_step, success_reward
from minigrid_tpu.envs import missions

MISSION = missions.register_template("go to the {c0} door")

# _rand_elem draws colors in sorted-name order (reference minigrid.py:~25).
COLOR_ORDER = [C.COLOR_TO_IDX[name] for name in C.COLOR_NAMES]


def generate(key: jax.Array, config: EnvConfig) -> EnvState:
    key, k_reset = jax.random.split(key)
    state = empty_state(config, rng=k_reset)
    size = config.width

    ks = jax.random.split(key, 10)
    rw = jax.random.randint(ks[0], (), 5, size + 1, dtype=jnp.int32)
    rh = jax.random.randint(ks[1], (), 5, size + 1, dtype=jnp.int32)

    # Sub-room wall rectangle with dynamic dims.
    grid = state.grid
    grid = G.paint_rect(grid, 0, 0, rw, 1, G.WALL_CELL)
    grid = G.paint_rect(grid, 0, rh - 1, rw, rh, G.WALL_CELL)
    grid = G.paint_rect(grid, 0, 0, 1, rh, G.WALL_CELL)
    grid = G.paint_rect(grid, rw - 1, 0, rw, rh, G.WALL_CELL)

    # Four door positions: top, bottom, left, right walls.
    dx_top = jax.random.randint(ks[2], (), 2, rw - 2)
    dx_bot = jax.random.randint(ks[3], (), 2, rw - 2)
    dy_left = jax.random.randint(ks[4], (), 2, rh - 2)
    dy_right = jax.random.randint(ks[5], (), 2, rh - 2)
    door_x = jnp.stack([dx_top, dx_bot, jnp.int32(0), rw - 1])
    door_y = jnp.stack([jnp.int32(0), rh - 1, dy_left, dy_right])

    # Four distinct colors = first four of a random color permutation.
    colors = jnp.asarray(COLOR_ORDER, jnp.uint8)[
        jax.random.permutation(ks[6], 6)[:4]
    ]
    for i in range(4):
        cell = jnp.stack(
            [jnp.uint8(C.DOOR), colors[i], jnp.uint8(C.STATE_CLOSED),
             jnp.uint8(0), jnp.uint8(0)]
        )
        grid = G.set_cell(grid, door_x[i], door_y[i], cell)

    # Agent inside the sub-room.
    room = sampling.rect_mask(size, size, 0, 0, rw, rh)
    ax, ay = sampling.sample_cell(ks[7], sampling.free_cell_mask(grid, None) & room)
    agent_pos = jnp.stack([ax, ay])
    agent_dir = sampling.sample_direction(ks[8])

    target = jax.random.randint(ks[9], (), 0, 4)
    t_color = colors[target].astype(jnp.int32)
    aux = (
        state.aux.at[0].set(door_x[target]).at[1].set(door_y[target])
        .at[2].set(t_color)
    )
    mission = jnp.zeros_like(state.mission).at[0].set(MISSION).at[1].set(t_color)

    return state.replace(
        grid=grid, agent_pos=agent_pos, agent_dir=agent_dir,
        mission=mission, aux=aux,
    )


def step(state: EnvState, action: jnp.ndarray, config: EnvConfig) -> StepResult:
    action = jnp.asarray(action, dtype=jnp.int32)
    res = base_step(state, action, config)
    pos = res.state.agent_pos
    tx, ty = res.state.aux[0], res.state.aux[1]
    # Cross-adjacency (reference gotodoor.py:~70-80).
    near = ((pos[0] == tx) & (jnp.abs(pos[1] - ty) == 1)) | (
        (pos[1] == ty) & (jnp.abs(pos[0] - tx) == 1)
    )
    is_done_action = action == Actions.done
    reward = jnp.where(
        is_done_action & near,
        success_reward(res.state.step_count, config.max_steps),
        res.reward,
    )
    terminated = res.terminated | is_done_action | (action == Actions.toggle)
    return StepResult(res.state, reward, terminated, res.truncated)
