"""Dynamic obstacles environment — the only stochastic-transition env.

Reference: `DynamicObstaclesEnv` (envs/dynamicobstacles.py:~1-110) —
`n_obstacles` blue balls random-walk one cell per step (each resampled
uniformly in its 3×3 neighborhood among free cells, sequentially, staying
put if boxed in); walking `forward` into a non-goal obstacle/wall cell
costs reward −1 and ends the episode. Action space restricted to
{left, right, forward}; invalid actions are remapped to 0.

Obstacle coordinates live in `aux[0:2n]` so the random walk is 2n scalar
reads instead of a grid scan.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from minigrid_tpu.core import constants as C
from minigrid_tpu.core import grid as G
from minigrid_tpu.core import sampling
from minigrid_tpu.core.state import Actions, EnvConfig, EnvState, empty_state
from minigrid_tpu.core.step import StepResult, base_step
from minigrid_tpu.envs import missions

MISSION = missions.register_template("get to the green goal square")

BALL_CELL = (C.BALL, C.BLUE, 0, 0, 0)


def generate(key: jax.Array, config: EnvConfig) -> EnvState:
    key, k_reset = jax.random.split(key)
    state = empty_state(config, rng=k_reset)
    w, h = config.width, config.height

    grid = G.wall_rect(state.grid, 0, 0, w, h)
    grid = G.set_cell(grid, w - 2, h - 2, (C.GOAL, C.GREEN, 0, 0, 0))

    ks = jax.random.split(key, 2 + config.n_obstacles)
    if config.agent_start_pos is not None:
        agent_pos = jnp.asarray(config.agent_start_pos, dtype=jnp.int32)
        agent_dir = jnp.asarray(config.agent_start_dir or 0, dtype=jnp.int32)
    else:
        x, y = sampling.sample_cell(ks[0], sampling.free_cell_mask(grid, None))
        agent_pos = jnp.stack([x, y])
        agent_dir = sampling.sample_direction(ks[1])

    aux = state.aux
    for i in range(config.n_obstacles):
        ox, oy = sampling.sample_cell(
            ks[2 + i], sampling.free_cell_mask(grid, agent_pos)
        )
        grid = G.set_cell(grid, ox, oy, BALL_CELL)
        aux = aux.at[2 * i].set(ox).at[2 * i + 1].set(oy)

    return state.replace(
        grid=grid,
        agent_pos=agent_pos,
        agent_dir=agent_dir,
        aux=aux,
        mission=jnp.asarray(missions.encode(MISSION)),
    )


def step(state: EnvState, action: jnp.ndarray, config: EnvConfig) -> StepResult:
    action = jnp.asarray(action, dtype=jnp.int32)
    # Invalid action (≥ 3) → action 0 (reference dynamicobstacles.py:~60).
    action = jnp.where(action >= config.num_actions, 0, action)

    # Front-cell clearance BEFORE obstacles move decides the collision
    # penalty (reference computes `not_clear` first).
    fwd = state.agent_pos + jnp.asarray(C.DIR_TO_VEC)[state.agent_dir]
    fwd_type = state.grid[fwd[1], fwd[0], 0].astype(jnp.int32)
    not_clear = (fwd_type != C.EMPTY) & (fwd_type != C.GOAL)

    # Sequential random walk: each obstacle resamples within its 3×3 box
    # among free cells (excluding the agent), staying put when boxed in.
    grid = state.grid
    aux = state.aux
    key = state.rng
    h, w = config.height, config.width
    for i in range(config.n_obstacles):
        key, sub = jax.random.split(key)
        ox, oy = aux[2 * i], aux[2 * i + 1]
        box = sampling.rect_mask(h, w, ox - 1, oy - 1, 3, 3)
        valid = box & sampling.free_cell_mask(grid, state.agent_pos)
        nx, ny = sampling.sample_cell(sub, valid)
        movable = jnp.any(valid)
        nx = jnp.where(movable, nx, ox)
        ny = jnp.where(movable, ny, oy)
        grid = G.set_cell(grid, ox, oy, G.EMPTY_CELL)
        grid = G.set_cell(grid, nx, ny, BALL_CELL)
        aux = aux.at[2 * i].set(nx).at[2 * i + 1].set(ny)

    moved = state.replace(grid=grid, aux=aux, rng=key)
    res = base_step(moved, action, config)

    collided = (action == Actions.forward) & not_clear
    reward = jnp.where(collided, -1.0, res.reward)
    terminated = res.terminated | collided
    return StepResult(res.state, reward, terminated, res.truncated)
