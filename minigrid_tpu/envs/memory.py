"""T-maze memory environment.

Reference: `MemoryEnv` (envs/memory.py:~1-130) — a small start chamber
holding a cue object (green key or ball), a horizontal hallway, and a
vertical hallway whose two ends hold one key and one ball; stepping onto
the cell beside the object matching the cue succeeds, onto the other fails.
`aux[0:2]` = success position, `aux[2:4]` = failure position. The reference
remaps `pickup` to `toggle` inside `step`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from minigrid_tpu.core import constants as C
from minigrid_tpu.core import grid as G
from minigrid_tpu.core.state import Actions, EnvConfig, EnvState, empty_state
from minigrid_tpu.core.step import StepResult, base_step, success_reward
from minigrid_tpu.envs import missions

MISSION = missions.register_template(
    "go to the matching object at the end of the hallway"
)


def generate(key: jax.Array, config: EnvConfig) -> EnvState:
    key, k_reset = jax.random.split(key)
    state = empty_state(config, rng=k_reset)
    w, h = config.width, config.height
    assert h % 2 == 1

    upper = h // 2 - 2  # upper_room_wall
    lower = h // 2 + 2  # lower_room_wall
    mid = h // 2

    ks = jax.random.split(key, 4)
    if config.random_length:
        hallway_end = jax.random.randint(ks[0], (), 4, w - 2, dtype=jnp.int32)
    else:
        hallway_end = jnp.int32(w - 3)

    grid = G.wall_rect(state.grid, 0, 0, w, h)
    # Start room walls (columns 1..4 on both room-wall rows, plus the two
    # corner cells narrowing into the hallway).
    grid = G.horz_wall(grid, 1, upper, 4)
    grid = G.horz_wall(grid, 1, lower, 4)
    grid = G.set_cell(grid, 4, upper + 1, G.WALL_CELL)
    grid = G.set_cell(grid, 4, lower - 1, G.WALL_CELL)
    # Horizontal hallway walls: columns 5..hallway_end-1 (dynamic end).
    grid = G.paint_rect(grid, 5, upper + 1, hallway_end, upper + 2, G.WALL_CELL)
    grid = G.paint_rect(grid, 5, lower - 1, hallway_end, lower, G.WALL_CELL)
    # Vertical hallway wall: the full hallway_end column except the middle row.
    grid = G.paint_rect(grid, hallway_end, 0, hallway_end + 1, mid, G.WALL_CELL)
    grid = G.paint_rect(grid, hallway_end, mid + 1, hallway_end + 1, h, G.WALL_CELL)

    # Agent anywhere on the hallway row left of (and including) hallway_end.
    agent_x = jax.random.randint(ks[1], (), 1, hallway_end + 1, dtype=jnp.int32)
    agent_pos = jnp.stack([agent_x, jnp.int32(mid)])

    # Cue object in the start room; candidates at the vertical hallway ends.
    cue_is_key = jax.random.randint(ks[2], (), 0, 2) == 0
    cue = jnp.where(cue_is_key, jnp.uint8(C.KEY), jnp.uint8(C.BALL))
    grid = G.set_cell(
        grid, 1, mid - 1,
        jnp.stack([cue, jnp.uint8(C.GREEN), jnp.uint8(0), jnp.uint8(0), jnp.uint8(0)]),
    )

    # other_objs = rand([[Ball, Key], [Key, Ball]]): top candidate then bottom.
    top_is_ball = jax.random.randint(ks[3], (), 0, 2) == 0
    top_obj = jnp.where(top_is_ball, jnp.uint8(C.BALL), jnp.uint8(C.KEY))
    bot_obj = jnp.where(top_is_ball, jnp.uint8(C.KEY), jnp.uint8(C.BALL))
    pos0 = (hallway_end + 1, mid - 2)
    pos1 = (hallway_end + 1, mid + 2)
    green = jnp.uint8(C.GREEN)
    z = jnp.uint8(0)
    grid = G.set_cell(grid, pos0[0], pos0[1], jnp.stack([top_obj, green, z, z, z]))
    grid = G.set_cell(grid, pos1[0], pos1[1], jnp.stack([bot_obj, green, z, z, z]))

    # Success = the cell one step toward the hallway from the matching object.
    top_matches = top_obj == cue
    success_x = hallway_end + 1
    success_y = jnp.where(top_matches, pos0[1] + 1, pos1[1] - 1)
    failure_y = jnp.where(top_matches, pos1[1] - 1, pos0[1] + 1)
    aux = (
        state.aux.at[0].set(success_x).at[1].set(success_y)
        .at[2].set(success_x).at[3].set(failure_y)
    )

    return state.replace(
        grid=grid,
        agent_pos=agent_pos,
        agent_dir=jnp.zeros((), dtype=jnp.int32),
        aux=aux,
        mission=jnp.asarray(missions.encode(MISSION)),
    )


def step(state: EnvState, action: jnp.ndarray, config: EnvConfig) -> StepResult:
    action = jnp.asarray(action, dtype=jnp.int32)
    action = jnp.where(action == Actions.pickup, Actions.toggle, action)
    res = base_step(state, action, config)

    pos = res.state.agent_pos
    on_success = (pos[0] == res.state.aux[0]) & (pos[1] == res.state.aux[1])
    on_failure = (pos[0] == res.state.aux[2]) & (pos[1] == res.state.aux[3])
    reward = jnp.where(
        on_success,
        success_reward(res.state.step_count, config.max_steps),
        res.reward,
    )
    reward = jnp.where(on_failure, 0.0, reward)
    terminated = res.terminated | on_success | on_failure
    return StepResult(res.state, reward, terminated, res.truncated)
