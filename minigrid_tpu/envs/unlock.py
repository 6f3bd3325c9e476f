"""Unlock environment.

Reference: `UnlockEnv(RoomGrid)` (envs/unlock.py:~1-50) — two rooms joined
by a locked door of random color; the matching key lies in the start room.
Toggling the door open yields reward and ends the episode.
`aux[0:2]` = door position.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from minigrid_tpu.core import constants as C
from minigrid_tpu.core.state import Actions, EnvConfig, EnvState, empty_state
from minigrid_tpu.core.step import StepResult, base_step, success_reward
from minigrid_tpu.envs import missions, roomgrid

MISSION = missions.register_template("open the door")


def generate(key: jax.Array, config: EnvConfig) -> EnvState:
    key, k_reset = jax.random.split(key)
    state = empty_state(config, rng=k_reset)
    ks = jax.random.split(key, 4)

    rg = roomgrid.init(ks[0], config, state.grid)
    color = roomgrid.rand_color(ks[1])
    rg = roomgrid.add_door(rg, config, 0, 0, roomgrid.RIGHT, color, True)
    door_pos = rg.door_pos[0, 0, roomgrid.RIGHT]
    rg, _, _, _, _ = roomgrid.add_object(rg, config, ks[2], 0, 0, kind=C.KEY, color=color)
    rg, agent_dir = roomgrid.place_agent(rg, config, ks[3], 0, 0)

    aux = state.aux.at[0].set(door_pos[0]).at[1].set(door_pos[1])
    return state.replace(
        grid=rg.grid,
        agent_pos=rg.agent_pos,
        agent_dir=agent_dir,
        aux=aux,
        mission=jnp.asarray(missions.encode(MISSION)),
    )


def step(state: EnvState, action: jnp.ndarray, config: EnvConfig) -> StepResult:
    action = jnp.asarray(action, dtype=jnp.int32)
    res = base_step(state, action, config)
    aux = res.state.aux
    door_open = (
        (action == Actions.toggle)
        & (res.state.grid[aux[1], aux[0], 0] == C.DOOR)
        & (res.state.grid[aux[1], aux[0], 2] == C.STATE_OPEN)
    )
    reward = jnp.where(
        door_open, success_reward(res.state.step_count, config.max_steps), res.reward
    )
    terminated = res.terminated | door_open
    return StepResult(res.state, reward, terminated, res.truncated)
