"""Unlock-pickup environments (plain and blocked).

Reference: `UnlockPickupEnv` (envs/unlockpickup.py:~1-55) — a box of random
color sits in the right room behind a locked door; key in the start room;
picking up the box succeeds. `BlockedUnlockPickupEnv`
(envs/blockedunlockpickup.py:~1-60) additionally parks a ball of random
color directly in front of the door, which must be moved away first.
`aux[0]` = target type, `aux[1]` = target color. The blocked variant is
selected by `config.extras == ("blocked",)`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from minigrid_tpu.core import constants as C
from minigrid_tpu.core import grid as G
from minigrid_tpu.core.state import (
    Actions,
    CARRY_COLOR,
    CARRY_TYPE,
    EnvConfig,
    EnvState,
    empty_state,
)
from minigrid_tpu.core.step import StepResult, base_step, success_reward
from minigrid_tpu.envs import missions, roomgrid

MISSION = missions.register_template("pick up the {c0} {t1}")


def generate(key: jax.Array, config: EnvConfig) -> EnvState:
    key, k_reset = jax.random.split(key)
    state = empty_state(config, rng=k_reset)
    blocked = "blocked" in config.extras
    ks = jax.random.split(key, 6)

    rg = roomgrid.init(ks[0], config, state.grid)
    # Box in the right room (random color).
    rg, obj_type, obj_color, _, _ = roomgrid.add_object(
        rg, config, ks[1], 1, 0, kind=C.BOX
    )
    door_color = roomgrid.rand_color(ks[2])
    rg = roomgrid.add_door(rg, config, 0, 0, roomgrid.RIGHT, door_color, True)
    if blocked:
        pos = rg.door_pos[0, 0, roomgrid.RIGHT]
        ball = jnp.stack(
            [jnp.uint8(C.BALL), roomgrid.rand_color(ks[3]), jnp.uint8(0),
             jnp.uint8(0), jnp.uint8(0)]
        )
        rg = rg._replace(grid=G.set_cell(rg.grid, pos[0] - 1, pos[1], ball))
    rg, _, _, _, _ = roomgrid.add_object(
        rg, config, ks[4], 0, 0, kind=C.KEY, color=door_color
    )
    rg, agent_dir = roomgrid.place_agent(rg, config, ks[5], 0, 0)

    aux = state.aux.at[0].set(obj_type.astype(jnp.int32)).at[1].set(
        obj_color.astype(jnp.int32)
    )
    mission = (
        jnp.zeros_like(state.mission)
        .at[0].set(MISSION)
        .at[1].set(obj_color.astype(jnp.int32))
        .at[2].set(obj_type.astype(jnp.int32))
    )
    return state.replace(
        grid=rg.grid,
        agent_pos=rg.agent_pos,
        agent_dir=agent_dir,
        aux=aux,
        mission=mission,
    )


def pickup_target_step(
    state: EnvState, action: jnp.ndarray, config: EnvConfig
) -> StepResult:
    """Shared hook: pickup action that leaves the agent carrying the target
    (type, color) from aux[0:2] → reward + done (unlockpickup.py:~40-55)."""
    action = jnp.asarray(action, dtype=jnp.int32)
    res = base_step(state, action, config)
    carrying = res.state.carrying
    aux = res.state.aux
    got = (
        (action == Actions.pickup)
        & (carrying[CARRY_TYPE].astype(jnp.int32) == aux[0])
        & (carrying[CARRY_COLOR].astype(jnp.int32) == aux[1])
    )
    reward = jnp.where(
        got, success_reward(res.state.step_count, config.max_steps), res.reward
    )
    terminated = res.terminated | got
    return StepResult(res.state, reward, terminated, res.truncated)


step = pickup_target_step
