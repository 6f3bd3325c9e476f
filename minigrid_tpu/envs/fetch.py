"""Fetch environment.

Reference: `FetchEnv` (envs/fetch.py:~1-95) — `numObjs` random keys/balls of
random colors; one is the target. Carrying the target → reward and done;
carrying anything else → done with 0. Mission drawn from five synonym
templates. `aux[0]` = target type, `aux[1]` = target color.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from minigrid_tpu.core import constants as C
from minigrid_tpu.core import grid as G
from minigrid_tpu.core import sampling
from minigrid_tpu.core.state import (
    CARRY_COLOR,
    CARRY_TYPE,
    EnvConfig,
    EnvState,
    empty_state,
)
from minigrid_tpu.core.step import StepResult, base_step, success_reward
from minigrid_tpu.envs import missions

# Five synonym templates (reference fetch.py:~40-55), slot c0=color t1=type.
MISSIONS = [
    missions.register_template("get a {c0} {t1}"),
    missions.register_template("go get a {c0} {t1}"),
    missions.register_template("fetch a {c0} {t1}"),
    missions.register_template("go fetch a {c0} {t1}"),
    missions.register_template("you must fetch a {c0} {t1}"),
]


def generate(key: jax.Array, config: EnvConfig) -> EnvState:
    key, k_reset = jax.random.split(key)
    state = empty_state(config, rng=k_reset)
    w, h = config.width, config.height
    n = config.num_objs

    grid = G.wall_rect(state.grid, 0, 0, w, h)

    ks = jax.random.split(key, 3 * n + 4)
    obj_types = jnp.zeros((n,), jnp.uint8)
    obj_colors = jnp.zeros((n,), jnp.uint8)
    for i in range(n):
        t = jnp.where(
            jax.random.randint(ks[3 * i], (), 0, 2) == 0,
            jnp.uint8(C.KEY),
            jnp.uint8(C.BALL),
        )
        # _rand_color draws from the sorted COLOR_NAMES list; map list index
        # back to color id.
        color_order = jnp.asarray(
            [C.COLOR_TO_IDX[name] for name in C.COLOR_NAMES], jnp.uint8
        )
        col = color_order[jax.random.randint(ks[3 * i + 1], (), 0, 6)]
        x, y = sampling.sample_cell(
            ks[3 * i + 2], sampling.free_cell_mask(grid, None)
        )
        z = jnp.uint8(0)
        grid = G.set_cell(grid, x, y, jnp.stack([t, col, z, z, z]))
        obj_types = obj_types.at[i].set(t)
        obj_colors = obj_colors.at[i].set(col)

    ax, ay = sampling.sample_cell(ks[-4], sampling.free_cell_mask(grid, None))
    agent_pos = jnp.stack([ax, ay])
    agent_dir = sampling.sample_direction(ks[-3])

    target = jax.random.randint(ks[-2], (), 0, n)
    t_type = obj_types[target].astype(jnp.int32)
    t_color = obj_colors[target].astype(jnp.int32)
    tmpl = jnp.asarray(MISSIONS, jnp.int32)[jax.random.randint(ks[-1], (), 0, 5)]

    mission = jnp.zeros_like(state.mission).at[0].set(tmpl)
    mission = mission.at[1].set(t_color).at[2].set(t_type)
    aux = state.aux.at[0].set(t_type).at[1].set(t_color)

    return state.replace(
        grid=grid, agent_pos=agent_pos, agent_dir=agent_dir,
        mission=mission, aux=aux,
    )


def step(state: EnvState, action: jnp.ndarray, config: EnvConfig) -> StepResult:
    res = base_step(state, action, config)
    carrying = res.state.carrying
    has = carrying[CARRY_TYPE] > 0
    match = (
        has
        & (carrying[CARRY_TYPE].astype(jnp.int32) == res.state.aux[0])
        & (carrying[CARRY_COLOR].astype(jnp.int32) == res.state.aux[1])
    )
    reward = jnp.where(
        match, success_reward(res.state.step_count, config.max_steps), res.reward
    )
    reward = jnp.where(has & ~match, 0.0, reward)
    terminated = res.terminated | has
    return StepResult(res.state, reward, terminated, res.truncated)
