"""Put-near environment.

Reference: `PutNearEnv` (envs/putnear.py:~1-105) — distinct objects placed
so that no two are box-adjacent; the agent must pick up the `move` object
and drop it within Chebyshev distance 1 of the `target` object. Picking up
(or holding, on a pickup action) the wrong object terminates; any drop
after carrying terminates, with reward only when the drop landed near the
target. aux: [0]=move_type [1]=move_color [2:4]=target_pos
[4]=target_type [5]=target_color.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from minigrid_tpu.core import constants as C
from minigrid_tpu.core import grid as G
from minigrid_tpu.core import sampling
from minigrid_tpu.core.state import (
    Actions,
    CARRY_COLOR,
    CARRY_TYPE,
    EnvConfig,
    EnvState,
    empty_state,
)
from minigrid_tpu.core.step import StepResult, base_step, success_reward
from minigrid_tpu.envs import missions

MISSION = missions.register_template("put the {c0} {t1} near the {c2} {t3}")

OBJ_TYPES = (C.KEY, C.BALL, C.BOX)


def generate(key: jax.Array, config: EnvConfig) -> EnvState:
    key, k_reset = jax.random.split(key)
    state = empty_state(config, rng=k_reset)
    w, h = config.width, config.height
    n = config.num_objs

    grid = G.wall_rect(state.grid, 0, 0, w, h)

    ks = jax.random.split(key, n + 5)
    pairs = jax.random.permutation(ks[0], 18)[:n]
    types = jnp.asarray(OBJ_TYPES, jnp.uint8)[pairs // 6]
    colors = pairs.astype(jnp.uint8) % 6

    # Sequential placement; each object rejects the 3×3 neighborhoods of
    # all previously placed objects (reference's `near_obj` reject_fn).
    not_near = jnp.ones((h, w), dtype=bool)
    xs = jnp.zeros((n,), jnp.int32)
    ys = jnp.zeros((n,), jnp.int32)
    z = jnp.uint8(0)
    for i in range(n):
        x, y = sampling.sample_cell(
            ks[1 + i], sampling.free_cell_mask(grid, None) & not_near
        )
        grid = G.set_cell(grid, x, y, jnp.stack([types[i], colors[i], z, z, z]))
        not_near &= ~sampling.rect_mask(h, w, x - 1, y - 1, 3, 3)
        xs = xs.at[i].set(x)
        ys = ys.at[i].set(y)

    ax, ay = sampling.sample_cell(ks[-4], sampling.free_cell_mask(grid, None))
    agent_pos = jnp.stack([ax, ay])
    agent_dir = sampling.sample_direction(ks[-3])

    move = jax.random.randint(ks[-2], (), 0, n)
    # Target ≠ move: draw from the other n-1 indices.
    t_off = jax.random.randint(ks[-1], (), 1, n)
    target = (move + t_off) % n

    aux = (
        state.aux
        .at[0].set(types[move].astype(jnp.int32))
        .at[1].set(colors[move].astype(jnp.int32))
        .at[2].set(xs[target]).at[3].set(ys[target])
        .at[4].set(types[target].astype(jnp.int32))
        .at[5].set(colors[target].astype(jnp.int32))
    )
    mission = (
        jnp.zeros_like(state.mission)
        .at[0].set(MISSION)
        .at[1].set(colors[move].astype(jnp.int32))
        .at[2].set(types[move].astype(jnp.int32))
        .at[3].set(colors[target].astype(jnp.int32))
        .at[4].set(types[target].astype(jnp.int32))
    )
    return state.replace(
        grid=grid, agent_pos=agent_pos, agent_dir=agent_dir,
        mission=mission, aux=aux,
    )


def step(state: EnvState, action: jnp.ndarray, config: EnvConfig) -> StepResult:
    action = jnp.asarray(action, dtype=jnp.int32)
    pre_carry = state.carrying
    res = base_step(state, action, config)
    aux = res.state.aux
    carrying = res.state.carrying

    # Pickup action while holding the wrong object (whether or not the
    # pickup succeeded this step) terminates.
    holds = carrying[CARRY_TYPE] > 0
    wrong = holds & (
        (carrying[CARRY_TYPE].astype(jnp.int32) != aux[0])
        | (carrying[CARRY_COLOR].astype(jnp.int32) != aux[1])
    )
    pickup_fail = (action == Actions.pickup) & wrong

    # Drop after carrying: always terminates; rewarded iff the object
    # landed (drop succeeded) box-adjacent to the target.
    dropped = (pre_carry[CARRY_TYPE] > 0) & (action == Actions.drop)
    drop_succeeded = dropped & (carrying[CARRY_TYPE] == 0)
    fwd = state.agent_pos + jnp.asarray(C.DIR_TO_VEC)[state.agent_dir]
    near = (jnp.abs(fwd[0] - aux[2]) <= 1) & (jnp.abs(fwd[1] - aux[3]) <= 1)
    reward = jnp.where(
        drop_succeeded & near,
        success_reward(res.state.step_count, config.max_steps),
        res.reward,
    )
    terminated = res.terminated | pickup_fail | dropped
    return StepResult(res.state, reward, terminated, res.truncated)
