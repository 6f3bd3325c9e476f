"""Go-to-object environment.

Reference: `GoToObjectEnv` (envs/gotoobject.py:~1-80) — `numObjs` distinct
(type, color) objects among {key, ball, box}×colors placed at random; the
agent must perform `done` while box-adjacent (Chebyshev distance ≤ 1) to
the target object. Toggle ends the episode.
`aux[0:2]` = target position, `aux[2]` = target type, `aux[3]` = color.
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

MISSION = missions.register_template("go to the {c0} {t1}")

OBJ_TYPES = (C.KEY, C.BALL, C.BOX)


def generate(key: jax.Array, config: EnvConfig) -> EnvState:
    key, k_reset = jax.random.split(key)
    state = empty_state(config, rng=k_reset)
    w, h = config.width, config.height
    n = config.num_objs

    grid = G.wall_rect(state.grid, 0, 0, w, h)

    # Distinct (type, color) pairs = first n of a permutation of the 18
    # candidates (≡ the reference's resample-until-unique loop in
    # distribution).
    ks = jax.random.split(key, n + 5)
    pairs = jax.random.permutation(ks[0], 18)[:n]
    types = jnp.asarray(OBJ_TYPES, jnp.uint8)[pairs // 6]
    colors = pairs.astype(jnp.uint8) % 6

    xs = jnp.zeros((n,), jnp.int32)
    ys = jnp.zeros((n,), jnp.int32)
    z = jnp.uint8(0)
    for i in range(n):
        x, y = sampling.sample_cell(ks[1 + i], sampling.free_cell_mask(grid, None))
        grid = G.set_cell(grid, x, y, jnp.stack([types[i], colors[i], z, z, z]))
        xs = xs.at[i].set(x)
        ys = ys.at[i].set(y)

    ax, ay = sampling.sample_cell(ks[-4], sampling.free_cell_mask(grid, None))
    agent_pos = jnp.stack([ax, ay])
    agent_dir = sampling.sample_direction(ks[-3])

    target = jax.random.randint(ks[-2], (), 0, n)
    t_type = types[target].astype(jnp.int32)
    t_color = colors[target].astype(jnp.int32)
    aux = (
        state.aux.at[0].set(xs[target]).at[1].set(ys[target])
        .at[2].set(t_type).at[3].set(t_color)
    )
    mission = (
        jnp.zeros_like(state.mission)
        .at[0].set(MISSION).at[1].set(t_color).at[2].set(t_type)
    )
    return state.replace(
        grid=grid, agent_pos=agent_pos, agent_dir=agent_dir,
        mission=mission, aux=aux,
    )


def step(state: EnvState, action: jnp.ndarray, config: EnvConfig) -> StepResult:
    action = jnp.asarray(action, dtype=jnp.int32)
    res = base_step(state, action, config)
    pos = res.state.agent_pos
    tx, ty = res.state.aux[0], res.state.aux[1]
    near = (jnp.abs(pos[0] - tx) <= 1) & (jnp.abs(pos[1] - ty) <= 1)
    is_done_action = action == Actions.done
    reward = jnp.where(
        is_done_action & near,
        success_reward(res.state.step_count, config.max_steps),
        res.reward,
    )
    terminated = res.terminated | is_done_action | (action == Actions.toggle)
    return StepResult(res.state, reward, terminated, res.truncated)
