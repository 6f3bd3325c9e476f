"""Functional wrapper combinators.

Each wrapper takes an `Env` and returns a new `Env` with a different
observation encoder (or step transform) — all still pure functions, so the
wrapped env jits/vmaps exactly like the base env. Host-stateful wrappers
(`ReseedWrapper`, exact `ActionBonus`/`StateBonus` hash tables,
`FlatObsWrapper`'s mission-string one-hot) live at the gymnasium adapter
level in `minigrid_tpu.compat`; this module provides their device-resident
equivalents where those exist.

Reference behaviors: gym_minigrid/wrappers.py:~12-345.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from minigrid_tpu.core import constants as C
from minigrid_tpu.core.grid import encode
from minigrid_tpu.core.obs import gen_obs, gen_obs_image
from minigrid_tpu.core.state import EnvConfig, EnvState
from minigrid_tpu.core.step import StepResult
from minigrid_tpu.envs.base import Env


def img_obs(env: Env) -> Env:
    """`ImgObsWrapper` (wrappers.py:~108): obs is the raw image only."""

    def observe(state: EnvState, config: EnvConfig):
        return gen_obs_image(state, config)

    return dataclasses.replace(env, observe=observe)


def full_obs(env: Env) -> Env:
    """`FullyObsWrapper` (wrappers.py:~238): obs image is the whole map's
    encoding with the agent cell overwritten as (agent=10, red, dir)."""

    def observe(state: EnvState, config: EnvConfig):
        img = encode(state.grid)  # (W, H, 3), [x, y]-indexed
        agent = jnp.stack(
            [
                jnp.uint8(C.AGENT),
                jnp.uint8(C.RED),
                state.agent_dir.astype(jnp.uint8),
            ]
        )
        img = img.at[state.agent_pos[0], state.agent_pos[1], :].set(agent)
        return {
            "image": img,
            "direction": state.agent_dir,
            "mission": state.mission,
        }

    return dataclasses.replace(env, observe=observe)


def one_hot_partial_obs(env: Env) -> Env:
    """`OneHotPartialObsWrapper` (wrappers.py:~125): (V, V, 3) id triples →
    (V, V, 20) one-hot over 11 types + 6 colors + 3 states."""

    def observe(state: EnvState, config: EnvConfig):
        img = gen_obs_image(state, config).astype(jnp.int32)
        widths = (C.NUM_OBJECTS, C.NUM_COLORS, C.NUM_STATES)
        feats = [
            (img[..., i : i + 1] == jnp.arange(w)).astype(jnp.uint8)
            for i, w in enumerate(widths)
        ]
        return {
            "image": jnp.concatenate(feats, axis=-1),
            "direction": state.agent_dir,
            "mission": state.mission,
        }

    return dataclasses.replace(env, observe=observe)


def rgb_img_obs(env: Env, tile_size: int = 8) -> Env:
    """`RGBImgObsWrapper` (wrappers.py:~168): obs image is the full-frame
    RGB render without highlight."""
    from minigrid_tpu.render.render import render_grid

    def observe(state: EnvState, config: EnvConfig):
        img = render_grid(
            state.grid,
            tile_size=tile_size,
            agent_pos=state.agent_pos,
            agent_dir=state.agent_dir,
        )
        return {
            "image": img,
            "direction": state.agent_dir,
            "mission": state.mission,
        }

    return dataclasses.replace(env, observe=observe)


def rgb_img_partial_obs(env: Env, tile_size: int = 8) -> Env:
    """`RGBImgPartialObsWrapper` (wrappers.py:~203): obs image is the
    rendered egocentric view."""
    from minigrid_tpu.render.render import render_obs_image

    def observe(state: EnvState, config: EnvConfig):
        img = render_obs_image(gen_obs_image(state, config), tile_size=tile_size)
        return {
            "image": img,
            "direction": state.agent_dir,
            "mission": state.mission,
        }

    return dataclasses.replace(env, observe=observe)


def view_size(env: Env, agent_view_size: int = 7) -> Env:
    """`ViewSizeWrapper` (wrappers.py:~318): change the egocentric view
    size (odd, ≥ 3)."""
    assert agent_view_size % 2 == 1 and agent_view_size >= 3
    config = dataclasses.replace(env.config, agent_view_size=agent_view_size)
    return dataclasses.replace(env, config=config)


@dataclasses.dataclass(frozen=True)
class CountedEnv:
    """An env whose step additionally threads a dense visit-count table and
    adds `1/sqrt(count)` exploration bonuses to the reward.

    Device-resident equivalents of `StateBonus`/`ActionBonus`
    (wrappers.py:~38-105). The reference keys an unbounded Python dict on
    `tuple(agent_pos)` / `(env.hash(), action)`; here the table is a dense
    array (position, or position×dir×action — a complete key for the
    agent-pose component of the state hash). Exact-string-hash tables live
    in the host adapter (`minigrid_tpu.compat`).

        cenv = state_bonus(env)
        counts = cenv.init_counts()
        state, obs = cenv.env.reset(key)
        counts, state, obs, r, term, trunc = cenv.step(counts, state, a)
    """

    env: Env
    keyed_on_action: bool

    def init_counts(self) -> jnp.ndarray:
        h, w = self.env.config.height, self.env.config.width
        size = h * w * (4 * 7 if self.keyed_on_action else 1)
        return jnp.zeros((size,), jnp.int32)

    def step(self, counts: jnp.ndarray, state: EnvState, action):
        env = self.env
        res = env.transition(state, jnp.asarray(action), env.config)
        pos = res.state.agent_pos
        w = env.config.width
        idx = pos[1] * w + pos[0]
        if self.keyed_on_action:
            idx = (idx * 4 + res.state.agent_dir) * 7 + jnp.asarray(
                action, jnp.int32
            ) % 7
        counts = counts.at[idx].add(1)
        bonus = 1.0 / jnp.sqrt(counts[idx].astype(jnp.float32))
        obs = env.observe(res.state, env.config)
        return counts, res.state, obs, res.reward + bonus, res.terminated, res.truncated


def state_bonus(env: Env) -> CountedEnv:
    """`StateBonus` (wrappers.py:~73): bonus keyed on the agent position."""
    return CountedEnv(env=env, keyed_on_action=False)


def action_bonus(env: Env) -> CountedEnv:
    """`ActionBonus` (wrappers.py:~38): bonus keyed on (pose, action)."""
    return CountedEnv(env=env, keyed_on_action=True)
