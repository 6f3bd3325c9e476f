"""The functional environment API.

An `Env` bundles a static `EnvConfig` with two pure functions — a generator
(`reset`) and a transition (`step`) — mirroring the information content of a
reference `MiniGridEnv` subclass (construct + `_gen_grid` + `step`,
minigrid.py:~642-1300) but with zero mutable state: callers thread `EnvState`
explicitly and are free to `jit`, `vmap`, `scan`, and shard everything.

    env = minigrid_tpu.make("MiniGrid-Empty-8x8-v0")
    state, obs = env.reset(jax.random.PRNGKey(0))
    state, obs, r, term, trunc = env.step(state, jnp.int32(2))

Batched use is just `jax.vmap(env.reset)` / `jax.vmap(env.step)`; the
convenience wrappers below pre-bind those.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp

from minigrid_tpu.core.obs import gen_obs
from minigrid_tpu.core.state import EnvConfig, EnvState
from minigrid_tpu.core.step import StepResult

GenerateFn = Callable[[jax.Array, EnvConfig], EnvState]
StepFn = Callable[[EnvState, jnp.ndarray, EnvConfig], StepResult]
ObserveFn = Callable[[EnvState, EnvConfig], Any]

Obs = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class Env:
    """A pure-functional environment (single instance; vmap for batches).

    `observe` is the pluggable observation encoder (default: the
    reference's dict of image/direction/mission); wrappers in
    `minigrid_tpu.wrappers` produce new `Env`s with alternate encoders,
    step transforms, or configs — the functional equivalent of the
    reference's `gym.core.Wrapper` stack (wrappers.py:~12-345).
    """

    env_id: str
    config: EnvConfig
    generate: GenerateFn
    transition: StepFn
    observe: ObserveFn = dataclasses.field(default=gen_obs)

    # ------------------------------------------------------------------ API
    def reset(self, key: jax.Array) -> Tuple[EnvState, Obs]:
        state = self.generate(key, self.config)
        return state, self.observe(state, self.config)

    def step(
        self, state: EnvState, action: jnp.ndarray
    ) -> Tuple[EnvState, Obs, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        res = self.transition(state, jnp.asarray(action), self.config)
        obs = self.observe(res.state, self.config)
        return res.state, obs, res.reward, res.terminated, res.truncated

    # ------------------------------------------------------- batched helpers
    def reset_batch(self, key: jax.Array, batch_size: int) -> Tuple[EnvState, Obs]:
        keys = jax.random.split(key, batch_size)
        return jax.vmap(self.reset)(keys)

    def step_batch(self, states: EnvState, actions: jnp.ndarray):
        return jax.vmap(self.step)(states, actions)

    # ----------------------------------------------------------- metadata
    @property
    def num_actions(self) -> int:
        return self.config.num_actions

    @property
    def obs_shape(self) -> Tuple[int, int, int]:
        v = self.config.agent_view_size
        return (v, v, 3)
