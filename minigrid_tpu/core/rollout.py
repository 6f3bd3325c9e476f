"""Device-resident rollout harness.

`lax.scan` over a `vmap`'d auto-resetting step: the whole
(T, B)-trajectory — including per-step observation encoding, episode
bookkeeping, and resets — is one compiled XLA program. The reference's
equivalent is the Python for-loop in benchmark.py:~15-70 (one env, one step
per interpreter iteration).
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from minigrid_tpu.core.autoreset import make_autoreset_step
from minigrid_tpu.core.state import EnvState
from minigrid_tpu.envs.base import Env


class RolloutMetrics(NamedTuple):
    """Running statistics accumulated inside the scan carry (no host sync)."""

    episodes: jnp.ndarray  # () int32 — completed episodes
    total_reward: jnp.ndarray  # () float32 — summed terminal rewards
    total_steps: jnp.ndarray  # () int32
    obs_checksum: jnp.ndarray  # () int32 — folds every obs byte into the
    # carry so the observation encoder is a live data dependency (otherwise
    # XLA dead-code-eliminates obs under a random policy and benchmarks
    # measure a step-only program)
    reset_overlaps: jnp.ndarray = 0  # () int32 — count of resets the
    # packed regen engine DEFERRED to a re-entry pass because the lane's
    # in-chunk fresh template was already consumed (ops/fused_rollout.py
    # freeze/resume commit protocol). Deferred resets are replayed exactly
    # (extra kernel passes, not a distribution deviation); the counter
    # reports the extra work. Always 0 here (the vmap engine regenerates
    # every step).


class Transition(NamedTuple):
    obs_image: jnp.ndarray  # (B, V, V, 3) uint8
    action: jnp.ndarray  # (B,) int32
    reward: jnp.ndarray  # (B,) float32
    done: jnp.ndarray  # (B,) bool


PolicyFn = Callable[[jax.Array, jnp.ndarray], jnp.ndarray]  # (key, obs_img) -> actions


def random_policy(num_actions: int) -> PolicyFn:
    def policy(key: jax.Array, obs_image: jnp.ndarray) -> jnp.ndarray:
        return jax.random.randint(
            key, (obs_image.shape[0],), 0, num_actions, dtype=jnp.int32
        )

    return policy


def build_rollout(
    env: Env,
    num_steps: int,
    policy: Optional[PolicyFn] = None,
    collect: bool = False,
    autoreset_mode: str = "regen",
):
    """Returns `rollout(key, states) -> (states, metrics[, trajectory])`.

    `states` is a batched `EnvState` (from `env.reset_batch`). The returned
    function is jit-compatible; `num_steps` is static. `autoreset_mode` is
    forwarded to `make_autoreset_step` ("regen": new layout per episode;
    "cached": pin each env to its episode-0 layout).
    """
    policy = policy or random_policy(env.num_actions)
    auto_step = jax.vmap(make_autoreset_step(env, mode=autoreset_mode), in_axes=(0, 0))

    def batched_obs(states):
        obs = jax.vmap(lambda s: env.observe(s, env.config))(states)
        return obs["image"] if isinstance(obs, dict) else obs

    def body(carry, key_t):
        # The obs the policy acts on is carried forward from the previous
        # step's auto-reset output — the encoder runs exactly ONCE per step
        # (computing it fresh here would double the obs cost, the single
        # largest term in the step budget).
        states, obs_img, metrics = carry
        actions = policy(key_t, obs_img)
        states, obs, reward, terminated, truncated = auto_step(states, actions)
        next_img = obs["image"] if isinstance(obs, dict) else obs
        done = terminated | truncated
        metrics = RolloutMetrics(
            episodes=metrics.episodes + jnp.sum(done.astype(jnp.int32)),
            total_reward=metrics.total_reward + jnp.sum(reward),
            total_steps=metrics.total_steps + done.shape[0],
            obs_checksum=metrics.obs_checksum + jnp.sum(next_img.astype(jnp.int32)),
            reset_overlaps=metrics.reset_overlaps,
        )
        out = Transition(obs_img, actions, reward, done) if collect else None
        return (states, next_img, metrics), out

    def rollout(key: jax.Array, states: EnvState):
        keys = jax.random.split(key, num_steps)
        metrics0 = RolloutMetrics(
            episodes=jnp.zeros((), jnp.int32),
            total_reward=jnp.zeros((), jnp.float32),
            total_steps=jnp.zeros((), jnp.int32),
            obs_checksum=jnp.zeros((), jnp.int32),
            reset_overlaps=jnp.zeros((), jnp.int32),
        )
        obs0 = batched_obs(states)
        (states, _, metrics), traj = lax.scan(body, (states, obs0, metrics0), keys)
        if collect:
            return states, metrics, traj
        return states, metrics

    return rollout
