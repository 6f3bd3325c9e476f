"""Auto-reset: fold finished episodes back into the batch on device.

The reference has no vector-env layer at all (SURVEY.md §2.11) — users
re-call `reset()` from Python when `done`. Here the reset is part of the
transition program: when an episode terminates or truncates, the state is
replaced by a freshly generated one via `jax.tree.map(select)`, so a batch
of environments runs forever with zero host round-trips.

Each `EnvState` carries its own PRNG key (`state.rng`); the generator stores
a fresh subkey into the new state, so reset chains are reproducible and
independent across the batch.

Two modes:
  * "regen"  — sample a brand-new layout on every reset (reference
               semantics; generation cost is paid every step in lockstep).
  * "cached" — every reset of an env goes to ONE fixed layout: the one
               generated from the env's stored rng leaf, whose key is
               pinned so later resets replay it. Note `generate(key)`
               stores a fresh *subkey* as `state.rng`, so this fixed
               layout is keyed by that subkey — for random-layout families
               it generally differs from the pre-rollout episode's layout
               (which no array in the state retains once the agent has
               modified the grid). Deterministic-layout families (fixed
               Empty, DistShift) are unaffected: every key generates the
               same layout.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp

from minigrid_tpu.core.state import EnvState
from minigrid_tpu.envs.base import Env


def select_state(done: jnp.ndarray, fresh: EnvState, old: EnvState) -> EnvState:
    """Per-leaf select between a fresh reset state and the stepped state."""

    def pick(a, b):
        d = done.reshape(done.shape + (1,) * (a.ndim - done.ndim))
        return jnp.where(d, a, b)

    return jax.tree.map(pick, fresh, old)


def make_autoreset_step(
    env: Env, mode: str = "regen"
) -> Callable[[EnvState, jnp.ndarray], Tuple[EnvState, dict, jnp.ndarray, jnp.ndarray, jnp.ndarray]]:
    """A single-env step function with auto-reset folded in (vmap for batches).

    Returns `(state, obs, reward, terminated, truncated)` where `state` is
    already the post-reset state when the episode ended and `obs` observes
    that post-reset state — i.e. `obs` is always the next policy input
    (gymnasium vector-`autoreset` semantics: the terminal observation is
    dropped for device residency; reward/flags describe the finishing
    transition). This lets rollout loops carry `obs` in the scan instead of
    re-encoding, so the encoder runs exactly once per step.
    """
    if mode not in ("regen", "cached"):
        raise ValueError(f"unknown autoreset mode {mode!r}")

    def step(state: EnvState, action: jnp.ndarray):
        res = env.transition(state, action, env.config)
        done = res.terminated | res.truncated
        if mode == "regen":
            fresh = env.generate(res.state.rng, env.config)
        else:
            # Same key → same layout, and the key is pinned back into the
            # fresh state so every subsequent reset replays the SAME layout
            # (without the pin, reset k+1 would generate from the subkey
            # stored by reset k — i.e. drift into regen behavior).
            fresh = env.generate(state.rng, env.config)
            fresh = fresh.replace(rng=state.rng)
        new_state = select_state(done, fresh, res.state)
        obs = env.observe(new_state, env.config)
        return new_state, obs, res.reward, res.terminated, res.truncated

    return step
