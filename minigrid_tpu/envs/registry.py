"""Declarative environment registry.

Reference: `gym_minigrid/register.py` (~25 LoC) forwards to gym's global
registry and keeps `env_list` for the test sweep. Here the registry maps each
env id to a frozen `(config, generate, step)` triple returning pure
functions — `make()` never instantiates stateful objects, so every
registered id is a jit-specializable program.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List

from minigrid_tpu.core.state import EnvConfig
from minigrid_tpu.envs.base import Env, GenerateFn, StepFn


@dataclasses.dataclass(frozen=True)
class EnvSpec:
    env_id: str
    config: EnvConfig
    generate: GenerateFn
    step: StepFn
    reward_threshold: float = 0.95


registry: Dict[str, EnvSpec] = {}

# Registration-order id list, iterated by the test sweep and benchmark —
# the analogue of the reference's `env_list` (register.py:~5).
env_list: List[str] = []


def register(
    env_id: str,
    config: EnvConfig,
    generate: GenerateFn,
    step: StepFn,
    reward_threshold: float = 0.95,
) -> None:
    assert env_id not in registry, f"duplicate env id: {env_id}"
    registry[env_id] = EnvSpec(env_id, config, generate, step, reward_threshold)
    env_list.append(env_id)


def make(env_id: str) -> Env:
    """Resolve an env id to a pure-functional `Env` (the reference's
    `gym.make`, minus the object construction)."""
    # Ensure the env zoo is imported (registration-by-import, like the
    # reference's envs/__init__.py star-import).
    import minigrid_tpu.envs  # noqa: F401

    if env_id not in registry:
        raise KeyError(
            f"unknown env id {env_id!r}; known: {sorted(registry)[:10]}..."
        )
    spec = registry[env_id]
    return Env(
        env_id=env_id,
        config=spec.config,
        generate=spec.generate,
        transition=spec.step,
    )
