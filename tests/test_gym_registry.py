"""Global gymnasium registry parity.

The reference pushes every env id into gym's global registry at import
(register.py:~5-25), so `gym.make("MiniGrid-*-v0")` is a reference user's
first line of code. These tests hold `minigrid_tpu` to the same contract
via gymnasium (the installed successor API).
"""

import gymnasium
import numpy as np
import pytest

import minigrid_tpu
from minigrid_tpu.compat.gym_env import MiniGridGymEnv


def test_every_id_in_gymnasium_registry():
    missing = [i for i in minigrid_tpu.env_list if i not in gymnasium.registry]
    assert missing == []
    assert len(minigrid_tpu.env_list) == 70


def test_gymnasium_make_resolves_every_id():
    for env_id in minigrid_tpu.env_list:
        e = gymnasium.make(env_id)
        assert isinstance(e.unwrapped, MiniGridGymEnv)
        assert e.unwrapped.spec.id == env_id
        e.close()


# One id per family: full reset/step through gymnasium.make (compiles the
# generator, so keep to a representative subset — the all-id rollout sweep
# lives in run_tests.py / test_families.py on the functional API).
_FAMILY_IDS = [
    "MiniGrid-Empty-8x8-v0",
    "MiniGrid-DoorKey-5x5-v0",
    "MiniGrid-Dynamic-Obstacles-5x5-v0",
    "MiniGrid-Fetch-5x5-N2-v0",
    "MiniGrid-MultiRoom-N2-S4-v0",
]


@pytest.mark.parametrize("env_id", _FAMILY_IDS)
def test_gymnasium_make_reset_step(env_id):
    e = gymnasium.make(env_id)
    obs, info = e.reset(seed=7)
    assert obs["image"].shape == (7, 7, 3)
    assert obs["image"].dtype == np.uint8
    assert isinstance(obs["mission"], str)
    obs, reward, terminated, truncated, info = e.step(2)
    assert obs["image"].shape == (7, 7, 3)
    assert float(reward) <= 1.0
    e.close()


def test_reward_range_per_family():
    dyn = gymnasium.make("MiniGrid-Dynamic-Obstacles-8x8-v0").unwrapped
    assert dyn.reward_range == (-1.0, 1.0)
    std = gymnasium.make("MiniGrid-DoorKey-8x8-v0").unwrapped
    assert std.reward_range == (0.0, 1.0)


def test_spec_metadata_on_direct_construction():
    env = MiniGridGymEnv(minigrid_tpu.make("MiniGrid-Empty-5x5-v0"))
    assert env.spec.id == "MiniGrid-Empty-5x5-v0"
    assert env.spec.max_episode_steps == 100  # 4 * 5 * 5
