"""Host-stateful wrappers over the gymnasium adapter.

These are the wrappers whose reference semantics depend on host-side state
that has no fixed-size device representation: a cycling seed list, unbounded
hash-keyed count dicts, and mission-string character one-hots.
Reference: gym_minigrid/wrappers.py:~12-105, ~271-315.
"""

from __future__ import annotations

import math

import gymnasium
import numpy as np
from gymnasium import spaces


class ReseedWrapper(gymnasium.Wrapper):
    """Cycle deterministically through a fixed seed list on each reset
    (`ReseedWrapper`, wrappers.py:~12-35)."""

    def __init__(self, env, seeds=(0,), seed_idx=0):
        super().__init__(env)
        self.seeds = list(seeds)
        self.seed_idx = seed_idx

    def reset(self, **kwargs):
        seed = self.seeds[self.seed_idx]
        self.seed_idx = (self.seed_idx + 1) % len(self.seeds)
        kwargs.pop("seed", None)
        return self.env.reset(seed=int(seed), **kwargs)


class ActionBonus(gymnasium.Wrapper):
    """Count-based exploration bonus keyed on `(env.hash(), action)`
    (`ActionBonus`, wrappers.py:~38-70)."""

    def __init__(self, env):
        super().__init__(env)
        self.counts = {}

    def step(self, action):
        obs, reward, terminated, truncated, info = self.env.step(action)
        tup = (self.env.unwrapped.hash(), int(action))
        new_count = self.counts.get(tup, 0) + 1
        self.counts[tup] = new_count
        reward += 1 / math.sqrt(new_count)
        return obs, reward, terminated, truncated, info


class StateBonus(gymnasium.Wrapper):
    """Count-based exploration bonus keyed on the agent position
    (`StateBonus`, wrappers.py:~73-105)."""

    def __init__(self, env):
        super().__init__(env)
        self.counts = {}

    def step(self, action):
        obs, reward, terminated, truncated, info = self.env.step(action)
        tup = tuple(self.env.unwrapped.agent_pos)
        new_count = self.counts.get(tup, 0) + 1
        self.counts[tup] = new_count
        reward += 1 / math.sqrt(new_count)
        return obs, reward, terminated, truncated, info


class FlatObsWrapper(gymnasium.ObservationWrapper):
    """Flatten the image and one-hot encode the mission string
    (`FlatObsWrapper`, wrappers.py:~271-315): 96 chars × 27 symbols
    (a-z + space), lowercased, cached per mission string."""

    def __init__(self, env, maxStrLen: int = 96):
        super().__init__(env)
        self.maxStrLen = maxStrLen
        self.numCharCodes = 27
        img_space = env.observation_space["image"]
        img_size = int(np.prod(img_space.shape))
        self.observation_space = spaces.Box(
            low=0,
            high=255,
            shape=(img_size + self.numCharCodes * self.maxStrLen,),
            dtype=np.float32,
        )
        self.cachedStr = None
        self.cachedArray = None

    def observation(self, obs):
        image = obs["image"]
        mission = obs["mission"]
        if mission != self.cachedStr:
            assert len(mission) <= self.maxStrLen, f"mission too long: {mission!r}"
            mission_lower = mission.lower()
            str_array = np.zeros(
                (self.maxStrLen, self.numCharCodes), dtype=np.float32
            )
            for idx, ch in enumerate(mission_lower):
                if "a" <= ch <= "z":
                    ch_no = ord(ch) - ord("a")
                elif ch == " ":
                    ch_no = ord("z") - ord("a") + 1
                else:
                    continue  # reference only supports a-z and space
                str_array[idx, ch_no] = 1.0
            self.cachedStr = mission
            self.cachedArray = str_array
        return np.concatenate(
            [np.asarray(image, np.float32).flatten(), self.cachedArray.flatten()]
        )
