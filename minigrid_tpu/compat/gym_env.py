"""Gymnasium adapter: drop-in class-based environments.

Wraps a pure-functional `Env` in the stateful `gymnasium.Env` interface a
reference user expects (`gym.make` + `reset()`/`step()` on a mutable
object), with jit-compiled reset/step under the hood. `OldGymShim` restores
the old-gym 4-tuple `(obs, reward, done, info)` contract the reference uses
(minigrid.py:~1087 returns no terminated/truncated split).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import gymnasium
import jax
import jax.numpy as jnp
import numpy as np
from gymnasium import spaces

import minigrid_tpu
from minigrid_tpu.core import view
from minigrid_tpu.envs import missions
from minigrid_tpu.envs.base import Env


class MiniGridGymEnv(gymnasium.Env):
    """Stateful adapter over a functional `Env`.

    Mirrors the reference `MiniGridEnv`'s external API surface
    (minigrid.py:~667-1300): `action_space=Discrete(N)`,
    `observation_space` with the `(V, V, 3)` image box, `reset`, `step`,
    `render`, `seed`, `hash`, and ASCII `__str__`.
    """

    metadata = {"render_modes": ["rgb_array", "ansi"], "render_fps": 10}

    def __init__(self, env: Env, render_mode: Optional[str] = None):
        from minigrid_tpu.core.state import Actions

        self.actions = Actions  # reference `self.actions` (minigrid.py:~700)
        self.fenv = env
        self.render_mode = render_mode
        # Per-env reward range: DynamicObstacles pays -1 on collision
        # (reference dynamicobstacles.py:~30 sets reward_range = (-1, 1));
        # every other env rewards in [0, 1].
        self.reward_range = (
            (-1.0, 1.0) if env.config.family == "dynamicobstacles" else (0.0, 1.0)
        )
        # `spec`-like metadata the reference exposes through gym's registry
        # (register.py:~5-25). `gymnasium.make` overwrites this with the real
        # registry spec; direct construction gets the same fields here.
        self.spec = gymnasium.envs.registration.EnvSpec(
            id=env.env_id,
            entry_point="minigrid_tpu.compat.gym_env:_gymnasium_entry_point",
            reward_threshold=0.95,
            max_episode_steps=env.config.max_steps,
            disable_env_checker=True,
            kwargs={"env_id": env.env_id},
        )
        v = env.config.agent_view_size
        self.action_space = spaces.Discrete(env.config.num_actions)
        self.observation_space = spaces.Dict(
            {
                "image": spaces.Box(0, 255, (v, v, 3), dtype=np.uint8),
                "direction": spaces.Discrete(4),
                "mission": spaces.Text(max_length=256),
            }
        )
        self._reset_fn = jax.jit(env.reset)
        self._step_fn = jax.jit(env.step)
        self._seed = 0
        self.state = None

    # ------------------------------------------------------------- plumbing
    def _host_obs(self, obs) -> Dict[str, Any]:
        if isinstance(obs, dict):
            out = {k: np.asarray(v) for k, v in obs.items()}
            if "mission" in out:
                out["mission"] = missions.detokenize(out["mission"])
            if "direction" in out:
                out["direction"] = int(out["direction"])
            return out
        return np.asarray(obs)

    # ------------------------------------------------------------------ API
    def seed(self, seed: int = 1337):
        self._seed = int(seed)
        return [self._seed]

    def reset(self, *, seed: Optional[int] = None, options=None):
        if seed is not None:
            self._seed = int(seed)
        else:
            self._seed += 1
        key = jax.random.PRNGKey(self._seed)
        self.state, obs = self._reset_fn(key)
        return self._host_obs(obs), {}

    def step(self, action):
        self.state, obs, reward, terminated, truncated = self._step_fn(
            self.state, jnp.asarray(int(action), jnp.int32)
        )
        return (
            self._host_obs(obs),
            float(reward),
            bool(terminated),
            bool(truncated),
            {},
        )

    def render(self, highlight: bool = True, tile_size: int = 32):
        if self.render_mode == "ansi":
            return self.__str__()
        from minigrid_tpu.render.render import render_state

        return np.asarray(
            render_state(self.state, self.fenv.config, tile_size, highlight)
        )

    def hash(self, size: int = 16) -> str:
        """Deterministic state hash (`MiniGridEnv.hash`, minigrid.py:~758):
        sha256 over (encoded grid, agent_pos, agent_dir)."""
        import hashlib

        from minigrid_tpu.core.grid import encode

        to_encode = [
            np.asarray(encode(self.state.grid)).tolist(),
            np.asarray(self.state.agent_pos).tolist(),
            int(self.state.agent_dir),
        ]
        sample_hash = hashlib.sha256()
        for item in to_encode:
            sample_hash.update(str(item).encode("utf8"))
        return sample_hash.hexdigest()[:size]

    def __str__(self) -> str:
        from minigrid_tpu.utils.ascii import render_ascii

        return render_ascii(self.state)

    def close(self):
        pass

    def get_obs_render(self, obs_image, tile_size: int = 32):
        """Render an encoded partial observation (`get_obs_render`,
        minigrid.py:~1217-1240)."""
        from minigrid_tpu.render.render import render_obs_image

        return np.asarray(render_obs_image(jnp.asarray(obs_image), tile_size))

    # --------------------------------------------- pose / view geometry
    # Reference `MiniGridEnv` members (minigrid.py:~972-1085), delegated to
    # the pure transforms in `minigrid_tpu.core.view`.
    def get_view_coords(self, i: int, j: int):
        vx, vy = view.get_view_coords(
            self.state.agent_pos,
            self.state.agent_dir,
            self.fenv.config.agent_view_size,
            i,
            j,
        )
        return int(vx), int(vy)

    def get_view_exts(self):
        return tuple(
            int(e)
            for e in view.get_view_exts(
                self.state.agent_pos,
                self.state.agent_dir,
                self.fenv.config.agent_view_size,
            )
        )

    def relative_coords(self, x: int, y: int):
        vx, vy, valid = view.relative_coords(
            self.state.agent_pos,
            self.state.agent_dir,
            self.fenv.config.agent_view_size,
            x,
            y,
        )
        return (int(vx), int(vy)) if bool(valid) else None

    def in_view(self, x: int, y: int) -> bool:
        return self.relative_coords(x, y) is not None

    def agent_sees(self, x: int, y: int) -> bool:
        return bool(view.agent_sees(self.state, self.fenv.config, x, y))

    # Convenience passthroughs matching reference attribute names.
    @property
    def agent_pos(self):
        return tuple(np.asarray(self.state.agent_pos))

    @property
    def agent_dir(self):
        return int(self.state.agent_dir)

    @property
    def dir_vec(self):
        return np.asarray(view.dir_vec(self.state.agent_dir))

    @property
    def right_vec(self):
        return np.asarray(view.right_vec(self.state.agent_dir))

    @property
    def front_pos(self):
        return np.asarray(view.front_pos(self.state.agent_pos, self.state.agent_dir))

    @property
    def carrying(self):
        """(type_name, color_name) of the held object, or None — the closest
        array analog of the reference's `self.carrying` WorldObj."""
        c = np.asarray(self.state.carrying)
        if c[0] == 0:
            return None
        from minigrid_tpu.core.constants import IDX_TO_COLOR, IDX_TO_OBJECT

        return (IDX_TO_OBJECT[int(c[0])], IDX_TO_COLOR[int(c[1])])

    @property
    def mission(self) -> str:
        return missions.detokenize(np.asarray(self.state.mission))

    @property
    def max_steps(self) -> int:
        return self.fenv.config.max_steps

    @property
    def step_count(self) -> int:
        return int(self.state.step_count)

    @property
    def steps_remaining(self) -> int:
        return self.max_steps - self.step_count

    @property
    def width(self) -> int:
        return self.fenv.config.width

    @property
    def height(self) -> int:
        return self.fenv.config.height

    @property
    def agent_view_size(self) -> int:
        return self.fenv.config.agent_view_size

    @property
    def see_through_walls(self) -> bool:
        return self.fenv.config.see_through_walls


class OldGymShim:
    """Old-gym API shim: 4-tuple step, reset returns obs only
    (the reference's contract — SURVEY.md §3.2)."""

    def __init__(self, env: MiniGridGymEnv):
        self.env = env

    def __getattr__(self, name):
        return getattr(self.env, name)

    def seed(self, seed=1337):
        return self.env.seed(seed)

    def reset(self):
        obs, _ = self.env.reset(seed=self.env._seed)
        return obs

    def step(self, action) -> Tuple[Any, float, bool, dict]:
        obs, reward, terminated, truncated, info = self.env.step(action)
        return obs, reward, terminated or truncated, info


def gym_make(env_id: str, render_mode: Optional[str] = None, old_api: bool = False):
    """`gym.make` equivalent resolving against our registry."""
    env = MiniGridGymEnv(minigrid_tpu.make(env_id), render_mode=render_mode)
    return OldGymShim(env) if old_api else env


def _gymnasium_entry_point(env_id: str, render_mode: Optional[str] = None, **kwargs):
    """Entry point `gymnasium.make` resolves registered ids through."""
    return MiniGridGymEnv(minigrid_tpu.make(env_id), render_mode=render_mode)


def register_all_gymnasium() -> None:
    """Register every env id into gymnasium's GLOBAL registry.

    The reference registers each id into the gym global registry at import
    (register.py:~5-25, fired by the envs/__init__.py star-import), so a
    reference user's first line — `gym.make("MiniGrid-Empty-8x8-v0")` —
    works after `import gym_minigrid`. This restores that contract for
    gymnasium: called from `minigrid_tpu.envs.__init__` after the internal
    registry is built. Idempotent (re-imports skip already-registered ids).

    `max_episode_steps` stays None because truncation is internal to the
    engine (the reference conflates max-step timeout into `done`,
    minigrid.py:~1150) — a TimeLimit wrapper would double-count.
    """
    import gymnasium as _gym

    from minigrid_tpu.envs.registry import env_list as _ids
    from minigrid_tpu.envs.registry import registry as _registry

    for env_id in _ids:
        if env_id in _gym.registry:
            continue
        _gym.register(
            id=env_id,
            entry_point="minigrid_tpu.compat.gym_env:_gymnasium_entry_point",
            reward_threshold=_registry[env_id].reward_threshold,
            max_episode_steps=None,
            disable_env_checker=True,
            kwargs={"env_id": env_id},
        )
