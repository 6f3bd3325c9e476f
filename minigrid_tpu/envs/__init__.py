"""Environment zoo — importing this package registers every env id.

Mirrors the reference's registration-by-import (envs/__init__.py:~1-25),
but with explicit `register()` calls per family module instead of
class-definition side effects.
"""

from minigrid_tpu.envs.registry import env_list, make, register, registry

# Family modules (each registers its env ids at import time).
from minigrid_tpu.envs import _register_all  # noqa: F401

# Mirror the reference's side effect of pushing every id into the GLOBAL
# gym registry (register.py:~5-25): `gymnasium.make("MiniGrid-*-v0")` works
# as soon as this package is imported.
from minigrid_tpu.compat.gym_env import register_all_gymnasium

register_all_gymnasium()

__all__ = ["env_list", "make", "register", "registry"]
