"""Environment zoo — importing this package registers every env id.

Mirrors the reference's registration-by-import (envs/__init__.py:~1-25),
but with explicit `register()` calls per family module instead of
class-definition side effects.
"""

from minigrid_tpu.envs.registry import env_list, make, register, registry

# Family modules (each registers its env ids at import time).
from minigrid_tpu.envs import _register_all  # noqa: F401

__all__ = ["env_list", "make", "register", "registry"]
