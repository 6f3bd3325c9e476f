"""minigrid_tpu — a TPU-native gridworld RL engine built from scratch in JAX.

Capability-parity rebuild of gym-minigrid (reference: rohitrango/gym-minigrid,
a fork of maximecb/gym-minigrid) designed TPU-first:

- Environment state is a pure-functional PyTree of fixed-shape integer arrays
  (no object graph): see `minigrid_tpu.core.state.EnvState`.
- The 7-action transition function and the egocentric occlusion-masked
  observation encoder are branchless `jit`+`vmap` kernels
  (`minigrid_tpu.core.step`, `minigrid_tpu.core.vision`).
- Procedural level generation runs on-device from counter-based PRNG keys
  (`minigrid_tpu.envs.*`); auto-reset folds finished episodes back into the
  batch without host round-trips (`minigrid_tpu.core.autoreset`).
- Env batches shard over `jax.sharding.Mesh` axes for multi-chip / multi-host
  scaling (`minigrid_tpu.parallel`).

Top-level API:

    import jax
    import minigrid_tpu

    env = minigrid_tpu.make("MiniGrid-Empty-8x8-v0")
    key = jax.random.PRNGKey(0)
    state, obs = env.reset(key)
    state, obs, reward, terminated, truncated = env.step(state, action)

See SURVEY.md at the repo root for the structural map of the reference this
build is held to parity with.
"""

from minigrid_tpu.core.constants import (
    COLOR_NAMES,
    COLOR_TO_IDX,
    COLORS,
    DIR_TO_VEC,
    IDX_TO_COLOR,
    IDX_TO_OBJECT,
    OBJECT_TO_IDX,
    STATE_TO_IDX,
    TILE_PIXELS,
)
from minigrid_tpu.core.state import EnvState
from minigrid_tpu.envs.registry import make, registry, register, env_list

# Eagerly load the env zoo so `import minigrid_tpu` both fills the internal
# registry and registers every id into gymnasium's global registry — the
# reference's registration-by-import contract (SURVEY.md §2.7).
import minigrid_tpu.envs  # noqa: E402,F401

__version__ = "0.1.0"

__all__ = [
    "COLORS",
    "COLOR_NAMES",
    "COLOR_TO_IDX",
    "IDX_TO_COLOR",
    "OBJECT_TO_IDX",
    "IDX_TO_OBJECT",
    "STATE_TO_IDX",
    "DIR_TO_VEC",
    "TILE_PIXELS",
    "EnvState",
    "make",
    "registry",
    "register",
    "env_list",
]
