"""Host-side compatibility: gymnasium adapter, old-gym 4-tuple shim,
stateful wrappers (reseed, exploration-bonus hash tables, flat obs), and
the bit-exact MT19937 layout replayer."""

from minigrid_tpu.compat.gym_env import MiniGridGymEnv, OldGymShim, gym_make
from minigrid_tpu.compat.host_wrappers import (
    ActionBonus,
    FlatObsWrapper,
    ReseedWrapper,
    StateBonus,
)

__all__ = [
    "MiniGridGymEnv",
    "OldGymShim",
    "gym_make",
    "ReseedWrapper",
    "ActionBonus",
    "StateBonus",
    "FlatObsWrapper",
]
