"""Host-side compatibility: gymnasium adapter, old-gym 4-tuple shim, the
full class-based wrapper set under the reference's names (wrappers.py:~12-345),
and the bit-exact MT19937 layout replayer."""

from minigrid_tpu.compat.gym_env import MiniGridGymEnv, OldGymShim, gym_make
from minigrid_tpu.compat.host_wrappers import (
    ActionBonus,
    FlatObsWrapper,
    FullyObsWrapper,
    ImgObsWrapper,
    OneHotPartialObsWrapper,
    ReseedWrapper,
    RGBImgObsWrapper,
    RGBImgPartialObsWrapper,
    StateBonus,
    ViewSizeWrapper,
)

__all__ = [
    "MiniGridGymEnv",
    "OldGymShim",
    "gym_make",
    "ReseedWrapper",
    "ActionBonus",
    "StateBonus",
    "ImgObsWrapper",
    "OneHotPartialObsWrapper",
    "RGBImgObsWrapper",
    "RGBImgPartialObsWrapper",
    "FullyObsWrapper",
    "FlatObsWrapper",
    "ViewSizeWrapper",
]
