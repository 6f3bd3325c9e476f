"""Policy/value models consuming minigrid_tpu observations."""

from minigrid_tpu.models.policy import ActorCritic

__all__ = ["ActorCritic"]
