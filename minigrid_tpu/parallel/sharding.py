"""Device meshes and sharding layouts.

The reference is strictly single-process (SURVEY.md §2.11) — its users
bolted on SubprocVecEnv outside the library. Here parallelism is
single-program GSPMD: the env batch shards over an `'env'` mesh axis (the
data-parallel axis, riding ICI within a slice), and model parameters may
additionally shard over a `'model'` axis (tensor parallel). XLA inserts the
collectives; nothing in the step/obs kernels needs to know about the mesh.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from minigrid_tpu.core.state import EnvState

ENV_AXIS = "env"
MODEL_AXIS = "model"


def make_env_mesh(
    devices: Optional[Sequence[jax.Device]] = None, model_parallel: int = 1
) -> Mesh:
    """A `('env', 'model')` mesh over the given (default: all) devices.

    `model_parallel=1` makes this pure data parallelism over envs; larger
    values carve off a tensor-parallel axis for the learner's matmuls.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    assert n % model_parallel == 0, (n, model_parallel)
    arr = np.array(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(arr, (ENV_AXIS, MODEL_AXIS))


def env_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis sharding over the env axis (any-rank leaves)."""
    return NamedSharding(mesh, P(ENV_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_states(states: EnvState, mesh: Mesh) -> EnvState:
    """Place a batched EnvState so its batch axis is split over 'env'."""
    s = env_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), states)
