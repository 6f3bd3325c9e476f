"""Multi-host (pod-slice) execution.

The reference has no distributed layer whatsoever (SURVEY.md §2.11). Here
multi-host scaling is the standard JAX recipe: every host runs the same
program (`jax.distributed.initialize`), the env batch is sharded over the
global `'env'` mesh axis so each host simulates its local slice on its own
chips, collectives ride ICI within a slice (DCN across slices), and the
only host traffic is metric scalars.

Single-host multi-chip needs none of this — `make_env_mesh()` over local
devices suffices. These helpers add the cross-host glue.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from minigrid_tpu.core.state import EnvState
from minigrid_tpu.envs.base import Env
from minigrid_tpu.parallel.sharding import ENV_AXIS, make_env_mesh


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Bring up the JAX distributed runtime (no-op on a single process).

    On TPU pods the arguments auto-detect from the environment; pass them
    explicitly only for CPU/GPU clusters.
    """
    if num_processes is not None and num_processes > 1 or coordinator_address:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )


def global_env_mesh(model_parallel: int = 1) -> Mesh:
    """A mesh over ALL devices in the job (all hosts)."""
    return make_env_mesh(jax.devices(), model_parallel=model_parallel)


def make_global_batch(
    env: Env, key: jax.Array, global_batch: int, mesh: Mesh
) -> Tuple[EnvState, jnp.ndarray]:
    """Create a globally-sharded env batch, each host generating only its
    addressable shard (no host ever materializes the full batch).

    Returns (sharded EnvState, per-env PRNG keys used).
    """
    assert global_batch % mesh.devices.size == 0, (
        f"global batch {global_batch} must divide over {mesh.devices.size} devices"
    )
    sharding = NamedSharding(mesh, P(ENV_AXIS))
    keys = jax.random.split(key, global_batch)

    def make_shard(idx_keys):
        states, _ = jax.vmap(env.reset)(idx_keys)
        return states

    # jit with sharded input keys: XLA partitions generation itself, so
    # each host executes only its shard of the generator program.
    states = jax.jit(make_shard)(jax.device_put(keys, sharding))
    states = jax.tree.map(lambda x: jax.device_put(x, sharding), states)
    return states, keys


def psum_metrics(metrics, mesh: Mesh):
    """All-reduce scalar metrics across the mesh (host-level convenience:
    under jit with sharded inputs, XLA inserts the collective)."""
    return jax.tree.map(lambda x: jnp.sum(x), metrics)


def process_info() -> dict:
    """Topology summary for logging."""
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_device_count": jax.local_device_count(),
        "global_device_count": jax.device_count(),
    }
