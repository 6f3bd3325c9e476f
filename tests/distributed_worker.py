"""Worker program for the two-process `jax.distributed` test.

Launched as `python tests/distributed_worker.py <port> <process_id>
<num_processes>` by tests/test_distributed.py. Each process brings up the
JAX distributed runtime over a localhost coordinator with 4 virtual CPU
devices, builds the GLOBAL env mesh, generates only its addressable shard
of the batch (`parallel.distributed.make_global_batch`), runs the sharded
packed rollout, and prints the psum'd metrics — which must agree across
processes (the assertion lives in the parent test).

This is the multi-HOST path the reference never had (SURVEY.md §2.11):
`jax.distributed.initialize` + one jitted program per host + collectives,
exercised for real across OS processes rather than only on a single-process
virtual mesh.
"""

import os
import re
import sys

port, process_id, num_processes = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])

os.environ["JAX_PLATFORMS"] = "cpu"
# Force exactly 4 virtual devices per process (the parent pytest process
# exports an 8-device flag this would otherwise inherit).
flags = re.sub(
    r"--xla_force_host_platform_device_count=\d+",
    "",
    os.environ.get("XLA_FLAGS", ""),
)
os.environ["XLA_FLAGS"] = (
    flags + " --xla_force_host_platform_device_count=4"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1e9)

from minigrid_tpu.parallel import distributed  # noqa: E402

distributed.initialize(
    coordinator_address=f"localhost:{port}",
    num_processes=num_processes,
    process_id=process_id,
)

info = distributed.process_info()
assert info["process_count"] == num_processes, info
assert info["local_device_count"] == 4, info
assert info["global_device_count"] == 4 * num_processes, info

import minigrid_tpu  # noqa: E402
from minigrid_tpu.parallel.distributed import (  # noqa: E402
    global_env_mesh,
    make_global_batch,
)
from minigrid_tpu.parallel.packed import build_sharded_rollout  # noqa: E402

mesh = global_env_mesh()
env = minigrid_tpu.make("MiniGrid-Empty-8x8-v0")
key = jax.random.PRNGKey(0)
global_batch = 16 * info["global_device_count"]
states, _ = make_global_batch(env, key, global_batch, mesh)

rollout = build_sharded_rollout(env, 8, mesh, backend="packed")
_, metrics = rollout(key, states)
print(
    "METRICS",
    int(metrics.total_steps),
    int(metrics.episodes),
    int(metrics.obs_checksum),
    flush=True,
)
