"""Multi-chip scaling for the packed-lane rollout engines.

The packed rollouts (`ops/fused_rollout.py`) put the env batch in the TPU
lane dimension — `(H·W, B)` int32 grids, `(NUM_REGS, B)` registers. Scaling them
across a device mesh is pure data parallelism over lanes: each device runs
the identical single-chip program on its `B / n_env` slice of the batch and
the only cross-device traffic is one `psum` of the four scalar metrics at
the end. This is the GSPMD replacement for the multi-process vector env the
reference never had (SURVEY.md §2.11): one jitted program, collectives over
ICI, no host round-trips.

`shard_map` (not bare GSPMD jit) because the Pallas backend is a manual
kernel XLA cannot partition on its own; the XLA twin rides along for free.
Per-shard action streams derive from `fold_in(key, shard_index)`, so the
sharded rollout is deterministic in `(key, mesh)` but samples a different
(equally random) action stream than the single-chip program — equivalence
per shard is asserted in tests/test_parallel.py by replaying each shard's
folded key through the single-chip builder.
"""

from __future__ import annotations


from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from minigrid_tpu.core.rollout import RolloutMetrics, build_rollout

from minigrid_tpu.envs.base import Env
from minigrid_tpu.ops.fused_rollout import (
    PackedCarry,
    build_fused_rollout,
    build_packed_xla_rollout,
    fused_rollout_supported,
)
from minigrid_tpu.parallel.sharding import ENV_AXIS
from minigrid_tpu.utils.platform import mosaic_available as _mosaic_available


def shard_carry(carry: PackedCarry, mesh: Mesh) -> PackedCarry:
    """Place a `PackedCarry` so its batch (LANE) axis is split over 'env'
    — the `shard_states` counterpart for the packed steady-state surface
    (`packed_init` under plain jit often yields a replicated layout)."""
    from jax.sharding import NamedSharding

    lane = NamedSharding(mesh, P(None, ENV_AXIS))
    rngs = NamedSharding(mesh, P(ENV_AXIS))

    def put(x, s):
        return None if x is None else jax.device_put(x, s)

    return PackedCarry(
        words=put(carry.words, lane),
        regs=put(carry.regs, lane),
        tmpl_words=put(carry.tmpl_words, lane),
        tmpl_regs=put(carry.tmpl_regs, lane),
        rng=put(carry.rng, rngs),
    )


def _pick_backend(env: Env, mode: str) -> str:
    if not fused_rollout_supported(env, mode=mode):
        return "vmap"
    return "pallas" if _mosaic_available() else "packed"


def build_sharded_rollout(
    env: Env,
    num_steps: int,
    mesh: Mesh,
    mode: str = "regen",
    backend: str = "auto",
    lane_block: Optional[int] = None,
    as_carry: bool = False,
):
    """Returns `rollout(key, states) -> (states, RolloutMetrics)` sharded
    over the mesh's 'env' axis.

    `states` must be batched with the batch axis divisible by the mesh's
    'env' extent (place with `parallel.sharding.shard_states`). Per-shard
    work is the unmodified single-chip rollout; metrics are psum'd, final
    states stay sharded. `backend`: 'auto' picks pallas on TPU / the packed
    XLA twin elsewhere when the env supports it, falling back to the vmap
    engine (which supports every family) otherwise.

    With `as_carry=True` (packed backends only), returns the steady-state
    `step(key, carry) -> (carry, RolloutMetrics)` surface over a sharded
    `ops.fused_rollout.PackedCarry` — build the carry with
    `shard_carry(packed_init(env, states, mode), mesh)` and unpack once at
    the end with `packed_finish`.
    """
    if mode not in ("regen", "cached"):
        raise ValueError(f"unknown autoreset mode {mode!r}")
    if backend == "auto":
        backend = _pick_backend(env, mode)
    if as_carry and backend == "vmap":
        raise ValueError("as_carry requires a packed backend (packed/pallas)")
    if backend == "pallas":
        inner = build_fused_rollout(
            env, num_steps, lane_block=lane_block, mode=mode, as_carry=as_carry
        )
    elif backend == "packed":
        inner = build_packed_xla_rollout(
            env, num_steps, mode=mode, as_carry=as_carry
        )
    elif backend == "vmap":
        inner = build_rollout(env, num_steps, autoreset_mode=mode)
    else:
        raise ValueError(f"unknown backend {backend!r}")

    def shard_body(key: jax.Array, state_in):
        key = jax.random.fold_in(key, lax.axis_index(ENV_AXIS))
        final, m = inner(key, state_in)
        metrics = RolloutMetrics(
            episodes=lax.psum(m.episodes, ENV_AXIS),
            total_reward=lax.psum(m.total_reward, ENV_AXIS),
            total_steps=lax.psum(m.total_steps, ENV_AXIS),
            obs_checksum=lax.psum(m.obs_checksum, ENV_AXIS),
            reset_overlaps=lax.psum(jnp.asarray(m.reset_overlaps), ENV_AXIS),
        )
        return final, metrics

    if as_carry:
        # Packed layouts carry the batch in the LANE (last) axis; only the
        # rng key block is batch-major. Every mode carries templates
        # (chunked-regen keeps each lane's next fresh layout in them).
        lane = P(None, ENV_AXIS)
        state_spec = PackedCarry(
            words=lane,
            regs=lane,
            tmpl_words=lane,
            tmpl_regs=lane,
            rng=P(ENV_AXIS),
        )
    else:
        state_spec = P(ENV_AXIS)

    sharded = shard_map(
        shard_body,
        mesh=mesh,
        in_specs=(P(), state_spec),
        out_specs=(state_spec, P()),
        check_vma=False,
    )

    @jax.jit
    def rollout(key: jax.Array, state_in):
        return sharded(key, state_in)

    return rollout


def build_sharded_policy_eval(
    env: Env,
    params,
    num_steps: int,
    mesh: Mesh,
    mode: str = "cached",
    backend: str = "auto",
    as_carry: bool = False,
):
    """Policy-in-kernel evaluation rollout (ops/policy_rollout.py) sharded
    over the mesh's 'env' axis: actor weights replicate into every shard's
    VMEM, env lanes split, metrics psum — the data-parallel serving path.
    Same surfaces as `build_sharded_rollout` (states in, or a sharded
    `PackedCarry` with `as_carry=True`)."""
    from minigrid_tpu.ops.policy_rollout import build_policy_eval_rollout

    if backend == "auto":
        backend = "pallas" if _mosaic_available() else "xla"
    inner = build_policy_eval_rollout(
        env, params, num_steps, mode=mode, backend=backend, as_carry=True
    )

    def shard_body(key: jax.Array, carry):
        key = jax.random.fold_in(key, lax.axis_index(ENV_AXIS))
        carry, m = inner(key, carry)
        metrics = RolloutMetrics(
            episodes=lax.psum(m.episodes, ENV_AXIS),
            total_reward=lax.psum(m.total_reward, ENV_AXIS),
            total_steps=lax.psum(m.total_steps, ENV_AXIS),
            obs_checksum=lax.psum(m.obs_checksum, ENV_AXIS),
            reset_overlaps=lax.psum(jnp.asarray(m.reset_overlaps), ENV_AXIS),
        )
        return carry, metrics

    lane = P(None, ENV_AXIS)
    carry_spec = PackedCarry(
        words=lane, regs=lane, tmpl_words=lane, tmpl_regs=lane,
        rng=P(ENV_AXIS),
    )
    sharded = shard_map(
        shard_body,
        mesh=mesh,
        in_specs=(P(), carry_spec),
        out_specs=(carry_spec, P()),
        check_vma=False,
    )

    if as_carry:
        return jax.jit(sharded)

    from minigrid_tpu.ops.fused_rollout import packed_finish, packed_init

    @jax.jit
    def rollout(key: jax.Array, states):
        carry = shard_carry(packed_init(env, states, mode), mesh)
        carry, metrics = sharded(key, carry)
        return packed_finish(env, carry), metrics

    return rollout
