"""Heterogeneous env batches: different families stepped in one program.

BASELINE.md config #5 calls for a mixed LavaCrossing+FourRooms batch sharded
over hosts. Grids are padded to the largest member's dims (padding cells are
walls, which are inert — every family's real border wall already bounds the
playable area), per-env family ids ride in the last `aux` slot, and
reset/step/observe dispatch through `lax.switch`. Under `vmap` the switch
computes every family's branch and selects per env — the standard SPMD
trade; with F families the step costs ≤ F× a homogeneous step, and the
whole batch stays in one jitted program shardable over the mesh.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import lax

import minigrid_tpu
from minigrid_tpu.core import constants as C
from minigrid_tpu.core.obs import gen_obs
from minigrid_tpu.core.state import AUX_LEN, EnvState
from minigrid_tpu.core.step import StepResult
from minigrid_tpu.envs.base import Env
from minigrid_tpu.utils.platform import mosaic_available as _mosaic_available

# aux slot holding the member index (families use low slots only).
FAMILY_SLOT = AUX_LEN - 1


@dataclasses.dataclass(frozen=True)
class MixedEnv:
    """A fixed roster of member envs steppable as one batch."""

    env_ids: Tuple[str, ...]
    members: Tuple[Env, ...]
    height: int
    width: int
    agent_view_size: int
    num_actions: int

    @staticmethod
    def create(env_ids: Sequence[str]) -> "MixedEnv":
        members = tuple(minigrid_tpu.make(e) for e in env_ids)
        views = {m.config.agent_view_size for m in members}
        assert len(views) == 1, "members must share agent_view_size"
        return MixedEnv(
            env_ids=tuple(env_ids),
            members=members,
            height=max(m.config.height for m in members),
            width=max(m.config.width for m in members),
            agent_view_size=views.pop(),
            num_actions=max(m.config.num_actions for m in members),
        )

    # ------------------------------------------------------------ internals
    def _pad_state(self, state: EnvState, member_idx: int) -> EnvState:
        """Embed a member's state into the padded canvas (wall fill)."""
        h, w = state.grid.shape[:2]
        wall = jnp.array((C.WALL, C.GREY, 0, 0, 0), dtype=jnp.uint8)
        grid = jnp.broadcast_to(wall, (self.height, self.width, 5)).astype(jnp.uint8)
        grid = lax.dynamic_update_slice(grid, state.grid, (0, 0, 0))
        aux = state.aux.at[FAMILY_SLOT].set(member_idx)
        return state.replace(grid=grid, aux=aux)

    def _branch_config(self, member: Env):
        """Member config with padded dims (semantics like max_steps,
        see_through_walls, num_actions stay the member's own)."""
        return dataclasses.replace(
            member.config, width=self.width, height=self.height
        )

    # ------------------------------------------------------------------ API
    def _generate(self, key: jax.Array, member_idx: jnp.ndarray) -> EnvState:
        """Generate a state for member `member_idx` (traced), no obs."""

        def branch(i):
            m = self.members[i]

            def gen(key):
                return self._pad_state(m.generate(key, m.config), i)

            return gen

        return lax.switch(
            jnp.asarray(member_idx, jnp.int32),
            [branch(i) for i in range(len(self.members))],
            key,
        )

    def reset(self, key: jax.Array, member_idx: jnp.ndarray):
        state = self._generate(key, member_idx)
        return state, self.observe(state)

    def observe(self, state: EnvState):
        idx = state.aux[FAMILY_SLOT]
        return lax.switch(
            jnp.asarray(idx, jnp.int32),
            [
                (lambda cfg: (lambda s: gen_obs(s, cfg)))(self._branch_config(m))
                for m in self.members
            ],
            state,
        )

    def _transition(self, state: EnvState, action: jnp.ndarray) -> StepResult:
        idx = state.aux[FAMILY_SLOT]

        def make_branch(m: Env):
            cfg = self._branch_config(m)

            def br(operand):
                s, a = operand
                return m.transition(s, a, cfg)

            return br

        return lax.switch(
            jnp.asarray(idx, jnp.int32),
            [make_branch(m) for m in self.members],
            (state, jnp.asarray(action, jnp.int32)),
        )

    def step(self, state: EnvState, action: jnp.ndarray):
        res = self._transition(state, action)
        return res.state, self.observe(res.state), res.reward, res.terminated, res.truncated

    # --------------------------------------------------------- batched use
    def reset_batch(self, key: jax.Array, member_ids: jnp.ndarray):
        keys = jax.random.split(key, member_ids.shape[0])
        return jax.vmap(self.reset)(keys, member_ids)

    def autoreset_step(self):
        """Single-env auto-resetting step (vmap for batches): finished
        episodes regenerate a fresh layout of the SAME member. The returned
        obs observes the post-reset state (next policy input), so the
        encoder runs exactly once per step."""
        from minigrid_tpu.core.autoreset import select_state

        def step(state: EnvState, action: jnp.ndarray):
            res = self._transition(state, action)
            done = res.terminated | res.truncated
            fresh = self._generate(res.state.rng, res.state.aux[FAMILY_SLOT])
            out = select_state(done, fresh, res.state)
            return out, self.observe(out), res.reward, res.terminated, res.truncated

        return step


def build_mixed_rollout(menv: MixedEnv, num_steps: int, mesh=None):
    """Random-policy rollout over a heterogeneous batch via `lax.switch`
    dispatch — `rollout(key, states) -> (states, RolloutMetrics)`, jitted,
    optionally sharded over the mesh's 'env' axis (BASELINE config #5)."""
    from minigrid_tpu.core.rollout import RolloutMetrics
    from minigrid_tpu.parallel.sharding import env_sharding, replicated

    auto_step = jax.vmap(menv.autoreset_step())

    def rollout(key: jax.Array, states: EnvState):
        b = states.step_count.shape[0]
        keys = jax.random.split(key, num_steps)

        def body(carry, key_t):
            states, metrics = carry
            actions = jax.random.randint(
                key_t, (b,), 0, menv.num_actions, dtype=jnp.int32
            )
            states, obs, reward, term, trunc = auto_step(states, actions)
            done = term | trunc
            metrics = RolloutMetrics(
                episodes=metrics.episodes + jnp.sum(done.astype(jnp.int32)),
                total_reward=metrics.total_reward + jnp.sum(reward),
                total_steps=metrics.total_steps + b,
                obs_checksum=metrics.obs_checksum
                + jnp.sum(obs["image"].astype(jnp.int32)),
                reset_overlaps=metrics.reset_overlaps,
            )
            return (states, metrics), None

        m0 = RolloutMetrics(
            episodes=jnp.zeros((), jnp.int32),
            total_reward=jnp.zeros((), jnp.float32),
            total_steps=jnp.zeros((), jnp.int32),
            obs_checksum=jnp.zeros((), jnp.int32),
            reset_overlaps=jnp.zeros((), jnp.int32),
        )
        (states, metrics), _ = lax.scan(body, (states, m0), keys)
        return states, metrics

    if mesh is None:
        return jax.jit(rollout)
    return jax.jit(
        rollout,
        in_shardings=(replicated(mesh), env_sharding(mesh)),
        out_shardings=(env_sharding(mesh), replicated(mesh)),
    )


def build_packed_mixed_rollout(
    env_ids: Sequence[str],
    num_steps: int,
    mesh=None,
    mode: str = "regen",
    backend: str = "auto",
    as_carry: bool = False,
):
    """Heterogeneous batch on the PACKED engines: one homogeneous lane
    block per member family, each stepped by its family's own packed
    kernel inside one jitted program, metrics summed.

    This is the fast-path realization of BASELINE config #5: where
    `MixedEnv` pays the `lax.switch` SPMD trade (every branch computed for
    every lane, ≤ F× a homogeneous step), static per-family lane blocks pay
    exactly 1× — the member proportions are frozen at build time, which is
    how production batched RL actually runs heterogeneous sweeps.

    `rollout(key, states_tuple) -> (states_tuple, RolloutMetrics)`;
    `states_tuple` holds one batched `EnvState` per member (make them with
    each member's `reset_batch` + `shard_states`). With a mesh, every
    member block additionally shards over the 'env' axis
    (`parallel.packed.build_sharded_rollout`).

    With `as_carry=True` the surface becomes the steady-state carry loop:
    `step(key, carries) -> (carries, RolloutMetrics)` over a tuple of one
    `ops.fused_rollout.PackedCarry` per member (build with each member's
    `packed_init`; unpack with `packed_finish`).
    """
    import minigrid_tpu as _mg
    from minigrid_tpu.core.rollout import RolloutMetrics
    from minigrid_tpu.parallel.packed import build_sharded_rollout

    envs = [_mg.make(e) for e in env_ids]
    if mesh is not None:
        inners = [
            build_sharded_rollout(
                e, num_steps, mesh, mode=mode, backend=backend,
                as_carry=as_carry,
            )
            for e in envs
        ]
    else:
        from minigrid_tpu.ops.fused_rollout import (
            build_fused_rollout,
            build_packed_xla_rollout,
        )

        mk = (
            build_fused_rollout
            if backend == "pallas"
            or (backend == "auto" and _mosaic_available())
            else build_packed_xla_rollout
        )
        inners = [mk(e, num_steps, mode=mode, as_carry=as_carry) for e in envs]

    def rollout(key: jax.Array, states_tuple):
        finals = []
        total = None
        for i, inner in enumerate(inners):
            f, m = inner(jax.random.fold_in(key, i), states_tuple[i])
            finals.append(f)
            total = (
                m
                if total is None
                else RolloutMetrics(
                    episodes=total.episodes + m.episodes,
                    total_reward=total.total_reward + m.total_reward,
                    total_steps=total.total_steps + m.total_steps,
                    obs_checksum=total.obs_checksum + m.obs_checksum,
                    reset_overlaps=jnp.asarray(total.reset_overlaps)
                    + jnp.asarray(m.reset_overlaps),
                )
            )
        return tuple(finals), total

    return jax.jit(rollout) if mesh is None else rollout




def build_mixed_policy_eval(
    env_ids: Sequence[str],
    params_list: Sequence,
    num_steps: int,
    mesh=None,
    mode: str = "cached",
    backend: str = "auto",
    regen_chunk: int = 32,
):
    """Policy-in-kernel evaluation over a heterogeneous batch: one
    homogeneous lane block per member family, each running ITS OWN
    actor-critic (`params_list[i]`, one per member — action-space widths
    differ across families) fused into its family's step kernel, metrics
    summed. The mixed counterpart of
    `parallel.packed.build_sharded_policy_eval`, on the same per-family
    lane-block plan as `build_packed_mixed_rollout`.

    Surface (carry form only — policy eval is a steady-state serving
    loop): `step(key, carries) -> (carries, RolloutMetrics)` over a tuple
    of one `PackedCarry` per member (build with each member's
    `packed_init(env, states, mode)`). With a mesh, every member block
    additionally shards over the 'env' axis.
    """
    from minigrid_tpu.core.rollout import RolloutMetrics
    from minigrid_tpu.ops.policy_rollout import build_policy_eval_rollout
    from minigrid_tpu.parallel.packed import build_sharded_policy_eval

    assert len(params_list) == len(env_ids), "one params per member family"
    if mesh is not None:
        inners = [
            build_sharded_policy_eval(
                minigrid_tpu.make(e), p, num_steps, mesh, mode=mode,
                backend=backend, as_carry=True,
            )
            for e, p in zip(env_ids, params_list)
        ]
    else:
        if backend == "auto":
            backend = "pallas" if _mosaic_available() else "xla"
        inners = [
            build_policy_eval_rollout(
                minigrid_tpu.make(e), p, num_steps, mode=mode,
                backend=backend, regen_chunk=regen_chunk, as_carry=True,
            )
            for e, p in zip(env_ids, params_list)
        ]

    def step(key: jax.Array, carries):
        finals = []
        total = None
        for i, inner in enumerate(inners):
            c, m = inner(jax.random.fold_in(key, i), carries[i])
            finals.append(c)
            total = (
                m
                if total is None
                else RolloutMetrics(
                    episodes=total.episodes + m.episodes,
                    total_reward=total.total_reward + m.total_reward,
                    total_steps=total.total_steps + m.total_steps,
                    obs_checksum=total.obs_checksum + m.obs_checksum,
                    reset_overlaps=jnp.asarray(total.reset_overlaps)
                    + jnp.asarray(m.reset_overlaps),
                )
            )
        return tuple(finals), total

    return jax.jit(step) if mesh is None else step
