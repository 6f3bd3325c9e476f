"""Executable support matrix (VERDICT r4 #7).

One cell per (family representative x auto-reset mode x surface), where
surface is the packed rollout engine (`fused_rollout_supported`), the
policy-in-kernel evaluation rollout (`policy_rollout_supported(...,
collect=False)`), or the trajectory-collecting train rollout
(`collect=True`). The support predicates are the public contract the
benches and train steps dispatch on; this test asserts the full matrix is
TRUE — every family, both modes, all three surfaces (random-layout regen
runs the exact chunked refresh of ops/chunked_regen.py) — and that every
cell actually builds and runs one rollout step on the XLA twin (which
shares `_step_core` with the Pallas kernel; kernel equivalence is covered
by tests/test_fused_rollout.py and tests/test_policy_rollout.py).
"""

import functools

import jax
import jax.numpy as jnp
import pytest

import minigrid_tpu
from minigrid_tpu.ops.fused_rollout import (
    build_packed_xla_rollout,
    fused_rollout_supported,
    packed_init,
)
from minigrid_tpu.ops.policy_rollout import (
    build_fused_train_rollout,
    build_policy_eval_rollout,
    policy_rollout_supported,
)

# One representative id per family (SURVEY.md §2.6's 21 families; the two
# crossing variants share a module but differ in obstacle type, so both
# appear).
FAMILY_REPS = [
    "MiniGrid-Empty-8x8-v0",
    "MiniGrid-DistShift1-v0",
    "MiniGrid-LavaGapS5-v0",
    "MiniGrid-FourRooms-v0",
    "MiniGrid-DoorKey-5x5-v0",
    "MiniGrid-LavaCrossingS9N1-v0",
    "MiniGrid-SimpleCrossingS9N1-v0",
    "MiniGrid-Dynamic-Obstacles-5x5-v0",
    "MiniGrid-MemoryS7-v0",
    "MiniGrid-Fetch-5x5-N2-v0",
    "MiniGrid-GoToDoor-5x5-v0",
    "MiniGrid-GoToObject-6x6-N2-v0",
    "MiniGrid-PutNear-6x6-N2-v0",
    "MiniGrid-RedBlueDoors-6x6-v0",
    "MiniGrid-MultiRoom-N2-S4-v0",
    "MiniGrid-LockedRoom-v0",
    "MiniGrid-Playground-v0",
    "MiniGrid-Unlock-v0",
    "MiniGrid-UnlockPickup-v0",
    "MiniGrid-BlockedUnlockPickup-v0",
    "MiniGrid-KeyCorridorS3R1-v0",
    "MiniGrid-ObstructedMaze-1Dl-v0",
]

MODES = ["cached", "regen"]
B = 128
STEPS = 4


@functools.lru_cache(maxsize=None)
def _env_states(env_id, mode):
    env = minigrid_tpu.make(env_id)
    states, _ = jax.jit(env.reset_batch, static_argnums=1)(
        jax.random.PRNGKey(11), B
    )
    carry = jax.jit(lambda s: packed_init(env, s, mode))(states)
    return env, states, carry


@functools.lru_cache(maxsize=None)
def _params(env_id):
    from minigrid_tpu.models.policy import ActorCritic

    env = minigrid_tpu.make(env_id)
    v = env.config.agent_view_size
    model = ActorCritic(num_actions=env.num_actions)
    return model.init(
        jax.random.PRNGKey(12), jnp.zeros((1, v, v, 3), jnp.uint8)
    )


class TestSupportMatrix:
    @pytest.mark.parametrize("mode", MODES)
    @pytest.mark.parametrize("env_id", FAMILY_REPS)
    def test_fused_rollout_cell(self, env_id, mode):
        env, _, carry = _env_states(env_id, mode)
        assert fused_rollout_supported(env, B, mode=mode), (env_id, mode)
        step = jax.jit(
            build_packed_xla_rollout(
                env, STEPS, mode=mode, as_carry=True, regen_chunk=STEPS
            )
        )
        _, m = step(jax.random.PRNGKey(13), carry)
        assert int(m.total_steps) == B * STEPS

    @pytest.mark.parametrize("mode", MODES)
    @pytest.mark.parametrize("env_id", FAMILY_REPS)
    def test_policy_eval_cell(self, env_id, mode):
        env, _, carry = _env_states(env_id, mode)
        assert policy_rollout_supported(env, mode, collect=False), (
            env_id, mode,
        )
        step = jax.jit(
            build_policy_eval_rollout(
                env, _params(env_id), STEPS, mode=mode, backend="xla",
                regen_chunk=STEPS, as_carry=True,
            )
        )
        _, m = step(jax.random.PRNGKey(14), carry)
        assert int(m.total_steps) == B * STEPS

    @pytest.mark.parametrize("mode", MODES)
    @pytest.mark.parametrize("env_id", FAMILY_REPS)
    def test_policy_collect_cell(self, env_id, mode):
        env, _, carry = _env_states(env_id, mode)
        assert policy_rollout_supported(env, mode, collect=True), (
            env_id, mode,
        )
        roll = jax.jit(
            build_fused_train_rollout(
                env, STEPS, mode=mode, backend="xla", regen_chunk=STEPS
            )
        )
        _, traj, m = roll(_params(env_id), jax.random.PRNGKey(15), carry)
        assert int(m.total_steps) == B * STEPS
        obs, actions, logp, value, reward, done = traj
        v = env.config.agent_view_size
        assert obs.shape == (STEPS, B, v, v, 3)
        assert actions.shape == (STEPS, B)
