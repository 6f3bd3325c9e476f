"""Equivalence tests for the fused Pallas rollout kernel (ops/fused_rollout).

The kernel runs in interpret mode on the CPU test mesh; every test replays
the SAME key through the XLA reference path (`core.rollout.build_rollout`)
and the fused kernel, asserting identical episodes / total_steps /
obs_checksum (exact integers), total_reward (float tolerance — the two
paths sum rewards in different orders, see the ops/fused_rollout docstring)
and identical final states.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import minigrid_tpu
from minigrid_tpu.core.grid import see_behind_mask
from minigrid_tpu.core.rollout import build_rollout
from minigrid_tpu.core.vision import process_vis
from minigrid_tpu.ops.fused_rollout import (
    _auto_lane_block,
    build_fused_rollout,
    build_packed_xla_rollout,
    fused_rollout_supported,
    pack_states,
    visibility_bitmask,
)

B = 128  # lane-block minimum


def _run_both(env_id, num_steps, mode, step_chunk=32, seed=0, backend="pallas"):
    env = minigrid_tpu.make(env_id)
    assert fused_rollout_supported(env, B, mode=mode), env_id
    key = jax.random.PRNGKey(seed)
    key, k_reset = jax.random.split(key)
    states, _ = jax.jit(env.reset_batch, static_argnums=1)(k_reset, B)

    xla = jax.jit(build_rollout(env, num_steps, autoreset_mode=mode))
    if backend == "pallas":
        fused = jax.jit(
            build_fused_rollout(
                env, num_steps, mode=mode, step_chunk=step_chunk, interpret=True
            )
        )
    else:
        fused = jax.jit(build_packed_xla_rollout(env, num_steps, mode=mode))
    sx, mx = xla(key, states)
    sf, mf = fused(key, states)
    return sx, mx, sf, mf


def _assert_equivalent(sx, mx, sf, mf):
    assert int(mf.episodes) == int(mx.episodes)
    assert int(mf.total_steps) == int(mx.total_steps)
    assert int(mf.obs_checksum) == int(mx.obs_checksum)
    # Different float32 summation order (per-env-then-batch vs
    # per-step-batch) — tolerance, not equality.
    np.testing.assert_allclose(
        float(mf.total_reward), float(mx.total_reward), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_array_equal(np.asarray(sf.grid), np.asarray(sx.grid))
    np.testing.assert_array_equal(
        np.asarray(sf.agent_pos), np.asarray(sx.agent_pos)
    )
    np.testing.assert_array_equal(
        np.asarray(sf.agent_dir), np.asarray(sx.agent_dir)
    )
    np.testing.assert_array_equal(
        np.asarray(sf.carrying), np.asarray(sx.carrying)
    )
    np.testing.assert_array_equal(
        np.asarray(sf.step_count), np.asarray(sx.step_count)
    )
    np.testing.assert_array_equal(np.asarray(sf.rng), np.asarray(sx.rng))
    np.testing.assert_array_equal(np.asarray(sf.mission), np.asarray(sx.mission))


class TestVisibilityBitmask:
    """The kernel's bitmask occlusion flood vs core.vision.process_vis."""

    @pytest.mark.parametrize("view", [3, 5, 7])
    def test_matches_process_vis_on_random_grids(self, view):
        from minigrid_tpu.core import constants as C

        rng = np.random.default_rng(42 + view)
        n = 64
        # Random mix of transparent / wall / closed+open doors.
        types = rng.choice(
            [C.EMPTY, C.WALL, C.DOOR, C.LAVA, C.KEY],
            size=(n, view, view),
            p=[0.4, 0.3, 0.15, 0.1, 0.05],
        ).astype(np.uint8)
        door_states = rng.integers(0, 3, size=(n, view, view)).astype(np.uint8)
        grids = np.zeros((n, view, view, 5), dtype=np.uint8)
        grids[..., 0] = types
        grids[..., 2] = np.where(types == C.DOOR, door_states, 0)

        expected = jax.vmap(process_vis)(jnp.asarray(grids))  # (n, V, V) bool

        trans = jax.vmap(see_behind_mask)(jnp.asarray(grids)).astype(jnp.int32)
        # Pack each row's transparency into bits: bit i = column i.
        weights = (1 << jnp.arange(view)).astype(jnp.int32)
        trans_rows = jnp.sum(trans * weights[None, None, :], axis=-1)  # (n, V)
        vis_rows = visibility_bitmask(trans_rows.T, view)  # (V, n)
        got = (vis_rows.T[:, :, None] >> jnp.arange(view)[None, None, :]) & 1

        np.testing.assert_array_equal(
            np.asarray(got, dtype=bool), np.asarray(expected)
        )

    def test_agent_cell_always_visible(self):
        view = 7
        # Fully opaque view: only the agent's own cell lights up.
        trans_rows = jnp.zeros((view, 4), dtype=jnp.int32)
        vis = visibility_bitmask(trans_rows, view)
        expected = np.zeros((view, 4), dtype=np.int32)
        expected[view - 1, :] = 1 << (view // 2)
        np.testing.assert_array_equal(np.asarray(vis), expected)


class TestFusedEquivalenceRegen:
    """Deterministic-layout families: fused == XLA regen path, bit for bit."""

    def test_empty_8x8(self):
        _assert_equivalent(*_run_both("MiniGrid-Empty-8x8-v0", 64, "regen"))

    def test_empty_5x5_with_resets(self):
        # num_steps > max_steps (100) forces at least one truncation reset
        # per env, exercising template auto-reset AND the rng chain replay.
        sx, mx, sf, mf = _run_both("MiniGrid-Empty-5x5-v0", 128, "regen")
        assert int(mx.episodes) >= B  # every env reset at least once
        _assert_equivalent(sx, mx, sf, mf)

    def test_distshift1(self):
        # Lava next to the start: random policies terminate fast, so resets
        # (and the goal/lava termination paths) are exercised heavily.
        sx, mx, sf, mf = _run_both("MiniGrid-DistShift1-v0", 64, "regen")
        assert int(mx.episodes) > 0
        _assert_equivalent(sx, mx, sf, mf)

    def test_unsupported_random_layout_raises(self):
        env = minigrid_tpu.make("MiniGrid-Empty-Random-5x5-v0")
        assert not fused_rollout_supported(env, mode="regen")
        with pytest.raises(ValueError):
            build_fused_rollout(env, 8, mode="regen")

    def test_unsupported_custom_step_raises(self):
        env = minigrid_tpu.make("MiniGrid-Fetch-5x5-N2-v0")
        assert not fused_rollout_supported(env, mode="cached")
        with pytest.raises(ValueError):
            build_fused_rollout(env, 8, mode="cached")


class TestFusedEquivalenceCached:
    """Random-layout base-step families under cached auto-reset: exercises
    doors/keys/pickup/toggle and the occlusion flood (see_through_walls
    False) inside the kernel, per-env heterogeneous layouts included."""

    def test_lavagap(self):
        sx, mx, sf, mf = _run_both("MiniGrid-LavaGapS5-v0", 64, "cached")
        assert int(mx.episodes) > 0  # lava deaths
        _assert_equivalent(sx, mx, sf, mf)

    def test_doorkey(self):
        _assert_equivalent(*_run_both("MiniGrid-DoorKey-5x5-v0", 64, "cached"))

    def test_fourrooms(self):
        _assert_equivalent(
            *_run_both("MiniGrid-FourRooms-v0", 32, "cached", step_chunk=16)
        )


class TestPackedXlaEquivalence:
    """The no-Pallas twin (`build_packed_xla_rollout`) — same `_step_core`,
    plain `lax.scan` — against the vmap reference path."""

    def test_empty_5x5_regen_with_resets(self):
        sx, mx, sf, mf = _run_both(
            "MiniGrid-Empty-5x5-v0", 128, "regen", backend="xla"
        )
        assert int(mx.episodes) >= B
        _assert_equivalent(sx, mx, sf, mf)

    def test_distshift1_regen(self):
        sx, mx, sf, mf = _run_both(
            "MiniGrid-DistShift1-v0", 64, "regen", backend="xla"
        )
        assert int(mx.episodes) > 0
        _assert_equivalent(sx, mx, sf, mf)

    def test_doorkey_cached(self):
        _assert_equivalent(
            *_run_both("MiniGrid-DoorKey-5x5-v0", 64, "cached", backend="xla")
        )


class TestVmemSizing:
    def test_auto_lane_block_shrinks_with_grid(self):
        assert _auto_lane_block(64, 128) >= 512
        assert _auto_lane_block(361, 128) >= 128
        # A huge grid must drive the block below the 128-lane minimum.
        assert _auto_lane_block(200_000, 128) < 128

    def test_oversized_lane_block_rejected(self):
        env = minigrid_tpu.make("MiniGrid-Empty-8x8-v0")
        with pytest.raises(ValueError, match="VMEM"):
            build_fused_rollout(env, 8, lane_block=1 << 20)

    def test_pack_unpack_roundtrip(self):
        from minigrid_tpu.ops.fused_rollout import unpack_states

        env = minigrid_tpu.make("MiniGrid-DoorKey-5x5-v0")
        states, _ = jax.jit(env.reset_batch, static_argnums=1)(
            jax.random.PRNGKey(3), 8
        )
        words, regs = pack_states(states)
        back = unpack_states(words, regs, states, env.config)
        for leaf_a, leaf_b in zip(
            jax.tree.leaves(states), jax.tree.leaves(back)
        ):
            np.testing.assert_array_equal(np.asarray(leaf_a), np.asarray(leaf_b))
