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


def _run_both(
    env_id, num_steps, mode, step_chunk=32, seed=0, backend="pallas", doctor=None
):
    env = minigrid_tpu.make(env_id)
    assert fused_rollout_supported(env, B, mode=mode), env_id
    key = jax.random.PRNGKey(seed)
    key, k_reset = jax.random.split(key)
    states, _ = jax.jit(env.reset_batch, static_argnums=1)(k_reset, B)
    if doctor is not None:
        states = doctor(states)

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
    np.testing.assert_array_equal(np.asarray(sf.aux), np.asarray(sx.aux))


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

    def test_unknown_mode_unsupported(self):
        env = minigrid_tpu.make("MiniGrid-Empty-8x8-v0")
        assert not fused_rollout_supported(env, mode="nonsense")
        with pytest.raises(ValueError):
            build_fused_rollout(env, 8, mode="nonsense")

    def test_hooked_family_supported_both_modes(self):
        env = minigrid_tpu.make("MiniGrid-Fetch-5x5-N2-v0")
        assert fused_rollout_supported(env, mode="cached")
        assert fused_rollout_supported(env, mode="regen")


class TestChunkedRegen:
    """Reference-faithful regen auto-reset on the packed engines for
    RANDOM-layout families (chunked template refresh,
    `ops/fused_rollout._build_chunked_regen`) vs the vmap regen path.

    `regen_chunk=1` refreshes templates every step — overlap-free by
    construction, so equivalence must be byte-exact (including the rng
    chain). Larger chunks are exact whenever `reset_overlaps == 0`, which
    the engine counts.
    """

    def _run(self, env_id, steps, *, backend, regen_chunk, seed=0):
        env = minigrid_tpu.make(env_id)
        key = jax.random.PRNGKey(seed)
        key, k_reset = jax.random.split(key)
        states, _ = jax.jit(env.reset_batch, static_argnums=1)(k_reset, B)
        xla = jax.jit(build_rollout(env, steps, autoreset_mode="regen"))
        if backend == "pallas":
            fused = jax.jit(
                build_fused_rollout(
                    env, steps, mode="regen", regen_chunk=regen_chunk,
                    interpret=True,
                )
            )
        else:
            fused = jax.jit(
                build_packed_xla_rollout(
                    env, steps, mode="regen", regen_chunk=regen_chunk
                )
            )
        sx, mx = xla(key, states)
        sf, mf = fused(key, states)
        return sx, mx, sf, mf

    def test_empty_random_xla_chunk1(self):
        # Random agent placement per reset: the layout genuinely resamples.
        sx, mx, sf, mf = self._run(
            "MiniGrid-Empty-Random-5x5-v0", 128, backend="xla", regen_chunk=1
        )
        assert int(mx.episodes) >= B  # every env truncates at least once
        assert int(mf.reset_overlaps) == 0
        _assert_equivalent(sx, mx, sf, mf)

    def test_doorkey_xla_chunk1(self):
        sx, mx, sf, mf = self._run(
            "MiniGrid-DoorKey-5x5-v0", 64, backend="xla", regen_chunk=1
        )
        assert int(mf.reset_overlaps) == 0
        _assert_equivalent(sx, mx, sf, mf)

    def test_lavagap_xla_chunk1(self):
        # Lava deaths end episodes fast — resets + template refresh fire
        # constantly; chunk=1 keeps it exact regardless.
        sx, mx, sf, mf = self._run(
            "MiniGrid-LavaGapS5-v0", 64, backend="xla", regen_chunk=1
        )
        assert int(mx.episodes) > 0
        assert int(mf.reset_overlaps) == 0
        _assert_equivalent(sx, mx, sf, mf)

    def test_lavagap_chunk4_exact_with_overlaps(self):
        # With a 4-step chunk some lane dies twice inside one chunk (lava
        # sits two moves from spawn). The freeze/re-entry commit protocol
        # must DEFER those resets (counted in reset_overlaps) and replay
        # them with genuinely fresh layouts — byte-exact vs the vmap regen
        # path even though overlaps fired.
        sx, mx, sf, mf = self._run(
            "MiniGrid-LavaGapS5-v0", 64, backend="xla", regen_chunk=4
        )
        assert int(mf.reset_overlaps) > 0
        _assert_equivalent(sx, mx, sf, mf)

    def test_lavagap_chunk16_exact(self):
        # Bigger chunk, more frequent overlaps — still byte-exact.
        sx, mx, sf, mf = self._run(
            "MiniGrid-LavaGapS5-v0", 64, backend="xla", regen_chunk=16
        )
        assert int(mf.reset_overlaps) > 0
        _assert_equivalent(sx, mx, sf, mf)

    def test_fetch_hooked_xla_chunk1(self):
        # Hooked custom-step family under regen: any pickup terminates.
        sx, mx, sf, mf = self._run(
            "MiniGrid-Fetch-5x5-N2-v0", 48, backend="xla", regen_chunk=1
        )
        assert int(mx.episodes) > 0
        assert int(mf.reset_overlaps) == 0
        _assert_equivalent(sx, mx, sf, mf)

    def test_doorkey_pallas_chunk4(self):
        sx, mx, sf, mf = self._run(
            "MiniGrid-DoorKey-5x5-v0", 32, backend="pallas", regen_chunk=4
        )
        assert int(mf.reset_overlaps) == 0
        _assert_equivalent(sx, mx, sf, mf)

    def test_lavagap_pallas_chunk8_exact_with_overlaps(self):
        # The commit protocol inside the actual Pallas kernel (interpret
        # mode): overlapping resets must defer + replay byte-exactly.
        sx, mx, sf, mf = self._run(
            "MiniGrid-LavaGapS5-v0", 32, backend="pallas", regen_chunk=8
        )
        assert int(mf.reset_overlaps) > 0
        _assert_equivalent(sx, mx, sf, mf)

    def test_forced_dense_overlaps_exact(self):
        # max_steps=2 truncates every 2 steps: a chunk of 8 sees 4 resets
        # per lane (the worst case for the re-entry loop: EVERY lane
        # defers 3 resets per chunk) — still byte-exact vs the vmap path.
        import dataclasses

        env = minigrid_tpu.make("MiniGrid-FourRooms-v0")
        env = dataclasses.replace(
            env, config=dataclasses.replace(env.config, max_steps=2)
        )
        key = jax.random.PRNGKey(1)
        key, k_reset = jax.random.split(key)
        states, _ = jax.jit(env.reset_batch, static_argnums=1)(k_reset, B)
        xla = jax.jit(build_rollout(env, 16, autoreset_mode="regen"))
        fused = jax.jit(
            build_packed_xla_rollout(env, 16, mode="regen", regen_chunk=8)
        )
        sx, mx = xla(key, states)
        sf, mf = fused(key, states)
        assert int(mf.reset_overlaps) >= 3 * B  # ≥3 deferred resets/lane/chunk
        _assert_equivalent(sx, mx, sf, mf)


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
        back = unpack_states(words, regs, env.config)
        for leaf_a, leaf_b in zip(
            jax.tree.leaves(states), jax.tree.leaves(back)
        ):
            np.testing.assert_array_equal(np.asarray(leaf_a), np.asarray(leaf_b))


class TestPackedHookFamilies:
    """The ten custom-step families on the packed engines (cached mode):
    each family's post-hook (ops/packed_hooks.py) against its vmap `step`
    override, random layouts, resets included. XLA twin for every family;
    Pallas interpret mode for the three hook mechanisms (regs-only,
    absolute-read, action-remap)."""

    # (env_id, num_steps) — steps sized so random rollouts hit the hook's
    # terminations (pickup/toggle/done fire constantly under random actions).
    FAMILY_CASES = [
        ("MiniGrid-Fetch-5x5-N2-v0", 64),
        ("MiniGrid-GoToDoor-5x5-v0", 64),
        ("MiniGrid-GoToObject-6x6-N2-v0", 64),
        ("MiniGrid-PutNear-6x6-N2-v0", 64),
        ("MiniGrid-MemoryS7-v0", 64),
        ("MiniGrid-RedBlueDoors-6x6-v0", 64),
    ]

    # Families whose success path random actions can't reach in bounded
    # steps (locked doors, hidden keys): reset states are DOCTORED to put
    # the agent one action from the target, so the hook's success
    # termination genuinely fires — both engines receive the identical
    # doctored batch, so equivalence is still exact.
    DOCTORED_CASES = [
        ("MiniGrid-Unlock-v0", 64),
        ("MiniGrid-UnlockPickup-v0", 64),
        ("MiniGrid-BlockedUnlockPickup-v0", 64),
        ("MiniGrid-KeyCorridorS3R1-v0", 64),
        ("MiniGrid-ObstructedMaze-1Dl-v0", 64),
    ]

    @staticmethod
    def _doctor(env_id):
        from minigrid_tpu.core import constants as C

        def doctor(states):
            g = np.asarray(states.grid).copy()
            pos = np.asarray(states.agent_pos).copy()
            dirn = np.asarray(states.agent_dir).copy()
            carry = np.asarray(states.carrying).copy()
            aux = np.asarray(states.aux)
            n = g.shape[0]
            if env_id == "MiniGrid-Unlock-v0":
                # Face the target door from its left, matching key in hand.
                dx, dy = aux[:, 0], aux[:, 1]
                color = g[np.arange(n), dy, dx, 1]
                pos[:, 0], pos[:, 1] = dx - 1, dy
                dirn[:] = 0
                carry[:] = 0
                carry[:, 0], carry[:, 1] = C.KEY, color
            else:
                # Park the agent at (1,1) facing the aux target (type,
                # color) planted straight ahead, hands free.
                pos[:, 0], pos[:, 1] = 1, 1
                dirn[:] = 0
                g[:, 1, 2, :] = 0
                g[:, 1, 2, 0] = aux[:, 0]
                g[:, 1, 2, 1] = aux[:, 1]
                carry[:] = 0
            return states.replace(
                grid=jnp.asarray(g, dtype=states.grid.dtype),
                agent_pos=jnp.asarray(pos, dtype=states.agent_pos.dtype),
                agent_dir=jnp.asarray(dirn, dtype=states.agent_dir.dtype),
                carrying=jnp.asarray(carry, dtype=states.carrying.dtype),
            )

        return doctor

    @pytest.mark.parametrize("env_id,steps", FAMILY_CASES)
    def test_xla_twin_matches_vmap(self, env_id, steps):
        sx, mx, sf, mf = _run_both(env_id, steps, "cached", backend="xla")
        # Hook terminations must actually fire under random actions,
        # otherwise this test proves nothing about the hook.
        assert int(mx.episodes) > 0, env_id
        _assert_equivalent(sx, mx, sf, mf)

    @pytest.mark.parametrize("env_id,steps", DOCTORED_CASES)
    def test_xla_twin_matches_vmap_doctored(self, env_id, steps):
        sx, mx, sf, mf = _run_both(
            env_id, steps, "cached", backend="xla", doctor=self._doctor(env_id)
        )
        assert int(mx.episodes) > 0, env_id
        _assert_equivalent(sx, mx, sf, mf)

    # EVERY hooked family runs inside the actual Pallas kernel (interpret
    # mode on CPU), not only mechanism exemplars — locked-door families use
    # the same doctored states as the XLA-twin tests so their success
    # terminations genuinely fire in-kernel.
    PALLAS_CASES = [e for e, _ in FAMILY_CASES] + [e for e, _ in DOCTORED_CASES]

    @pytest.mark.parametrize("env_id", PALLAS_CASES)
    def test_pallas_kernel_matches_vmap(self, env_id):
        needs_doctor = env_id in {e for e, _ in self.DOCTORED_CASES}
        doctor = self._doctor(env_id) if needs_doctor else None
        sx, mx, sf, mf = _run_both(
            env_id, 32, "cached", step_chunk=16, backend="pallas", doctor=doctor
        )
        assert int(mx.episodes) > 0, env_id
        _assert_equivalent(sx, mx, sf, mf)


class TestChunkedRegenAllHookedFamilies:
    """EVERY hooked family under regen-mode chunked refresh on the packed
    engine (XLA twin; the kernel shares `_step_core`/`_build_chunked_regen`
    and is covered on exemplars above): families whose per-episode aux
    targets and missions genuinely change across resets (GoToDoor's door
    color, PutNear's two targets, Memory's success/fail cells, the
    locked-door families' key/target) must swap them correctly through the
    template-refresh `tail2` select. regen_chunk=4 exercises the refresh
    AND the freeze/re-entry commit protocol under real resets."""

    @pytest.mark.parametrize(
        "env_id,steps",
        [
            ("MiniGrid-Fetch-5x5-N2-v0", 48),
            ("MiniGrid-GoToDoor-5x5-v0", 48),
            ("MiniGrid-GoToObject-6x6-N2-v0", 48),
            ("MiniGrid-PutNear-6x6-N2-v0", 48),
            ("MiniGrid-MemoryS7-v0", 48),
            ("MiniGrid-RedBlueDoors-6x6-v0", 48),
            ("MiniGrid-Unlock-v0", 48),
            ("MiniGrid-UnlockPickup-v0", 48),
            ("MiniGrid-BlockedUnlockPickup-v0", 48),
            ("MiniGrid-KeyCorridorS3R1-v0", 48),
            ("MiniGrid-ObstructedMaze-1Dl-v0", 48),
        ],
    )
    def test_xla_regen_chunk4(self, env_id, steps):
        doctored = {e for e, _ in TestPackedHookFamilies.DOCTORED_CASES}
        doctor = (
            TestPackedHookFamilies._doctor(env_id) if env_id in doctored else None
        )
        env = minigrid_tpu.make(env_id)
        key = jax.random.PRNGKey(5)
        key, k_reset = jax.random.split(key)
        states, _ = jax.jit(env.reset_batch, static_argnums=1)(k_reset, B)
        if doctor is not None:
            states = doctor(states)
        xla = jax.jit(build_rollout(env, steps, autoreset_mode="regen"))
        packed = jax.jit(
            build_packed_xla_rollout(env, steps, mode="regen", regen_chunk=4)
        )
        sx, mx = xla(key, states)
        sf, mf = packed(key, states)
        # Resets must actually fire (otherwise the refresh is never
        # exercised): hook terminations under random actions, or the
        # doctored first episodes for the locked-door families.
        assert int(mx.episodes) > 0, env_id
        _assert_equivalent(sx, mx, sf, mf)


class TestDynamicObstaclesPacked:
    """DynamicObstacles on the packed engines: the PRE-step hook's
    register-file obstacle walk + counter-based bits (core/prng.py) must
    reproduce the vmap transition bit-for-bit — same layouts, same walks,
    same collisions — in both auto-reset modes and in the Pallas kernel."""

    ENV = "MiniGrid-Dynamic-Obstacles-5x5-v0"

    def test_supported_both_modes(self):
        env = minigrid_tpu.make(self.ENV)
        assert fused_rollout_supported(env, mode="cached")
        assert fused_rollout_supported(env, mode="regen")

    def test_xla_twin_cached(self):
        sx, mx, sf, mf = _run_both(self.ENV, 64, "cached", backend="xla")
        assert int(mx.episodes) > 0  # collisions fire under random walks
        assert float(mx.total_reward) < 0  # −1 collision penalties dominate
        _assert_equivalent(sx, mx, sf, mf)

    def test_xla_twin_regen_chunk1(self):
        env = minigrid_tpu.make(self.ENV)
        key = jax.random.PRNGKey(0)
        key, k_reset = jax.random.split(key)
        states, _ = jax.jit(env.reset_batch, static_argnums=1)(k_reset, B)
        xla = jax.jit(build_rollout(env, 48, autoreset_mode="regen"))
        packed = jax.jit(
            build_packed_xla_rollout(env, 48, mode="regen", regen_chunk=1)
        )
        sx, mx = xla(key, states)
        sf, mf = packed(key, states)
        assert int(mx.episodes) > 0
        assert int(mf.reset_overlaps) == 0
        _assert_equivalent(sx, mx, sf, mf)

    def test_pallas_kernel_cached(self):
        sx, mx, sf, mf = _run_both(
            self.ENV, 32, "cached", step_chunk=16, backend="pallas"
        )
        assert int(mx.episodes) > 0
        _assert_equivalent(sx, mx, sf, mf)

    def test_threefry_matches_jax(self):
        # The in-kernel PRNG must be the real Threefry-2x32 (the generator
        # jax.random itself uses), not an ad-hoc hash.
        from jax._src import prng as jprng

        from minigrid_tpu.core.prng import threefry2x32

        key = np.array([0x12345678, 0x9ABCDEF0], dtype=np.uint32)
        counts = np.arange(8, dtype=np.uint32)
        ref = np.asarray(jprng.threefry_2x32(jnp.asarray(key), jnp.asarray(counts)))
        kw = key.view(np.int32)
        y0, y1 = threefry2x32(
            jnp.int32(kw[0]),
            jnp.int32(kw[1]),
            jnp.asarray(counts[:4].astype(np.int32)),
            jnp.asarray(counts[4:].astype(np.int32)),
        )
        got = np.concatenate(
            [np.asarray(y0).view(np.uint32), np.asarray(y1).view(np.uint32)]
        )
        np.testing.assert_array_equal(ref, got)


class TestPackedObsImage:
    """packed_obs_image(_obs_core(·)) must be byte-identical to the vmap
    encoder `core.obs.gen_obs_image` on the same states."""

    @pytest.mark.parametrize(
        "env_id",
        ["MiniGrid-Empty-8x8-v0", "MiniGrid-DoorKey-5x5-v0"],
    )
    def test_matches_gen_obs_image(self, env_id):
        from minigrid_tpu.core.obs import gen_obs_image
        from minigrid_tpu.ops.fused_rollout import (
            _agent_base,
            _obs_core,
            _roll_to_base,
            packed_obs_image,
        )

        env = minigrid_tpu.make(env_id)
        cfg = env.config
        states, _ = jax.jit(env.reset_batch, static_argnums=1)(
            jax.random.PRNGKey(7), 32
        )
        # Walk a few random steps so carried objects / door states vary.
        key = jax.random.PRNGKey(8)
        for _ in range(8):
            key, k = jax.random.split(key)
            a = jax.random.randint(k, (32,), 0, cfg.num_actions)
            states, *_ = jax.jit(env.step_batch)(states, a)

        words, regs = pack_states(states)
        words = _roll_to_base(words, _agent_base(regs, cfg.width))
        vw, vis = _obs_core(
            words,
            regs,
            width=cfg.width,
            height=cfg.height,
            view=cfg.agent_view_size,
            see_through_walls=cfg.see_through_walls,
        )
        got = packed_obs_image(vw, vis, cfg.agent_view_size)
        want = jax.vmap(lambda s: gen_obs_image(s, cfg))(states)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


class TestCarryApi:
    """The steady-state carry surface (`as_carry=True` + `packed_init`/
    `packed_finish`) must be step-for-step identical to chaining the
    legacy `rollout(key, states)` surface — the legacy surface IS
    init → one step → finish, so N carry steps under keys k1..kN must
    equal N legacy calls threading the returned states."""

    CASES = [
        ("MiniGrid-Empty-8x8-v0", "regen"),  # static-template regen
        ("MiniGrid-DoorKey-5x5-v0", "cached"),  # pinned template
        ("MiniGrid-DoorKey-5x5-v0", "regen"),  # chunked template refresh
    ]

    @pytest.mark.parametrize("env_id,mode", CASES)
    @pytest.mark.parametrize("backend", ["xla", "pallas"])
    def test_matches_chained_legacy(self, env_id, mode, backend):
        from minigrid_tpu.ops.fused_rollout import packed_finish, packed_init

        env = minigrid_tpu.make(env_id)
        num_steps, n_calls = 32, 3
        key = jax.random.PRNGKey(3)
        key, k_reset = jax.random.split(key)
        states0, _ = jax.jit(env.reset_batch, static_argnums=1)(k_reset, B)
        kw = dict(interpret=True) if backend == "pallas" else {}
        build = (
            build_fused_rollout if backend == "pallas"
            else build_packed_xla_rollout
        )
        legacy = jax.jit(build(env, num_steps, mode=mode, **kw))
        step = jax.jit(build(env, num_steps, mode=mode, as_carry=True, **kw))

        keys = jax.random.split(key, n_calls)
        st = states0
        legacy_metrics = []
        for k in keys:
            st, m = legacy(k, st)
            legacy_metrics.append(m)

        carry = jax.jit(
            lambda s: packed_init(env, s, mode), static_argnums=()
        )(states0)
        carry_metrics = []
        for k in keys:
            carry, m = step(k, carry)
            carry_metrics.append(m)
        sf = jax.jit(lambda c: packed_finish(env, c))(carry)

        for ml, mc in zip(legacy_metrics, carry_metrics):
            assert int(mc.episodes) == int(ml.episodes)
            assert int(mc.total_steps) == int(ml.total_steps)
            assert int(mc.obs_checksum) == int(ml.obs_checksum)
            np.testing.assert_allclose(
                float(mc.total_reward), float(ml.total_reward),
                rtol=1e-5, atol=1e-5,
            )
        for leaf_l, leaf_c in zip(
            jax.tree_util.tree_leaves(st), jax.tree_util.tree_leaves(sf)
        ):
            np.testing.assert_array_equal(
                np.asarray(leaf_l), np.asarray(leaf_c)
            )


class TestMatmulRowReader:
    """The kernel's MXU row-selection matmul reader (row_reader="matmul";
    kept as a measured-off alternative, see `build_fused_rollout`) must be
    bit-identical to the static-slice reader — exactness argument in
    `_rollout_kernel`."""

    @pytest.mark.parametrize(
        "env_id,mode",
        [
            ("MiniGrid-Empty-8x8-v0", "regen"),
            ("MiniGrid-DoorKey-8x8-v0", "cached"),
            ("MiniGrid-MultiRoom-N4-S5-v0", "cached"),  # hw=625
        ],
    )
    def test_matches_vmap(self, env_id, mode):
        env = minigrid_tpu.make(env_id)
        key = jax.random.PRNGKey(11)
        key, k_reset = jax.random.split(key)
        states, _ = jax.jit(env.reset_batch, static_argnums=1)(k_reset, B)
        xla = jax.jit(build_rollout(env, 24, autoreset_mode=mode))
        fused = jax.jit(
            build_fused_rollout(
                env, 24, mode=mode, step_chunk=8, interpret=True,
                row_reader="matmul",
            )
        )
        sx, mx = xla(key, states)
        sf, mf = fused(key, states)
        _assert_equivalent(sx, mx, sf, mf)
