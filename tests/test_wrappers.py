"""Wrapper + adapter + render + compat-path tests."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import minigrid_tpu
from minigrid_tpu import wrappers
from minigrid_tpu.core import constants as C


@functools.lru_cache(maxsize=None)
def base_env():
    return minigrid_tpu.make("MiniGrid-Empty-8x8-v0")


class TestFunctionalWrappers:
    def test_img_obs(self):
        env = wrappers.img_obs(base_env())
        state, obs = env.reset(jax.random.PRNGKey(0))
        assert obs.shape == (7, 7, 3) and obs.dtype == jnp.uint8

    def test_full_obs(self):
        env = wrappers.full_obs(base_env())
        state, obs = env.reset(jax.random.PRNGKey(0))
        img = np.asarray(obs["image"])
        assert img.shape == (8, 8, 3)
        ax, ay = np.asarray(state.agent_pos)
        assert img[ax, ay, 0] == C.AGENT
        assert img[ax, ay, 2] == int(state.agent_dir)
        # Walls encode as wall type on the border.
        assert (img[0, :, 0] == C.WALL).all()

    def test_one_hot(self):
        env = wrappers.one_hot_partial_obs(base_env())
        state, obs = env.reset(jax.random.PRNGKey(0))
        img = np.asarray(obs["image"])
        assert img.shape == (7, 7, 20)
        # Each channel block sums to exactly 1 per cell.
        assert (img[:, :, :11].sum(-1) == 1).all()
        assert (img[:, :, 11:17].sum(-1) == 1).all()
        assert (img[:, :, 17:].sum(-1) == 1).all()

    def test_view_size(self):
        env = wrappers.view_size(base_env(), 5)
        state, obs = env.reset(jax.random.PRNGKey(0))
        assert obs["image"].shape == (5, 5, 3)

    def test_rgb_wrappers(self):
        env = wrappers.rgb_img_obs(base_env(), tile_size=8)
        state, obs = env.reset(jax.random.PRNGKey(0))
        assert obs["image"].shape == (64, 64, 3)
        env = wrappers.rgb_img_partial_obs(base_env(), tile_size=8)
        state, obs = env.reset(jax.random.PRNGKey(0))
        assert obs["image"].shape == (56, 56, 3)

    def test_bonus_wrappers(self):
        cenv = wrappers.state_bonus(base_env())
        counts = cenv.init_counts()
        state, _ = cenv.env.reset(jax.random.PRNGKey(0))
        counts, state, obs, r, te, tr = cenv.step(counts, state, jnp.int32(0))
        assert float(r) == pytest.approx(1.0)  # first visit bonus 1/sqrt(1)
        counts, state, obs, r, te, tr = cenv.step(counts, state, jnp.int32(0))
        assert float(r) == pytest.approx(1.0 / np.sqrt(2))


class TestRender:
    def test_frame_structure(self):
        from minigrid_tpu.render import render_state

        env = minigrid_tpu.make("MiniGrid-DoorKey-5x5-v0")
        state, _ = env.reset(jax.random.PRNGKey(0))
        img = np.asarray(render_state(state, env.config, tile_size=16, highlight=False))
        assert img.shape == (80, 80, 3) and img.dtype == np.uint8
        g = np.asarray(state.grid)
        gy, gx = np.argwhere(g[:, :, 0] == C.GOAL)[0]
        goal_tile = img[gy * 16 : (gy + 1) * 16, gx * 16 : (gx + 1) * 16]
        assert goal_tile[:, :, 1].mean() > 200  # green
        # Agent triangle: red-dominant pixels on the agent's tile.
        ax, ay = np.asarray(state.agent_pos)
        at = img[ay * 16 : (ay + 1) * 16, ax * 16 : (ax + 1) * 16]
        assert ((at[:, :, 0] > 200) & (at[:, :, 1] < 60)).sum() > 10

    def test_highlight_changes_pixels(self):
        from minigrid_tpu.render import render_state

        env = minigrid_tpu.make("MiniGrid-Empty-5x5-v0")
        state, _ = env.reset(jax.random.PRNGKey(0))
        a = np.asarray(render_state(state, env.config, 8, highlight=True))
        b = np.asarray(render_state(state, env.config, 8, highlight=False))
        assert (a != b).any()


class TestGymAdapter:
    def test_reset_step_contract(self):
        from minigrid_tpu.compat import gym_make

        env = gym_make("MiniGrid-Empty-5x5-v0")
        obs, info = env.reset(seed=0)
        assert obs["image"].shape == (7, 7, 3)
        assert obs["mission"] == "get to the green goal square"
        obs, r, te, tr, info = env.step(2)
        assert isinstance(r, float) and isinstance(te, bool)
        assert env.observation_space["image"].contains(obs["image"])

    def test_old_api_shim(self):
        from minigrid_tpu.compat import gym_make

        env = gym_make("MiniGrid-Empty-5x5-v0", old_api=True)
        obs = env.reset()
        out = env.step(2)
        assert len(out) == 4

    def test_hash_and_str(self):
        from minigrid_tpu.compat import gym_make

        env = gym_make("MiniGrid-Empty-5x5-v0")
        env.reset(seed=0)
        h1 = env.hash()
        assert len(h1) == 16
        env.step(2)
        assert env.hash() != h1
        s = str(env)
        assert ">>" in s and "GG" in s

    def test_bonus_and_flat_wrappers(self):
        from minigrid_tpu.compat import ActionBonus, FlatObsWrapper, StateBonus, gym_make

        env = StateBonus(gym_make("MiniGrid-Empty-5x5-v0"))
        env.reset(seed=0)
        _, r, *_ = env.step(2)
        assert r == pytest.approx(1.0)

        env = ActionBonus(gym_make("MiniGrid-Empty-5x5-v0"))
        env.reset(seed=0)
        _, r, *_ = env.step(2)
        assert r == pytest.approx(1.0)

        env = FlatObsWrapper(gym_make("MiniGrid-Fetch-5x5-N2-v0"))
        obs, _ = env.reset(seed=0)
        assert obs.shape == (7 * 7 * 3 + 96 * 27,)


class TestExactReplay:
    @pytest.mark.parametrize(
        "env_id",
        ["MiniGrid-Empty-8x8-v0", "MiniGrid-DoorKey-8x8-v0",
         "MiniGrid-LavaCrossingS9N2-v0", "MiniGrid-MultiRoom-N4-S5-v0",
         "MiniGrid-Unlock-v0", "MiniGrid-BlockedUnlockPickup-v0",
         "MiniGrid-KeyCorridorS3R3-v0", "MiniGrid-ObstructedMaze-Full-v0"],
    )
    def test_deterministic_and_steppable(self, env_id):
        from minigrid_tpu.compat.exact import CompatEnv, state_to_device

        a = CompatEnv(env_id, seed=1337).reset()
        b = CompatEnv(env_id, seed=1337).reset()
        np.testing.assert_array_equal(a["grid"], b["grid"])
        np.testing.assert_array_equal(a["agent_pos"], b["agent_pos"])
        if env_id != "MiniGrid-Empty-8x8-v0":  # fixed layout: no RNG at all
            c = CompatEnv(env_id, seed=7).reset()
            assert not np.array_equal(a["grid"], c["grid"]) or not np.array_equal(
                a["agent_pos"], c["agent_pos"]
            )
        # The layout steps through the device kernel.
        env = minigrid_tpu.make(env_id)
        ds = state_to_device(a, env.config)
        s, obs, r, te, tr = env.step(ds, jnp.int32(2))
        assert obs["image"].shape[2] == 3

    def test_stream_continues_across_resets(self):
        from minigrid_tpu.compat.exact import CompatEnv

        ce = CompatEnv("MiniGrid-DoorKey-8x8-v0", seed=1337)
        a = ce.reset()
        b = ce.reset()
        # Consecutive resets draw different layouts from one MT19937 stream.
        assert not np.array_equal(a["grid"], b["grid"])


class TestMissions:
    def test_detokenize_known_templates(self):
        from minigrid_tpu.envs import missions

        env = minigrid_tpu.make("MiniGrid-Fetch-8x8-N3-v0")
        state, obs = env.reset(jax.random.PRNGKey(11))
        m = missions.detokenize(np.asarray(state.mission))
        assert any(
            m == t % "green ball"
            for t in ("get a %s", "go get a %s", "fetch a %s", "go fetch a %s",
                      "you must fetch a %s")
        ) or ("ball" in m or "key" in m)

    def test_putnear_mission_slots(self):
        from minigrid_tpu.envs import missions

        env = minigrid_tpu.make("MiniGrid-PutNear-8x8-N3-v0")
        state, _ = env.reset(jax.random.PRNGKey(11))
        m = missions.detokenize(np.asarray(state.mission))
        assert m.startswith("put the ") and " near the " in m
