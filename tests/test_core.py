"""Kernel-vs-oracle equivalence tests for the core world model."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from minigrid_tpu.core import constants as C
from minigrid_tpu.core import grid as G
from minigrid_tpu.core.obs import gen_obs_image
from minigrid_tpu.core.state import EnvConfig, EnvState, empty_state
from minigrid_tpu.core.step import base_step
from minigrid_tpu.core.vision import process_vis

import oracle


def random_world(rng: np.random.Generator, w=9, h=9):
    """A random but well-formed world: walled border, random interior objects,
    agent on a free cell, random carrying."""
    grid = np.zeros((h, w, 5), dtype=np.uint8)
    grid[:, :, 0] = C.EMPTY
    grid[0, :, :] = 0
    grid[0, :, 0] = C.WALL
    grid[-1, :, 0] = C.WALL
    grid[:, 0, 0] = C.WALL
    grid[:, -1, 0] = C.WALL
    grid[0, :, 1] = grid[-1, :, 1] = grid[:, 0, 1] = grid[:, -1, 1] = C.GREY

    types = [C.EMPTY, C.EMPTY, C.EMPTY, C.WALL, C.FLOOR, C.DOOR, C.KEY,
             C.BALL, C.BOX, C.GOAL, C.LAVA]
    for y in range(1, h - 1):
        for x in range(1, w - 1):
            t = types[rng.integers(len(types))]
            color = rng.integers(6)
            state = rng.integers(3) if t == C.DOOR else 0
            ct = [0, C.KEY, C.BALL][rng.integers(3)] if t == C.BOX else 0
            cc = rng.integers(6) if ct else 0
            grid[y, x] = [t, color, state, ct, cc]

    free = np.argwhere(grid[:, :, 0] == C.EMPTY)
    assert len(free), "degenerate random world"
    ay, ax = free[rng.integers(len(free))]
    agent_dir = int(rng.integers(4))
    if rng.random() < 0.5:
        carrying = np.zeros(4, dtype=np.uint8)
    else:
        ct = [C.KEY, C.BALL, C.BOX][rng.integers(3)]
        carrying = np.array([ct, rng.integers(6), 0, 0], dtype=np.uint8)
    return grid, np.array([ax, ay]), agent_dir, carrying


def to_state(grid, agent_pos, agent_dir, carrying, step_count=0):
    return EnvState(
        grid=jnp.asarray(grid),
        agent_pos=jnp.asarray(agent_pos, dtype=jnp.int32),
        agent_dir=jnp.asarray(agent_dir, dtype=jnp.int32),
        carrying=jnp.asarray(carrying, dtype=jnp.uint8),
        step_count=jnp.asarray(step_count, dtype=jnp.int32),
        rng=jax.random.PRNGKey(0),
        mission=jnp.zeros(8, dtype=jnp.int32),
        aux=jnp.zeros(24, dtype=jnp.int32),
    )


CFG = EnvConfig(family="test", width=9, height=9, max_steps=100)

# Compile each kernel exactly once for the whole module — recompilation, not
# execution, dominates test wall-clock on the CPU backend.
import functools


@functools.lru_cache(maxsize=None)
def jit_step(cfg):
    return jax.jit(lambda s, a: base_step(s, a, cfg))


@functools.lru_cache(maxsize=None)
def jit_obs(cfg):
    return jax.jit(lambda s: gen_obs_image(s, cfg))


class TestVision:
    def test_matches_oracle_random_views(self):
        rng = np.random.default_rng(0)
        kernel = jax.jit(process_vis)
        for trial in range(200):
            view = np.zeros((7, 7, 5), dtype=np.uint8)
            view[:, :, 0] = C.EMPTY
            # Sprinkle occluders: walls and doors in all states.
            n = rng.integers(0, 25)
            for _ in range(n):
                y, x = rng.integers(7), rng.integers(7)
                t = [C.WALL, C.DOOR, C.LAVA, C.BALL][rng.integers(4)]
                view[y, x, 0] = t
                view[y, x, 2] = rng.integers(3) if t == C.DOOR else 0
            got = np.asarray(kernel(jnp.asarray(view)))
            want = oracle.process_vis_oracle(view)
            np.testing.assert_array_equal(got, want, err_msg=f"trial {trial}")

    def test_empty_view_fully_visible(self):
        view = np.zeros((7, 7, 5), dtype=np.uint8)
        view[:, :, 0] = C.EMPTY
        assert np.asarray(process_vis(jnp.asarray(view))).all()

    def test_wall_row_blocks(self):
        view = np.zeros((7, 7, 5), dtype=np.uint8)
        view[:, :, 0] = C.EMPTY
        view[3, :, 0] = C.WALL  # full wall row between agent and top
        mask = np.asarray(process_vis(jnp.asarray(view)))
        assert mask[3].all()  # the wall itself is visible
        assert not mask[:3].any()  # nothing behind it


class TestStep:
    @pytest.mark.parametrize("seed", range(4))
    def test_fuzz_matches_oracle(self, seed):
        rng = np.random.default_rng(seed)
        kernel = jit_step(CFG)
        grid, pos, d, carry = random_world(rng)
        step_count = 0
        for t in range(120):
            action = int(rng.integers(7))
            state = to_state(grid, pos, d, carry, step_count)
            res = kernel(state, jnp.int32(action))
            (grid, pos, d, carry, step_count, reward, term, trunc) = oracle.step_oracle(
                grid, pos, d, carry, step_count, action, CFG.max_steps
            )
            np.testing.assert_array_equal(np.asarray(res.state.grid), grid)
            np.testing.assert_array_equal(np.asarray(res.state.agent_pos), pos)
            assert int(res.state.agent_dir) == d
            np.testing.assert_array_equal(np.asarray(res.state.carrying), carry)
            assert int(res.state.step_count) == step_count
            assert float(res.reward) == pytest.approx(reward, abs=1e-6)
            assert bool(res.terminated) == term
            assert bool(res.truncated) == trunc
            if term or trunc:
                break

    def test_vmap_equals_loop(self):
        rng = np.random.default_rng(42)
        states, actions = [], []
        for _ in range(16):
            g, p, d, c = random_world(rng)
            states.append(to_state(g, p, d, c))
            actions.append(rng.integers(7))
        batch = jax.tree.map(lambda *xs: jnp.stack(xs), *states)
        acts = jnp.asarray(actions, dtype=jnp.int32)
        vres = jax.jit(jax.vmap(lambda s, a: base_step(s, a, CFG)))(batch, acts)
        for i, (s, a) in enumerate(zip(states, actions)):
            r = base_step(s, jnp.int32(a), CFG)
            np.testing.assert_array_equal(
                np.asarray(vres.state.grid[i]), np.asarray(r.state.grid)
            )
            np.testing.assert_array_equal(
                np.asarray(vres.state.agent_pos[i]), np.asarray(r.state.agent_pos)
            )
            assert float(vres.reward[i]) == float(r.reward)


class TestObs:
    @pytest.mark.parametrize("seed", range(2))
    def test_matches_oracle(self, seed):
        rng = np.random.default_rng(100 + seed)
        for stw in (False, True):
            cfg = EnvConfig(
                family="test", width=9, height=9, max_steps=100,
                see_through_walls=stw,
            )
            kernel = jit_obs(cfg)
            for _ in range(20):
                grid, pos, d, carry = random_world(rng)
                state = to_state(grid, pos, d, carry)
                got = np.asarray(kernel(state))
                want = oracle.gen_obs_oracle(grid, pos, d, carry, 7, stw)
                np.testing.assert_array_equal(got, want)

    def test_view_sizes(self):
        rng = np.random.default_rng(7)
        for v in (3, 5, 7, 9):
            cfg = EnvConfig(family="test", width=11, height=11, max_steps=10,
                            agent_view_size=v)
            grid, pos, d, carry = random_world(rng, 11, 11)
            state = to_state(grid, pos, d, carry)
            got = np.asarray(gen_obs_image(state, cfg))
            want = oracle.gen_obs_oracle(grid, pos, d, carry, v, False)
            np.testing.assert_array_equal(got, want)


class TestGridOps:
    def test_encode_decode_roundtrip(self):
        rng = np.random.default_rng(3)
        grid, *_ = random_world(rng)
        enc = np.asarray(G.encode(jnp.asarray(grid)))
        dec, vis = G.decode(enc)
        assert vis.all()
        np.testing.assert_array_equal(np.asarray(dec)[:, :, :3], grid[:, :, :3])

    def test_rotate_left_matches_rot90(self):
        rng = np.random.default_rng(4)
        grid, *_ = random_world(rng)
        np.testing.assert_array_equal(
            np.asarray(G.rotate_left(jnp.asarray(grid))), np.rot90(grid, 1, (0, 1))
        )
