"""View-coordinate transforms + class-based compat wrappers.

Covers the reference members `get_view_exts` / `get_view_coords` /
`relative_coords` / `in_view` / `agent_sees` (minigrid.py:~972-1085) and the
drop-in gymnasium wrapper classes (wrappers.py:~108-345).
"""

import jax
import jax.numpy as jnp
import numpy as np

import minigrid_tpu
from minigrid_tpu.core import constants as C
from minigrid_tpu.core import view
from minigrid_tpu.core.state import CH_TYPE


def _state(env_id="MiniGrid-Empty-8x8-v0", seed=0):
    env = minigrid_tpu.make(env_id)
    state, _ = env.reset(jax.random.PRNGKey(seed))
    return env, state


def oracle_view_exts(agent_pos, agent_dir, v):
    """The reference's literal 4-way branch (minigrid.py:~1030-1060)."""
    ax, ay = agent_pos
    if agent_dir == 0:
        top_x, top_y = ax, ay - v // 2
    elif agent_dir == 1:
        top_x, top_y = ax - v // 2, ay
    elif agent_dir == 2:
        top_x, top_y = ax - v + 1, ay - v // 2
    else:
        top_x, top_y = ax - v // 2, ay - v + 1
    return top_x, top_y, top_x + v, top_y + v


def test_view_exts_matches_reference_branches():
    v = 7
    for d in range(4):
        pos = jnp.asarray([4, 3], jnp.int32)
        got = tuple(int(e) for e in view.get_view_exts(pos, jnp.int32(d), v))
        assert got == oracle_view_exts((4, 3), d, v)


def test_view_coords_roundtrip_affine():
    """Every view cell's world position maps back to the same view coords."""
    v = 7
    for d in range(4):
        dvec = np.array(C.DIR_TO_VEC)[d]
        rvec = np.array([-dvec[1], dvec[0]])
        apos = np.array([10, 12])
        for vy in range(v):
            for vx in range(v):
                world = apos + dvec * (v - 1 - vy) + rvec * (vx - v // 2)
                gx, gy = view.get_view_coords(
                    jnp.asarray(apos, jnp.int32), jnp.int32(d), v, world[0], world[1]
                )
                assert (int(gx), int(gy)) == (vx, vy)


def test_in_view_window():
    v = 7
    pos = jnp.asarray([10, 10], jnp.int32)
    # Facing right: window is x in [10, 16], y in [7, 13].
    assert bool(view.in_view(pos, jnp.int32(0), v, 10, 10))
    assert bool(view.in_view(pos, jnp.int32(0), v, 16, 13))
    assert not bool(view.in_view(pos, jnp.int32(0), v, 9, 10))
    assert not bool(view.in_view(pos, jnp.int32(0), v, 10, 14))


def test_agent_sees_occlusion():
    # DoorKey has see_through_walls=False, so occlusion masking is active.
    env, state = _state("MiniGrid-DoorKey-8x8-v0")
    assert not env.config.see_through_walls
    # Plant a wall directly in front of the agent; the cell beyond it must
    # not be seen although it is inside the view window.
    d = int(state.agent_dir)
    f = np.array(C.DIR_TO_VEC)[d]
    pos = np.asarray(state.agent_pos)
    wall_at = pos + f
    behind = pos + 2 * f
    h, w = env.config.height, env.config.width
    inside = lambda p: 0 < p[0] < w - 1 and 0 < p[1] < h - 1
    if not (inside(wall_at) and inside(behind)):
        # Re-roll deterministically until the geometry fits.
        for s in range(1, 50):
            env, state = _state("MiniGrid-DoorKey-8x8-v0", seed=s)
            d = int(state.agent_dir)
            f = np.array(C.DIR_TO_VEC)[d]
            pos = np.asarray(state.agent_pos)
            wall_at, behind = pos + f, pos + 2 * f
            if inside(wall_at) and inside(behind):
                break
    grid = state.grid.at[wall_at[1], wall_at[0], CH_TYPE].set(C.WALL)
    state = state.replace(grid=grid)
    assert bool(view.agent_sees(state, env.config, wall_at[0], wall_at[1]))
    assert not bool(view.agent_sees(state, env.config, behind[0], behind[1]))


def test_adapter_pose_properties():
    from minigrid_tpu.compat import gym_make

    env = gym_make("MiniGrid-Empty-8x8-v0")
    env.reset(seed=3)
    d = env.agent_dir
    assert tuple(env.dir_vec) == tuple(C.DIR_TO_VEC[d])
    assert tuple(env.front_pos) == tuple(
        np.asarray(env.agent_pos) + np.array(C.DIR_TO_VEC)[d]
    )
    np.testing.assert_array_equal(
        np.array([-env.dir_vec[1], env.dir_vec[0]]), env.right_vec
    )
    tx, ty, bx, by = env.get_view_exts()
    assert (bx - tx, by - ty) == (7, 7)
    # The agent's own cell is always in view at (v//2, v-1).
    ax, ay = env.agent_pos
    assert env.relative_coords(ax, ay) == (3, 6)
    assert env.in_view(ax, ay)
    assert env.carrying is None


def test_class_wrappers():
    from minigrid_tpu.compat import (
        FullyObsWrapper,
        ImgObsWrapper,
        OneHotPartialObsWrapper,
        RGBImgObsWrapper,
        RGBImgPartialObsWrapper,
        ViewSizeWrapper,
        gym_make,
    )

    base = gym_make("MiniGrid-DoorKey-5x5-v0")

    env = ImgObsWrapper(gym_make("MiniGrid-DoorKey-5x5-v0"))
    obs, _ = env.reset(seed=1)
    assert obs.shape == (7, 7, 3) and obs.dtype == np.uint8

    env = OneHotPartialObsWrapper(gym_make("MiniGrid-DoorKey-5x5-v0"))
    obs, _ = env.reset(seed=1)
    assert obs["image"].shape == (7, 7, 20)
    # One-hot inverts back to the raw ids.
    raw, _ = base.reset(seed=1)
    onehot = obs["image"]
    assert np.array_equal(np.argmax(onehot[..., :11], -1), raw["image"][..., 0])
    assert np.array_equal(np.argmax(onehot[..., 11:17], -1), raw["image"][..., 1])
    assert np.array_equal(np.argmax(onehot[..., 17:], -1), raw["image"][..., 2])

    env = RGBImgObsWrapper(gym_make("MiniGrid-DoorKey-5x5-v0"), tile_size=8)
    obs, _ = env.reset(seed=1)
    assert obs["image"].shape == (40, 40, 3)

    env = RGBImgPartialObsWrapper(gym_make("MiniGrid-DoorKey-5x5-v0"), tile_size=8)
    obs, _ = env.reset(seed=1)
    assert obs["image"].shape == (56, 56, 3)

    env = FullyObsWrapper(gym_make("MiniGrid-DoorKey-5x5-v0"))
    obs, _ = env.reset(seed=1)
    assert obs["image"].shape == (5, 5, 3)
    x, y = env.unwrapped.agent_pos
    assert tuple(obs["image"][x, y]) == (C.AGENT, C.RED, env.unwrapped.agent_dir)

    env = ViewSizeWrapper(gym_make("MiniGrid-DoorKey-5x5-v0"), agent_view_size=5)
    obs, _ = env.reset(seed=1)
    assert obs["image"].shape == (5, 5, 3)
    assert env.observation_space["image"].shape == (5, 5, 3)
