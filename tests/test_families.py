"""Behavioral tests for env-family step hooks and generator invariants."""

import functools
from collections import deque

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import minigrid_tpu
from minigrid_tpu.core import constants as C


@functools.lru_cache(maxsize=None)
def get_env(env_id):
    return minigrid_tpu.make(env_id)


@functools.lru_cache(maxsize=None)
def jit_step(env_id):
    return jax.jit(get_env(env_id).step)


def reachable(grid, start, passable_fn):
    """Host-side BFS over 4-connected cells satisfying `passable_fn(cell)`."""
    h, w = grid.shape[:2]
    seen = {tuple(start)}
    q = deque([tuple(start)])
    while q:
        x, y = q.popleft()
        for dx, dy in ((1, 0), (-1, 0), (0, 1), (0, -1)):
            nx, ny = x + dx, y + dy
            if 0 <= nx < w and 0 <= ny < h and (nx, ny) not in seen:
                if passable_fn(grid[ny, nx]):
                    seen.add((nx, ny))
                    q.append((nx, ny))
    return seen


def safe_passable(cell):
    """Walkable without dying: empty/floor/goal/door (door can be opened)."""
    return int(cell[0]) in (C.EMPTY, C.FLOOR, C.GOAL, C.DOOR)


class TestCrossing:
    @pytest.mark.parametrize(
        "env_id",
        ["MiniGrid-LavaCrossingS9N1-v0", "MiniGrid-LavaCrossingS9N3-v0",
         "MiniGrid-SimpleCrossingS11N5-v0"],
    )
    def test_goal_always_safely_reachable(self, env_id):
        env = get_env(env_id)
        reset = jax.jit(env.reset)
        for seed in range(12):
            state, _ = reset(jax.random.PRNGKey(seed))
            g = np.asarray(state.grid)
            goal = tuple(np.argwhere(g[:, :, 0] == C.GOAL)[0][::-1])
            seen = reachable(g, np.asarray(state.agent_pos), safe_passable)
            assert goal in seen, f"seed {seed}: goal unreachable without lava"

    def test_num_rivers(self):
        env = get_env("MiniGrid-LavaCrossingS9N3-v0")
        state, _ = env.reset(jax.random.PRNGKey(0))
        g = np.asarray(state.grid)
        # Each river contributes size-2 cells minus openings; count full
        # rows/cols of lava: a river line has ≥ size-3 lava cells.
        lava = g[:, :, 0] == C.LAVA
        lines = sum(lava[y, 1:-1].sum() >= 6 for y in range(9))
        lines += sum(lava[1:-1, x].sum() >= 6 for x in range(9))
        assert lines == 3


class TestDoorKey:
    def test_layout_and_unlock(self):
        env = get_env("MiniGrid-DoorKey-8x8-v0")
        state, _ = env.reset(jax.random.PRNGKey(5))
        g = np.asarray(state.grid)
        doors = np.argwhere(g[:, :, 0] == C.DOOR)
        keys = np.argwhere(g[:, :, 0] == C.KEY)
        assert len(doors) == 1 and len(keys) == 1
        dy, dx = doors[0]
        assert g[dy, dx, 1] == C.YELLOW and g[dy, dx, 2] == C.STATE_LOCKED
        ky, kx = keys[0]
        assert kx < dx and int(np.asarray(state.agent_pos)[0]) < dx

        # Teleport agent left of the door carrying the yellow key; toggle.
        s = state.replace(
            agent_pos=jnp.asarray([dx - 1, dy], jnp.int32),
            agent_dir=jnp.int32(0),
            carrying=jnp.asarray([C.KEY, C.YELLOW, 0, 0], jnp.uint8),
        )
        s2, _, r, te, tr = env.step(s, jnp.int32(5))
        assert int(s2.grid[dy, dx, 2]) == C.STATE_OPEN

        # Without the key the door stays locked.
        s3 = s.replace(carrying=jnp.zeros(4, jnp.uint8))
        s4, _, _, _, _ = env.step(s3, jnp.int32(5))
        assert int(s4.grid[dy, dx, 2]) == C.STATE_LOCKED


class TestDynamicObstacles:
    def test_obstacles_move_and_persist(self):
        env = get_env("MiniGrid-Dynamic-Obstacles-8x8-v0")
        state, _ = env.reset(jax.random.PRNGKey(0))
        step = jit_step("MiniGrid-Dynamic-Obstacles-8x8-v0")
        n = env.config.n_obstacles
        moved = False
        prev = np.asarray(state.aux[: 2 * n]).copy()
        for t in range(10):
            state, _, r, te, tr = step(state, jnp.int32(0))
            g = np.asarray(state.grid)
            assert (g[:, :, 0] == C.BALL).sum() == n
            aux = np.asarray(state.aux[: 2 * n])
            # aux positions agree with grid balls
            for i in range(n):
                assert g[aux[2 * i + 1], aux[2 * i], 0] == C.BALL
            moved = moved or (aux != prev).any()
            prev = aux.copy()
            if te or tr:
                break
        assert moved, "obstacles never moved in 10 steps"

    def test_collision_penalty(self):
        env = get_env("MiniGrid-Dynamic-Obstacles-8x8-v0")
        state, _ = env.reset(jax.random.PRNGKey(0))
        # Face the border wall (agent at (1,1): dir=3 is up toward the wall).
        s = state.replace(agent_dir=jnp.int32(3))
        s2, _, r, te, tr = env.step(s, jnp.int32(2))
        assert float(r) == -1.0 and bool(te)

    def test_invalid_action_remapped(self):
        env = get_env("MiniGrid-Dynamic-Obstacles-8x8-v0")
        state, _ = env.reset(jax.random.PRNGKey(1))
        s2, _, r, te, tr = env.step(state, jnp.int32(6))  # out of Discrete(3)
        # Remapped to action 0 (turn left): direction changed, no penalty.
        assert int(s2.agent_dir) == (int(state.agent_dir) - 1) % 4
        assert float(r) == 0.0


class TestMemory:
    @pytest.mark.parametrize("env_id", ["MiniGrid-MemoryS13-v0", "MiniGrid-MemoryS9-v0"])
    def test_success_and_failure(self, env_id):
        env = get_env(env_id)
        for seed in (0, 1, 2):
            state, _ = env.reset(jax.random.PRNGKey(seed))
            aux = np.asarray(state.aux)
            sx, sy, fx, fy = aux[:4]
            # The success cell neighbors the cue-matching object.
            g = np.asarray(state.grid)
            cue = g[g.shape[0] // 2 - 1, 1, 0]
            neighbors = [g[sy - 1, sx, 0], g[sy + 1, sx, 0]]
            assert cue in neighbors
            # Step onto the success cell (teleport adjacent, face it, forward).
            s = state.replace(
                agent_pos=jnp.asarray([sx, sy + 1], jnp.int32)
                if g[sy + 1, sx, 0] == C.EMPTY
                else jnp.asarray([sx, sy - 1], jnp.int32),
                agent_dir=jnp.int32(3)
                if g[sy + 1, sx, 0] == C.EMPTY
                else jnp.int32(1),
            )
            s2, _, r, te, tr = env.step(s, jnp.int32(2))
            assert bool(te) and float(r) > 0, f"seed {seed} success failed"
            # Failure cell → done with 0.
            s = state.replace(
                agent_pos=jnp.asarray([fx, fy + 1], jnp.int32)
                if g[fy + 1, fx, 0] == C.EMPTY
                else jnp.asarray([fx, fy - 1], jnp.int32),
                agent_dir=jnp.int32(3)
                if g[fy + 1, fx, 0] == C.EMPTY
                else jnp.int32(1),
            )
            s2, _, r, te, tr = env.step(s, jnp.int32(2))
            assert bool(te) and float(r) == 0.0, f"seed {seed} failure failed"


class TestRedBlueDoors:
    def _face_door(self, state, x, y):
        """Stand inside the room adjacent to the door, facing it."""
        size = 6
        inside_x = x + 1 if x == size // 2 else x - 1
        return state.replace(
            agent_pos=jnp.asarray([inside_x, y], jnp.int32),
            agent_dir=jnp.int32(2 if x == size // 2 else 0),
        )

    def test_red_then_blue_rewards(self):
        env = get_env("MiniGrid-RedBlueDoors-6x6-v0")
        state, _ = env.reset(jax.random.PRNGKey(0))
        aux = np.asarray(state.aux)
        rx, ry, bx, by = aux[:4]
        s = self._face_door(state, rx, ry)
        s, _, r, te, _ = env.step(s, jnp.int32(5))  # open red
        assert not bool(te) and float(r) == 0.0
        assert int(s.grid[ry, rx, 2]) == C.STATE_OPEN
        s = self._face_door(s, bx, by)
        s, _, r, te, _ = env.step(s, jnp.int32(5))  # open blue
        assert bool(te) and float(r) > 0.0

    def test_blue_first_fails(self):
        env = get_env("MiniGrid-RedBlueDoors-6x6-v0")
        state, _ = env.reset(jax.random.PRNGKey(0))
        aux = np.asarray(state.aux)
        bx, by = aux[2], aux[3]
        s = self._face_door(state, bx, by)
        s, _, r, te, _ = env.step(s, jnp.int32(5))
        assert bool(te) and float(r) == 0.0


class TestLavaGapAndDistShift:
    def test_lavagap_wall_has_one_gap(self):
        env = get_env("MiniGrid-LavaGapS7-v0")
        for seed in range(8):
            state, _ = env.reset(jax.random.PRNGKey(seed))
            g = np.asarray(state.grid)
            goal = tuple(np.argwhere(g[:, :, 0] == C.GOAL)[0][::-1])
            seen = reachable(g, np.asarray(state.agent_pos), safe_passable)
            assert goal in seen

    def test_distshift_deterministic(self):
        env = get_env("MiniGrid-DistShift1-v0")
        s1, _ = env.reset(jax.random.PRNGKey(0))
        s2, _ = env.reset(jax.random.PRNGKey(999))
        np.testing.assert_array_equal(np.asarray(s1.grid), np.asarray(s2.grid))
        g = np.asarray(s1.grid)
        assert (g[1, 3:6, 0] == C.LAVA).all()
        assert (g[2, 3:6, 0] == C.LAVA).all()


class TestFourRooms:
    def test_connectivity_and_gaps(self):
        env = get_env("MiniGrid-FourRooms-v0")
        reset = jax.jit(env.reset)
        for seed in range(8):
            state, _ = reset(jax.random.PRNGKey(seed))
            g = np.asarray(state.grid)
            goal = tuple(np.argwhere(g[:, :, 0] == C.GOAL)[0][::-1])
            seen = reachable(g, np.asarray(state.agent_pos), safe_passable)
            assert goal in seen, f"seed {seed}"
