"""Organic success-path tests for the locked-door families (VERDICT r3 #9).

Random walks cannot unlock doors within bounded steps, so the packed-engine
equivalence tests for Unlock / UnlockPickup / BlockedUnlockPickup /
KeyCorridor / ObstructedMaze doctor their reset states to within one action
of success. These tests complement them with GENUINE solves: a host-side
BFS planner reads a golden fixture's known layout and scripts the actual
solution (walk to the key, pick it up, open doors en route, unlock the
target door, move the blocking ball aside, pick up the target), then the
script drives

  1. the vmap transition (source of truth) — asserting the episode really
     terminates with the success reward at the final action and never
     earlier, and
  2. the packed Pallas kernel and its XLA twin (via the builders'
     `actions_override`) — asserting every lane of a broadcast batch earns
     that reward through the hook (`ops/packed_hooks.py`) in-kernel.

Planner semantics mirror `core/step.py`: passable = empty/floor/goal/open
door; closed unlocked doors are toggled open en route; a locked door opens
iff the matching key is carried (the scripts always fetch it first).
"""

from collections import deque

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import minigrid_tpu
from minigrid_tpu.compat.exact import CompatEnv, state_to_device
from minigrid_tpu.core import constants as C
from minigrid_tpu.ops.fused_rollout import (
    build_fused_rollout,
    build_packed_xla_rollout,
)

LEFT, RIGHT, FWD, PICKUP, DROP, TOGGLE = 0, 1, 2, 3, 4, 5
DIRS = ((1, 0), (0, 1), (-1, 0), (0, -1))
B = 128  # kernel lane-block minimum


def _passable(grid, x, y):
    t, s = int(grid[y, x, 0]), int(grid[y, x, 2])
    return t in (C.EMPTY, C.FLOOR, C.GOAL) or (
        t == C.DOOR and s == C.STATE_OPEN
    )


def _bfs_face(grid, pos, d, target):
    """Shortest {left,right,forward} action list from pose `(pos, d)` to any
    pose FACING world cell `target`, or None if unreachable. Returns
    `(actions, end_pos, end_dir)`."""
    h, w = grid.shape[:2]
    start = (int(pos[0]), int(pos[1]), int(d))
    prev = {start: None}
    q = deque([start])
    while q:
        st = q.popleft()
        x, y, dd = st
        if (x + DIRS[dd][0], y + DIRS[dd][1]) == (target[0], target[1]):
            acts = []
            cur = st
            while prev[cur] is not None:
                cur, a = prev[cur]
                acts.append(a)
            return list(reversed(acts)), (x, y), dd
        for a, ns in (
            (LEFT, (x, y, (dd + 3) % 4)),
            (RIGHT, (x, y, (dd + 1) % 4)),
        ):
            if ns not in prev:
                prev[ns] = (st, a)
                q.append(ns)
        fx, fy = x + DIRS[dd][0], y + DIRS[dd][1]
        if 0 <= fx < w and 0 <= fy < h and _passable(grid, fx, fy):
            ns = (fx, fy, dd)
            if ns not in prev:
                prev[ns] = (st, FWD)
                q.append(ns)
    return None


class Planner:
    """Stateful script builder over a host copy of the layout grid."""

    def __init__(self, layout):
        self.grid = np.asarray(layout["grid"]).copy()
        self.pos = (int(layout["agent_pos"][0]), int(layout["agent_pos"][1]))
        self.dir = int(layout["agent_dir"])
        self.actions = []
        self.carrying = None

    def find(self, t, c=None, s=None):
        m = self.grid[:, :, 0] == t
        if c is not None:
            m &= self.grid[:, :, 1] == c
        if s is not None:
            m &= self.grid[:, :, 2] == s
        ys, xs = np.where(m)
        assert len(xs) == 1, f"expected one match for type {t}, got {len(xs)}"
        return (int(xs[0]), int(ys[0]))

    def _reach_face(self, target):
        """Route to face `target`, toggling closed unlocked doors open en
        route when the direct path is door-blocked."""
        for _ in range(16):
            r = _bfs_face(self.grid, self.pos, self.dir, target)
            if r is not None:
                acts, self.pos, self.dir = r
                self.actions += acts
                return
            closed = np.argwhere(
                (self.grid[:, :, 0] == C.DOOR)
                & (self.grid[:, :, 2] == C.STATE_CLOSED)
            )
            for y, x in closed:
                r = _bfs_face(self.grid, self.pos, self.dir, (int(x), int(y)))
                if r is not None:
                    acts, self.pos, self.dir = r
                    self.actions += acts + [TOGGLE]
                    self.grid[y, x, 2] = C.STATE_OPEN
                    break
            else:
                raise AssertionError(f"no route to {target}")
        raise AssertionError("door-opening loop did not converge")

    def face_and(self, target, act):
        self._reach_face(target)
        self.actions.append(act)
        x, y = target
        if act == PICKUP:
            self.carrying = (int(self.grid[y, x, 0]), int(self.grid[y, x, 1]))
            self.grid[y, x] = (C.EMPTY, 0, 0, 0, 0)
        elif act == TOGGLE and self.grid[y, x, 0] == C.DOOR:
            # Locked doors open too: the scripts fetch the matching key
            # first (core/step.py door-toggle semantics).
            self.grid[y, x, 2] = C.STATE_OPEN
        elif act == DROP:
            self.grid[y, x] = (*self.carrying, 0, 0, 0)
            self.carrying = None

    def drop_cell(self, futures):
        """A reachable free cell whose occupation leaves every cell in
        `futures` still reachable (doors count as traversable for the
        feasibility check — the scripts open them as needed)."""

        def cell_reachable(grid, start, target):
            h, w = grid.shape[:2]
            seen = {start}
            q = deque([start])
            while q:
                x, y = q.popleft()
                if (x, y) == target:
                    return True
                for dx, dy in DIRS:
                    nx, ny = x + dx, y + dy
                    if not (0 <= nx < w and 0 <= ny < h) or (nx, ny) in seen:
                        continue
                    t = int(grid[ny, nx, 0])
                    if (
                        t in (C.EMPTY, C.FLOOR, C.GOAL, C.DOOR)
                        or (nx, ny) == target
                    ):
                        seen.add((nx, ny))
                        q.append((nx, ny))
            return False

        h, w = self.grid.shape[:2]
        for y in range(h):
            for x in range(w):
                if self.grid[y, x, 0] != C.EMPTY or (x, y) == self.pos:
                    continue
                if not _bfs_face(self.grid, self.pos, self.dir, (x, y)):
                    continue
                trial = self.grid.copy()
                trial[y, x, 0] = C.BALL  # any non-passable occupant
                if all(
                    cell_reachable(trial, self.pos, f) for f in futures
                ):
                    return (x, y)
        raise AssertionError("no safe drop cell")


def plan_solution(env_id, layout):
    """Hand-planned reference-semantics solve for one locked-door family."""
    env = minigrid_tpu.make(env_id)
    p = Planner(layout)
    aux = np.asarray(layout["aux"])
    fam = env.config.family
    if fam == "unlock":
        p.face_and(p.find(C.KEY), PICKUP)
        p.face_and((int(aux[0]), int(aux[1])), TOGGLE)  # success: door opens
        return p.actions
    # unlockpickup (plain + blocked) / keycorridor / obstructedmaze:
    # success = pickup of the aux (type, color) target.
    target = None  # located lazily — grid may still hold the blocking ball
    if "blocked" in env.config.extras:
        p.face_and(p.find(C.BALL), PICKUP)  # the door-blocking ball
        key_xy = p.find(C.KEY)
        door_xy = p.find(C.DOOR, s=C.STATE_LOCKED)
        target = p.find(int(aux[0]), int(aux[1]))
        p.face_and(p.drop_cell([key_xy, door_xy, target]), DROP)
    p.face_and(p.find(C.KEY), PICKUP)
    p.face_and(p.find(C.DOOR, s=C.STATE_LOCKED), TOGGLE)
    # Hands must be free for the target pickup — shed the key safely.
    target = target or p.find(int(aux[0]), int(aux[1]))
    p.face_and(p.drop_cell([target]), DROP)
    p.face_and(target, PICKUP)  # success
    return p.actions


CASES = [
    ("MiniGrid-Unlock-v0", 17),
    ("MiniGrid-UnlockPickup-v0", 59),
    ("MiniGrid-BlockedUnlockPickup-v0", 61),
    ("MiniGrid-KeyCorridorS3R1-v0", 122),
    ("MiniGrid-ObstructedMaze-1Dl-v0", 130),
]


@pytest.mark.parametrize("env_id,seed", CASES)
def test_scripted_solve(env_id, seed):
    env = minigrid_tpu.make(env_id)
    layout = CompatEnv(env_id, seed=seed).reset()
    actions = plan_solution(env_id, layout)
    assert 0 < len(actions) < env.config.max_steps

    # 1. vmap transition (source of truth): terminates with the success
    # reward exactly at the final scripted action, never earlier.
    state = state_to_device(layout, env.config)
    step = jax.jit(env.step)
    for t, a in enumerate(actions):
        state, obs, r, te, tr = step(state, jnp.int32(a))
        if t < len(actions) - 1:
            assert not bool(te) and not bool(tr), f"{env_id}: early end at {t}"
        else:
            assert bool(te), f"{env_id}: scripted solve did not terminate"
            r_final = float(r)
            assert r_final > 0, f"{env_id}: no success reward"

    # 2. The same script through the packed engines (a broadcast batch):
    # every lane must earn the success reward via the family hook.
    states1 = state_to_device(layout, env.config)
    states = jax.tree.map(
        lambda x: jnp.broadcast_to(x[None], (B,) + x.shape), states1
    )
    states = states.replace(rng=jax.random.split(jax.random.PRNGKey(0), B))
    script = np.asarray(actions, np.int32)
    key = jax.random.PRNGKey(1)
    for build, kw in (
        (build_packed_xla_rollout, {}),
        (build_fused_rollout, {"interpret": True, "step_chunk": 16}),
    ):
        rollout = jax.jit(
            build(
                env, len(actions), mode="cached", actions_override=script, **kw
            )
        )
        _, m = rollout(key, states)
        assert int(m.episodes) == B, (env_id, build.__name__)
        np.testing.assert_allclose(
            float(m.total_reward), B * r_final, rtol=1e-5
        )
