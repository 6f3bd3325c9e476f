"""Per-family post-step hooks for the packed-lane rollout engines.

Ten env families override the base transition with a small *post-hook* over
`core.step.base_step` (reward-on-event, extra termination conditions —
mirroring the reference's `step` overrides, e.g. fetch.py:~70-95,
unlock.py:~40-55, redbluedoors.py:~45-70). This module re-expresses each
hook on the packed `(H·W, B)` / `(NUM_REGS, B)` lane layout so those
families run on the fast engines too, instead of falling back to the vmap
path.

Hooks are keyed by the *identity* of the family's transition function
(`HOOKS[env.transition]`), so an env whose step was wrapped or replaced
never silently picks up the wrong hook. Each hook is pure elementwise math
on `(1, B)` lane vectors (plus, for the door families, an O(H·W) absolute
cell read) — it runs identically inside the Pallas kernel and the XLA scan
twin, and is asserted step-for-step equivalent to the vmap engine in
tests/test_fused_rollout.py.

A hook receives a `HookVals` snapshot of the base transition and returns
the adjusted `(reward, terminated)`; it must implement EXACTLY the math of
the family's `step` in envs/<family>.py (the vmap engine is the source of
truth the equivalence tests compare against).
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax.numpy as jnp
from jax import lax

from minigrid_tpu.core import constants as C
from minigrid_tpu.core import prng
from minigrid_tpu.core.state import Actions, EnvConfig
from minigrid_tpu.envs import dynamicobstacles as _dynobst
from minigrid_tpu.envs import fetch as _fetch
from minigrid_tpu.envs import gotodoor as _gotodoor
from minigrid_tpu.envs import gotoobject as _gotoobject
from minigrid_tpu.envs import memory as _memory
from minigrid_tpu.envs import putnear as _putnear
from minigrid_tpu.envs import redbluedoors as _redbluedoors
from minigrid_tpu.envs import unlock as _unlock
from minigrid_tpu.envs import unlockpickup as _unlockpickup


class HookVals(NamedTuple):
    """Lane-vector snapshot of one packed base transition.

    All fields are `(1, B)` unless noted. `read_pre`/`read_post` read the
    packed word of an absolute world cell `(x_row, y_row)` — `(1, B)` lane
    vectors of coordinates — from the grid before / after this step's
    forward-cell write (both in the pre-step agent frame, which is the
    frame the write happened in)."""

    a: jnp.ndarray  # original action (pre any remap)
    x: jnp.ndarray  # pre-step agent pos / carry
    y: jnp.ndarray
    ct: jnp.ndarray
    cc: jnp.ndarray
    x1: jnp.ndarray  # post-step agent pos / carry
    y1: jnp.ndarray
    ct1: jnp.ndarray
    cc1: jnp.ndarray
    fwd_x: jnp.ndarray  # pre-step forward-cell coords
    fwd_y: jnp.ndarray
    reward: jnp.ndarray  # base-step outcomes (f32 / bool)
    terminated: jnp.ndarray
    success: jnp.ndarray  # success_reward(step_count+1) (1, B) f32
    aux: jnp.ndarray  # (AUX_LEN, B) per-env extras
    read_pre: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]
    read_post: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]
    stash: Any = None  # whatever this family's PRE-hook returned (or None)


def _row(aux: jnp.ndarray, i: int) -> jnp.ndarray:
    return aux[i : i + 1, :]


# ---------------------------------------------------------------- families


def _hook_fetch(v: HookVals):
    """envs/fetch.py step: any pickup ends the episode; reward iff the
    carried (type, color) matches the aux target (fetch.py:~70-95)."""
    has = v.ct1 > 0
    match = has & (v.ct1 == _row(v.aux, 0)) & (v.cc1 == _row(v.aux, 1))
    reward = jnp.where(match, v.success, v.reward)
    reward = jnp.where(has & ~match, 0.0, reward)
    return reward, v.terminated | has


def _hook_gotodoor(v: HookVals):
    """envs/gotodoor.py step: `done` while cross-adjacent to the target
    door rewards; `done`/`toggle` terminate (gotodoor.py:~70-85)."""
    tx, ty = _row(v.aux, 0), _row(v.aux, 1)
    near = ((v.x1 == tx) & (jnp.abs(v.y1 - ty) == 1)) | (
        (v.y1 == ty) & (jnp.abs(v.x1 - tx) == 1)
    )
    done_act = v.a == Actions.done
    reward = jnp.where(done_act & near, v.success, v.reward)
    return reward, v.terminated | done_act | (v.a == Actions.toggle)


def _hook_gotoobject(v: HookVals):
    """envs/gotoobject.py step: like GoToDoor with box adjacency."""
    tx, ty = _row(v.aux, 0), _row(v.aux, 1)
    near = (jnp.abs(v.x1 - tx) <= 1) & (jnp.abs(v.y1 - ty) <= 1)
    done_act = v.a == Actions.done
    reward = jnp.where(done_act & near, v.success, v.reward)
    return reward, v.terminated | done_act | (v.a == Actions.toggle)


def _hook_putnear(v: HookVals):
    """envs/putnear.py step: pickup of the wrong object terminates; a drop
    after carrying terminates, rewarded iff it landed box-adjacent to the
    second target (putnear.py:~95-123)."""
    holds = v.ct1 > 0
    wrong = holds & (
        (v.ct1 != _row(v.aux, 0)) | (v.cc1 != _row(v.aux, 1))
    )
    pickup_fail = (v.a == Actions.pickup) & wrong
    dropped = (v.ct > 0) & (v.a == Actions.drop)
    drop_succeeded = dropped & (v.ct1 == 0)
    near = (jnp.abs(v.fwd_x - _row(v.aux, 2)) <= 1) & (
        jnp.abs(v.fwd_y - _row(v.aux, 3)) <= 1
    )
    reward = jnp.where(drop_succeeded & near, v.success, v.reward)
    return reward, v.terminated | pickup_fail | dropped


def _hook_memory(v: HookVals):
    """envs/memory.py step: stepping onto the matching end cell rewards,
    the other fails with 0 (memory.py:~99-113). The pickup→toggle action
    remap is in ACTION_REMAPS."""
    on_success = (v.x1 == _row(v.aux, 0)) & (v.y1 == _row(v.aux, 1))
    on_failure = (v.x1 == _row(v.aux, 2)) & (v.y1 == _row(v.aux, 3))
    reward = jnp.where(on_success, v.success, v.reward)
    reward = jnp.where(on_failure, 0.0, reward)
    return reward, v.terminated | on_success | on_failure


def _hook_unlock(v: HookVals):
    """envs/unlock.py step: a toggle while the target door stands open
    rewards and terminates (reference unlock.py:~40-55)."""
    w = v.read_post(_row(v.aux, 0), _row(v.aux, 1))
    door_open = (
        (v.a == Actions.toggle)
        & ((w & 15) == C.DOOR)
        & (((w >> 8) & 15) == C.STATE_OPEN)
    )
    reward = jnp.where(door_open, v.success, v.reward)
    return reward, v.terminated | door_open


def _hook_redbluedoors(v: HookVals):
    """envs/redbluedoors.py step: open red THEN blue → reward; blue first
    (or red after blue) → fail with 0 (redbluedoors.py:~64-85)."""

    def dopen(w):
        return ((w & 15) == C.DOOR) & (((w >> 8) & 15) == C.STATE_OPEN)

    rx, ry = _row(v.aux, 0), _row(v.aux, 1)
    bx, by = _row(v.aux, 2), _row(v.aux, 3)
    red_before = dopen(v.read_pre(rx, ry))
    blue_before = dopen(v.read_pre(bx, by))
    red_after = dopen(v.read_post(rx, ry))
    blue_after = dopen(v.read_post(bx, by))

    success = blue_after & red_before
    fail_blue_first = blue_after & ~red_before
    fail_red_late = ~blue_after & red_after & blue_before
    reward = jnp.where(success, v.success, v.reward)
    reward = jnp.where(fail_blue_first | fail_red_late, 0.0, reward)
    return reward, v.terminated | success | fail_blue_first | fail_red_late


def _make_pre_dynamicobstacles(cfg: EnvConfig):
    """PRE-step hook for DynamicObstacles on the packed lane layout.

    Mirrors `envs/dynamicobstacles.py step` exactly: (1) record whether the
    agent's front cell is blocked BEFORE the walk (the collision penalty's
    predicate — reference dynamicobstacles.py:~75 computes `not_clear`
    first), (2) sequentially random-walk each obstacle in its 3×3 box using
    the SAME counter-based bits (`core/prng.py`, keyed on the rng register
    rows and `step_count·n + i`) and the SAME candidate selection
    (`select_walk_target`) as the vmap transition — the two engines consume
    bit-identical streams.

    Cell validity is computed from REGISTERS, not the grid: a
    DynamicObstacles grid contains only boundary walls, the fixed goal at
    (w−2, h−2), and the n obstacle balls whose coordinates live in
    `aux[0:2n]`, and the restricted action set {left,right,forward} can
    never add objects — so "free" ≡ interior ∧ not-goal ∧ not-agent ∧
    not-any-obstacle. Only the two cell writes per obstacle touch the
    `(H·W, B)` grid words.
    """
    from minigrid_tpu.ops.fused_rollout import (
        R_AUX,
        R_DIR,
        R_RNG,
        R_SC,
        R_X,
        R_Y,
        _EMPTY_WORD,
    )

    n = cfg.n_obstacles
    w, h = cfg.width, cfg.height
    hw = w * h
    ball_word = C.BALL | (C.BLUE << 4)

    def pre(words: jnp.ndarray, regs: jnp.ndarray):
        iota_hw = lax.broadcasted_iota(jnp.int32, (hw, 1), 0)
        x = regs[R_X : R_X + 1, :]
        y = regs[R_Y : R_Y + 1, :]
        d = regs[R_DIR : R_DIR + 1, :]
        sc = regs[R_SC : R_SC + 1, :]
        k0 = regs[R_RNG : R_RNG + 1, :]
        k1 = regs[R_RNG + 1 : R_RNG + 2, :]
        base = y * w + x

        # Front-cell clearance BEFORE obstacles move (stash for the
        # post-hook's collision penalty).
        dirx = (d == 0).astype(jnp.int32) - (d == 2).astype(jnp.int32)
        diry = (d == 1).astype(jnp.int32) - (d == 3).astype(jnp.int32)
        frow = (((y + diry) * w + (x + dirx)) - base) % hw
        fwdw = jnp.sum(jnp.where(iota_hw == frow, words, 0), axis=0, keepdims=True)
        ft = fwdw & 15
        not_clear = (ft != C.EMPTY) & (ft != C.GOAL)

        cur = [
            (
                regs[R_AUX + 2 * i : R_AUX + 2 * i + 1, :],
                regs[R_AUX + 2 * i + 1 : R_AUX + 2 * i + 2, :],
            )
            for i in range(n)
        ]
        for i in range(n):
            u = prng.hash_u31(k0, k1, sc * n + i)
            ox, oy = cur[i]
            valid9, xs9, ys9 = [], [], []
            for dy_, dx_ in _dynobst.WALK_OFFSETS:
                nx, ny = ox + dx_, oy + dy_
                ok = (nx >= 1) & (nx <= w - 2) & (ny >= 1) & (ny <= h - 2)
                ok &= ~((nx == w - 2) & (ny == h - 2))  # goal cell
                ok &= ~((nx == x) & (ny == y))  # agent
                for j in range(n):  # other obstacles (and self at j == i)
                    ok &= ~((nx == cur[j][0]) & (ny == cur[j][1]))
                valid9.append(ok)
                xs9.append(nx)
                ys9.append(ny)
            nx, ny = _dynobst.select_walk_target(valid9, u, xs9, ys9, ox, oy)
            row_old = ((oy * w + ox) - base) % hw
            words = jnp.where(iota_hw == row_old, _EMPTY_WORD, words)
            row_new = ((ny * w + nx) - base) % hw
            words = jnp.where(iota_hw == row_new, ball_word, words)
            cur[i] = (nx, ny)

        new_aux = [r for xy in cur for r in xy]
        regs = jnp.concatenate(
            [regs[:R_AUX], *new_aux, regs[R_AUX + 2 * n :]], axis=0
        )
        return words, regs, not_clear

    return pre


def _hook_dynamicobstacles(v: HookVals):
    """envs/dynamicobstacles.py step, post part: walking forward into a
    pre-walk-blocked cell costs −1 and terminates
    (dynamicobstacles.py:~90-101). `v.stash` is the pre-hook's `not_clear`."""
    a_eff = jnp.where(v.a >= 3, 0, v.a)  # the family's action remap
    collided = (a_eff == Actions.forward) & v.stash
    reward = jnp.where(collided, -1.0, v.reward)
    return reward, v.terminated | collided


def _hook_pickup_target(v: HookVals):
    """Shared Unlock-Pickup / KeyCorridor / ObstructedMaze hook: a pickup
    that leaves the agent carrying the aux target rewards and terminates
    (envs/unlockpickup.py pickup_target_step)."""
    got = (
        (v.a == Actions.pickup)
        & (v.ct1 == _row(v.aux, 0))
        & (v.cc1 == _row(v.aux, 1))
    )
    reward = jnp.where(got, v.success, v.reward)
    return reward, v.terminated | got


# Transition-function identity -> packed POST-hook. `env.transition is
# base_step` needs no entry (no hook).
HOOKS = {
    _fetch.step: _hook_fetch,
    _gotodoor.step: _hook_gotodoor,
    _gotoobject.step: _hook_gotoobject,
    _putnear.step: _hook_putnear,
    _memory.step: _hook_memory,
    _unlock.step: _hook_unlock,
    _redbluedoors.step: _hook_redbluedoors,
    _unlockpickup.pickup_target_step: _hook_pickup_target,
    _dynobst.step: _hook_dynamicobstacles,
}

# Transition-function identity -> PRE-hook factory `(EnvConfig) ->
# fn(words, regs) -> (words', regs', stash)`, run before the base
# transition math in `_step_core` (stochastic grid mutations; the stash is
# handed to the family's post-hook).
PRE_HOOK_FACTORIES = {
    _dynobst.step: _make_pre_dynamicobstacles,
}


def _remap_memory(a: jnp.ndarray) -> jnp.ndarray:
    # envs/memory.py: pickup acts as toggle.
    return jnp.where(a == Actions.pickup, jnp.full_like(a, Actions.toggle), a)


def _remap_dynamicobstacles(a: jnp.ndarray) -> jnp.ndarray:
    # envs/dynamicobstacles.py: actions outside Discrete(3) act as 0.
    return jnp.where(a >= 3, jnp.zeros_like(a), a)


# Transition-function identity -> action remap applied BEFORE the base
# transition (the hook still sees the original action).
ACTION_REMAPS = {
    _memory.step: _remap_memory,
    _dynobst.step: _remap_dynamicobstacles,
}
