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

from typing import Callable, NamedTuple

import jax.numpy as jnp

from minigrid_tpu.core import constants as C
from minigrid_tpu.core.state import Actions
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


# Transition-function identity -> packed hook. `env.transition is base_step`
# needs no entry (no hook); dynamicobstacles has a stochastic PRE-step grid
# mutation, not a post-hook, and stays on the vmap engine.
HOOKS = {
    _fetch.step: _hook_fetch,
    _gotodoor.step: _hook_gotodoor,
    _gotoobject.step: _hook_gotoobject,
    _putnear.step: _hook_putnear,
    _memory.step: _hook_memory,
    _unlock.step: _hook_unlock,
    _redbluedoors.step: _hook_redbluedoors,
    _unlockpickup.pickup_target_step: _hook_pickup_target,
}


def _remap_memory(a: jnp.ndarray) -> jnp.ndarray:
    # envs/memory.py: pickup acts as toggle.
    return jnp.where(a == Actions.pickup, jnp.full_like(a, Actions.toggle), a)


# Transition-function identity -> action remap applied BEFORE the base
# transition (the hook still sees the original action).
ACTION_REMAPS = {
    _memory.step: _remap_memory,
}
