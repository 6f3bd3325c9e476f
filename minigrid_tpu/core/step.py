"""The branchless transition kernel.

Reference: `MiniGridEnv.step` (minigrid.py:~1087-1160) — a 7-way Python
`if/elif` over the action with polymorphic `WorldObj` dispatch for
pickup/drop/toggle.

TPU-native design: compute every action's outcome unconditionally and select
by action id. The key observation making this cheap is that *every* grid
mutation in the base transition touches only the forward cell — pickup
clears it, drop fills it, toggle rewrites it — so the whole grid update is a
single `(5,)` cell-vector select followed by one scatter. No `lax.cond`
anywhere: under `vmap` both branches of a cond run anyway, so selects are
the honest (and faster-to-compile) form.

The reference conflates timeout into `done`; internally we keep the
gymnasium-style terminated/truncated split and fuse at the old-API shim
(`minigrid_tpu.compat`).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from minigrid_tpu.core import constants as C
from minigrid_tpu.core.state import (
    Actions,
    CARRY_COLOR,
    CARRY_CONT_COLOR,
    CARRY_CONT_TYPE,
    CARRY_TYPE,
    CH_COLOR,
    CH_CONT_COLOR,
    CH_CONT_TYPE,
    CH_STATE,
    CH_TYPE,
    EnvConfig,
    EnvState,
)


class StepResult(NamedTuple):
    state: EnvState
    reward: jnp.ndarray  # () float32
    terminated: jnp.ndarray  # () bool
    truncated: jnp.ndarray  # () bool


def success_reward(step_count: jnp.ndarray, max_steps: int) -> jnp.ndarray:
    """`_reward()` = 1 − 0.9·t/T (minigrid.py:~835-840)."""
    return 1.0 - 0.9 * (step_count.astype(jnp.float32) / max_steps)


def base_step(state: EnvState, action: jnp.ndarray, config: EnvConfig) -> StepResult:
    """One transition for a single environment (vmap for batches)."""
    action = jnp.asarray(action, dtype=jnp.int32)
    step_count = state.step_count + 1

    dir_vec = jnp.asarray(C.DIR_TO_VEC)[state.agent_dir]  # (2,) int32
    fwd_pos = state.agent_pos + dir_vec
    fwd_cell = state.grid[fwd_pos[1], fwd_pos[0], :]  # (5,) uint8
    fwd_type = fwd_cell[CH_TYPE].astype(jnp.int32)
    fwd_color = fwd_cell[CH_COLOR]
    fwd_state = fwd_cell[CH_STATE].astype(jnp.int32)

    is_left = action == Actions.left
    is_right = action == Actions.right
    is_forward = action == Actions.forward
    is_pickup = action == Actions.pickup
    is_drop = action == Actions.drop
    is_toggle = action == Actions.toggle

    # --- turns -----------------------------------------------------------
    agent_dir = jnp.mod(
        state.agent_dir + is_right.astype(jnp.int32) - is_left.astype(jnp.int32), 4
    )

    # --- forward ---------------------------------------------------------
    can_overlap = jnp.asarray(C.CAN_OVERLAP)[fwd_type] | (
        (fwd_type == C.DOOR) & (fwd_state == C.STATE_OPEN)
    )
    moves = is_forward & can_overlap
    agent_pos = jnp.where(moves, fwd_pos, state.agent_pos)

    hit_goal = is_forward & (fwd_type == C.GOAL)
    hit_lava = is_forward & (fwd_type == C.LAVA)
    terminated = hit_goal | hit_lava
    reward = jnp.where(hit_goal, success_reward(step_count, config.max_steps), 0.0)

    # --- pickup ----------------------------------------------------------
    hands_empty = state.carrying[CARRY_TYPE] == 0
    do_pickup = is_pickup & jnp.asarray(C.CAN_PICKUP)[fwd_type] & hands_empty
    picked = jnp.stack(
        [
            fwd_cell[CH_TYPE],
            fwd_cell[CH_COLOR],
            fwd_cell[CH_CONT_TYPE],
            fwd_cell[CH_CONT_COLOR],
        ]
    )

    # --- drop ------------------------------------------------------------
    do_drop = is_drop & (fwd_type == C.EMPTY) & ~hands_empty
    dropped_cell = jnp.stack(
        [
            state.carrying[CARRY_TYPE],
            state.carrying[CARRY_COLOR],
            jnp.zeros((), jnp.uint8),
            state.carrying[CARRY_CONT_TYPE],
            state.carrying[CARRY_CONT_COLOR],
        ]
    )

    carrying = jnp.where(do_pickup, picked, state.carrying)
    carrying = jnp.where(do_drop, jnp.zeros_like(carrying), carrying)

    # --- toggle ----------------------------------------------------------
    # Door (minigrid.py:~230-295): locked opens iff carrying the same-color
    # key; otherwise open<->closed flips.
    has_key = (state.carrying[CARRY_TYPE] == C.KEY) & (
        state.carrying[CARRY_COLOR] == fwd_color
    )
    unlocks = (fwd_state == C.STATE_LOCKED) & has_key
    new_door_state = jnp.where(
        fwd_state == C.STATE_LOCKED,
        jnp.where(unlocks, C.STATE_OPEN, C.STATE_LOCKED),
        1 - fwd_state,  # open(0)<->closed(1)
    ).astype(jnp.uint8)
    toggled_door = fwd_cell.at[CH_STATE].set(new_door_state)

    # Box (minigrid.py:~335-365): replaced in the grid by its contents
    # (or an empty cell if it contains nothing).
    cont_type = fwd_cell[CH_CONT_TYPE]
    toggled_box = jnp.stack(
        [
            jnp.where(cont_type > 0, cont_type, jnp.uint8(C.EMPTY)),
            fwd_cell[CH_CONT_COLOR],
            jnp.zeros((), jnp.uint8),
            jnp.zeros((), jnp.uint8),
            jnp.zeros((), jnp.uint8),
        ]
    )

    do_toggle_door = is_toggle & (fwd_type == C.DOOR)
    do_toggle_box = is_toggle & (fwd_type == C.BOX)

    # --- single forward-cell writeback ----------------------------------
    empty_cell = jnp.array([C.EMPTY, 0, 0, 0, 0], dtype=jnp.uint8)
    new_fwd_cell = fwd_cell
    new_fwd_cell = jnp.where(do_pickup, empty_cell, new_fwd_cell)
    new_fwd_cell = jnp.where(do_drop, dropped_cell, new_fwd_cell)
    new_fwd_cell = jnp.where(do_toggle_door, toggled_door, new_fwd_cell)
    new_fwd_cell = jnp.where(do_toggle_box, toggled_box, new_fwd_cell)
    grid = state.grid.at[fwd_pos[1], fwd_pos[0], :].set(new_fwd_cell)

    truncated = step_count >= config.max_steps

    new_state = state.replace(
        grid=grid,
        agent_pos=agent_pos,
        agent_dir=agent_dir,
        carrying=carrying,
        step_count=step_count,
    )
    return StepResult(
        state=new_state,
        reward=jnp.asarray(reward, dtype=jnp.float32),
        terminated=terminated,
        truncated=truncated,
    )
