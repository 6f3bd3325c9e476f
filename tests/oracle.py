"""Hand-coded NumPy oracle of the reference semantics.

A deliberately naive, loop-based implementation of the documented
gym-minigrid transition (SURVEY.md §3.2), occlusion scan (§3.3), and
observation pipeline, used to validate the vectorized JAX kernels
cell-for-cell. Written directly from the reference's documented control
flow — if the kernels and this oracle agree, both faithfully implement
minigrid.py:~1087-1215.

State layout matches minigrid_tpu: grid is (H, W, 5) uint8 with channels
(type, color, state, contains_type, contains_color); positions are (x, y).
"""

from __future__ import annotations

import numpy as np

from minigrid_tpu.core import constants as C

DIR_TO_VEC = C.DIR_TO_VEC


def can_overlap(cell) -> bool:
    t, s = int(cell[0]), int(cell[2])
    if t == C.DOOR:
        return s == C.STATE_OPEN
    return bool(C.CAN_OVERLAP[t])


def can_pickup(cell) -> bool:
    return bool(C.CAN_PICKUP[int(cell[0])])


def see_behind(cell) -> bool:
    t, s = int(cell[0]), int(cell[2])
    if t == C.WALL:
        return False
    if t == C.DOOR:
        return s == C.STATE_OPEN
    return True


def step_oracle(grid, agent_pos, agent_dir, carrying, step_count, action, max_steps):
    """Literal transcription of MiniGridEnv.step (minigrid.py:~1087-1160).

    carrying: (4,) uint8 (type, color, cont_type, cont_color); type 0 = none.
    Returns (grid, agent_pos, agent_dir, carrying, step_count,
             reward, terminated, truncated).
    """
    grid = grid.copy()
    agent_pos = np.array(agent_pos, dtype=np.int64)
    carrying = np.array(carrying, dtype=np.uint8)
    step_count = step_count + 1
    reward = 0.0
    terminated = False

    fwd = agent_pos + DIR_TO_VEC[agent_dir]
    fx, fy = int(fwd[0]), int(fwd[1])
    fwd_cell = grid[fy, fx].copy()
    ft = int(fwd_cell[0])

    if action == 0:  # left
        agent_dir = (agent_dir - 1) % 4
    elif action == 1:  # right
        agent_dir = (agent_dir + 1) % 4
    elif action == 2:  # forward
        if can_overlap(fwd_cell):
            agent_pos = fwd
        if ft == C.GOAL:
            terminated = True
            reward = 1.0 - 0.9 * (step_count / max_steps)
        if ft == C.LAVA:
            terminated = True
    elif action == 3:  # pickup
        if can_pickup(fwd_cell) and carrying[0] == 0:
            carrying = np.array(
                [fwd_cell[0], fwd_cell[1], fwd_cell[3], fwd_cell[4]], dtype=np.uint8
            )
            grid[fy, fx] = np.array([C.EMPTY, 0, 0, 0, 0], dtype=np.uint8)
    elif action == 4:  # drop
        if ft == C.EMPTY and carrying[0] != 0:
            grid[fy, fx] = np.array(
                [carrying[0], carrying[1], 0, carrying[2], carrying[3]], dtype=np.uint8
            )
            carrying = np.zeros(4, dtype=np.uint8)
    elif action == 5:  # toggle
        if ft == C.DOOR:
            s = int(fwd_cell[2])
            if s == C.STATE_LOCKED:
                if carrying[0] == C.KEY and carrying[1] == fwd_cell[1]:
                    grid[fy, fx, 2] = C.STATE_OPEN
            else:
                grid[fy, fx, 2] = C.STATE_CLOSED if s == C.STATE_OPEN else C.STATE_OPEN
        elif ft == C.BOX:
            ct = int(fwd_cell[3])
            if ct > 0:
                grid[fy, fx] = np.array([ct, fwd_cell[4], 0, 0, 0], dtype=np.uint8)
            else:
                grid[fy, fx] = np.array([C.EMPTY, 0, 0, 0, 0], dtype=np.uint8)
    elif action == 6:  # done — explicit no-op
        pass

    truncated = step_count >= max_steps
    return grid, agent_pos, agent_dir, carrying, step_count, reward, terminated, truncated


def process_vis_oracle(view_grid):
    """Literal transcription of Grid.process_vis (minigrid.py:~620-640).

    view_grid: (V, V, 5) with agent at [V-1, V//2]. The reference's grid is
    indexed (i=x=col, j=y=row); we keep [row, col] storage, so mask[j, i].
    """
    v = view_grid.shape[0]
    mask = np.zeros((v, v), dtype=bool)
    mask[v - 1, v // 2] = True

    for j in reversed(range(v)):
        for i in range(0, v - 1):
            if not mask[j, i]:
                continue
            if not see_behind(view_grid[j, i]):
                continue
            mask[j, i + 1] = True
            if j > 0:
                mask[j - 1, i + 1] = True
                mask[j - 1, i] = True
        for i in reversed(range(1, v)):
            if not mask[j, i]:
                continue
            if not see_behind(view_grid[j, i]):
                continue
            mask[j, i - 1] = True
            if j > 0:
                mask[j - 1, i - 1] = True
                mask[j - 1, i] = True
    return mask


def slice_oracle(grid, top_x, top_y, v):
    """Grid.slice with out-of-bounds cells filled with Wall (minigrid.py:~467)."""
    h, w = grid.shape[:2]
    out = np.zeros((v, v, 5), dtype=np.uint8)
    wall = np.array([C.WALL, C.GREY, 0, 0, 0], dtype=np.uint8)
    for r in range(v):
        for c in range(v):
            y, x = top_y + r, top_x + c
            if 0 <= y < h and 0 <= x < w:
                out[r, c] = grid[y, x]
            else:
                out[r, c] = wall
    return out


def gen_obs_oracle(grid, agent_pos, agent_dir, carrying, view_size, see_through_walls):
    """gen_obs_grid + encode (minigrid.py:~1162-1215) → (V, V, 3) uint8 [x, y]."""
    v = view_size
    half = v // 2
    ax, ay = int(agent_pos[0]), int(agent_pos[1])
    if agent_dir == 0:
        top_x, top_y = ax, ay - half
    elif agent_dir == 1:
        top_x, top_y = ax - half, ay
    elif agent_dir == 2:
        top_x, top_y = ax - v + 1, ay - half
    else:
        top_x, top_y = ax - half, ay - v + 1

    view = slice_oracle(grid, top_x, top_y, v)
    view = np.rot90(view, k=(agent_dir + 1) % 4, axes=(0, 1)).copy()

    if see_through_walls:
        vis = np.ones((v, v), dtype=bool)
    else:
        vis = process_vis_oracle(view)

    # Carried-object overlay at the agent's cell.
    if carrying[0] != 0:
        view[v - 1, half] = np.array(
            [carrying[0], carrying[1], 0, carrying[2], carrying[3]], dtype=np.uint8
        )
    else:
        view[v - 1, half] = np.array([C.EMPTY, 0, 0, 0, 0], dtype=np.uint8)

    # Encode: invisible -> (0,0,0); output indexed [x, y] like the reference.
    img = view[:, :, :3].copy()
    img[~vis] = 0
    return np.transpose(img, (1, 0, 2))
