"""Lava/wall crossing environments.

Reference: `CrossingEnv` (envs/crossing.py:~1-120) — `num_crossings` full
rivers of lava (or wall) drawn from the even interior rows/columns, with one
opening per river carved along a random monotone room-to-room path from the
top-left room to the goal room.

Device rewrite of the reference's list-shuffle + itertools algorithm with
fixed shapes:
  * river selection = permutation of the 2·K candidate (position, axis)
    pairs, take the first N (≡ the reference's `shuffle; rivers[:n]`),
  * `rivers_v/rivers_h` become sorted fixed-width arrays padded with
    `size-1`, which makes the padded `limits` arrays index-safe for every
    reachable `room_i/room_j`,
  * river painting is a row/column scatter-mask,
  * the path walk is an unrolled loop of N masked selects.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from minigrid_tpu.core import constants as C
from minigrid_tpu.core import grid as G
from minigrid_tpu.core.state import EnvConfig, EnvState, empty_state
from minigrid_tpu.core.step import base_step
from minigrid_tpu.envs import missions

MISSION_LAVA = missions.register_template(
    "avoid the lava and get to the green goal square"
)
MISSION_WALL = missions.register_template(
    "find the opening and get to the green goal square"
)


def generate(key: jax.Array, config: EnvConfig) -> EnvState:
    key, k_reset = jax.random.split(key)
    state = empty_state(config, rng=k_reset)
    size = config.width
    assert size % 2 == 1
    n = config.num_crossings

    grid = G.wall_rect(state.grid, 0, 0, size, size)
    grid = G.set_cell(grid, size - 2, size - 2, (C.GOAL, C.GREEN, 0, 0, 0))

    if config.obstacle_type == "wall":
        obst = jnp.asarray(G.WALL_CELL, dtype=jnp.uint8)
        mission = MISSION_WALL
    else:
        obst = jnp.asarray((C.LAVA, C.RED, 0, 0, 0), dtype=jnp.uint8)
        mission = MISSION_LAVA

    # Candidate rivers: positions 2, 4, ..., size-3 on both axes.
    cand = jnp.arange(2, size - 2, 2, dtype=jnp.int32)  # (K,)
    k_cand = cand.shape[0]
    all_pos = jnp.concatenate([cand, cand])  # first K vertical, next K horizontal
    all_isv = jnp.concatenate(
        [jnp.ones((k_cand,), jnp.int32), jnp.zeros((k_cand,), jnp.int32)]
    )
    assert n <= 2 * k_cand

    ks = jax.random.split(key, 3 + n)
    perm = jax.random.permutation(ks[0], 2 * k_cand)[:n]
    sel_pos = all_pos[perm]  # (n,)
    sel_isv = all_isv[perm]  # (n,) 1 = vertical river (a column)
    nv = jnp.sum(sel_isv)

    # Paint rivers: column scatter for vertical, row scatter for horizontal.
    col_sel = jnp.zeros((size,), jnp.int32).at[sel_pos].add(sel_isv) > 0
    row_sel = jnp.zeros((size,), jnp.int32).at[sel_pos].add(1 - sel_isv) > 0
    ys = jnp.arange(size)[:, None]
    xs = jnp.arange(size)[None, :]
    interior = (xs >= 1) & (xs < size - 1) & (ys >= 1) & (ys < size - 1)
    river_mask = (col_sel[None, :] | row_sel[:, None]) & interior
    grid = jnp.where(river_mask[:, :, None], obst, grid)

    # Sorted, padded river coordinate arrays → limits (pad value size-1
    # coincides with the reference's closing limit, so indices ≤ nv+1 are
    # always correct).
    big = jnp.int32(size - 1)
    rivers_v = jnp.sort(jnp.where(sel_isv == 1, sel_pos, big))
    rivers_h = jnp.sort(jnp.where(sel_isv == 0, sel_pos, big))
    limits_v = jnp.concatenate([jnp.zeros((1,), jnp.int32), rivers_v, big[None]])
    limits_h = jnp.concatenate([jnp.zeros((1,), jnp.int32), rivers_h, big[None]])

    # Path: nv horizontal moves + (n-nv) vertical moves, shuffled.
    path_is_h = jax.random.permutation(
        ks[1], (jnp.arange(n) < nv).astype(jnp.int32)
    )

    room_i = jnp.zeros((), jnp.int32)
    room_j = jnp.zeros((), jnp.int32)
    for t in range(n):
        is_h = path_is_h[t]
        # Horizontal move: cross the next vertical river at a random row of
        # the current horizontal band.
        xh = limits_v[room_i + 1]
        yh = jax.random.randint(
            ks[3 + t], (), limits_h[room_j] + 1, limits_h[room_j + 1]
        )
        # Vertical move: cross the next horizontal river at a random column.
        xv = jax.random.randint(
            ks[3 + t], (), limits_v[room_i] + 1, limits_v[room_i + 1]
        )
        yv = limits_h[room_j + 1]
        gx = jnp.where(is_h == 1, xh, xv)
        gy = jnp.where(is_h == 1, yh, yv)
        grid = G.set_cell(grid, gx, gy, G.EMPTY_CELL)
        room_i = room_i + is_h
        room_j = room_j + (1 - is_h)

    return state.replace(
        grid=grid,
        agent_pos=jnp.asarray((1, 1), dtype=jnp.int32),
        agent_dir=jnp.zeros((), dtype=jnp.int32),
        mission=jnp.asarray(missions.encode(mission)),
    )


step = base_step
