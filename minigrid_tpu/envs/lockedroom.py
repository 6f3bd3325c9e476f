"""Locked-room environment.

Reference: `LockedRoomEnv` (envs/lockedroom.py:~1-110) — a 19×19 grid with
a central vertical hallway and six rooms (three per side), each with a door
at a fixed position; one random room is locked with the goal inside, the
matching key lies in another random room, door colors are all distinct.
Mission names the key/room/door colors. Base step semantics (goal reach).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from minigrid_tpu.core import constants as C
from minigrid_tpu.core import grid as G
from minigrid_tpu.core import sampling
from minigrid_tpu.core.state import EnvConfig, EnvState, empty_state
from minigrid_tpu.core.step import base_step
from minigrid_tpu.envs import missions
from minigrid_tpu.envs.roomgrid import COLOR_ORDER

MISSION = missions.register_template(
    "get the {c0} key from the {c1} room, unlock the {c2} door and go to the goal"
)


def generate(key: jax.Array, config: EnvConfig) -> EnvState:
    key, k_reset = jax.random.split(key)
    state = empty_state(config, rng=k_reset)
    w, h = config.width, config.height
    l_wall = w // 2 - 2
    r_wall = w // 2 + 2
    room_w = l_wall + 1
    room_h = h // 3 + 1

    grid = G.wall_rect(state.grid, 0, 0, w, h)
    grid = G.vert_wall(grid, l_wall, 0)
    grid = G.vert_wall(grid, r_wall, 0)

    # Static room structure: (top_x, top_y, door_x, door_y) for six rooms,
    # rows of two (left, right) per band.
    rooms = []
    for n in range(3):
        j = n * (h // 3)
        grid = G.horz_wall(grid, 0, j, l_wall)
        grid = G.horz_wall(grid, r_wall, j, w - r_wall)
        rooms.append((0, j, l_wall, j + 3))
        rooms.append((r_wall, j, r_wall, j + 3))
    tops = jnp.asarray([(r[0], r[1]) for r in rooms], jnp.int32)  # (6, 2)
    door_xy = jnp.asarray([(r[2], r[3]) for r in rooms], jnp.int32)

    ks = jax.random.split(key, 7)
    locked_idx = jax.random.randint(ks[0], (), 0, 6)

    # Goal at a random interior cell of the locked room.
    lt = tops[locked_idx]
    gx = jax.random.randint(ks[1], (), 0, room_w - 2) + lt[0] + 1
    gy = jax.random.randint(ks[1], (), 0, room_h - 2) + lt[1] + 1
    grid = G.set_cell(grid, gx, gy, (C.GOAL, C.GREEN, 0, 0, 0))

    # Distinct door colors: a random permutation of the six colors drawn in
    # sorted-name order (the reference removes each drawn color from a set).
    colors = jnp.asarray(COLOR_ORDER, jnp.uint8)[jax.random.permutation(ks[2], 6)]
    for i in range(6):
        is_locked = jnp.asarray(i) == locked_idx
        cell = jnp.stack(
            [jnp.uint8(C.DOOR), colors[i],
             jnp.where(is_locked, jnp.uint8(C.STATE_LOCKED), jnp.uint8(C.STATE_CLOSED)),
             jnp.uint8(0), jnp.uint8(0)]
        )
        grid = G.set_cell(grid, door_xy[i, 0], door_xy[i, 1], cell)

    # Key room ≠ locked room; key matches the locked room's door color.
    off = jax.random.randint(ks[3], (), 1, 6)
    key_idx = (locked_idx + off) % 6
    kt = tops[key_idx]
    kx = jax.random.randint(ks[4], (), 0, room_w - 2) + kt[0] + 1
    ky = jax.random.randint(ks[4], (), 0, room_h - 2) + kt[1] + 1
    z = jnp.uint8(0)
    grid = G.set_cell(
        grid, kx, ky, jnp.stack([jnp.uint8(C.KEY), colors[locked_idx], z, z, z])
    )

    # Agent in the hallway.
    hall = sampling.rect_mask(h, w, l_wall, 0, r_wall - l_wall, h)
    ax, ay = sampling.sample_cell(ks[5], sampling.free_cell_mask(grid, None) & hall)
    agent_pos = jnp.stack([ax, ay])
    agent_dir = sampling.sample_direction(ks[6])

    locked_color = colors[locked_idx].astype(jnp.int32)
    key_room_color = colors[key_idx].astype(jnp.int32)
    mission = (
        jnp.zeros_like(state.mission)
        .at[0].set(MISSION)
        .at[1].set(locked_color)
        .at[2].set(key_room_color)
        .at[3].set(locked_color)
    )
    return state.replace(
        grid=grid, agent_pos=agent_pos, agent_dir=agent_dir, mission=mission
    )


step = base_step
