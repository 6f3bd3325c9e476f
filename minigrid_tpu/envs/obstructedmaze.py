"""Obstructed maze environments.

Reference: `ObstructedMazeEnv(RoomGrid)` + subclasses
(envs/obstructedmaze.py:~1-200) — find the blue ball; locked doors may be
obstructed by a grey(2nd-color) ball and their keys hidden inside boxes
(`Box.contains`). Fixed scheme: ball-to-find = COLOR_NAMES[0] (blue),
blocking balls = COLOR_NAMES[1] (green), boxes = COLOR_NAMES[2] (grey);
door colors are a random permutation of all six colors.

Variants (static in `EnvConfig.extras`):
  * ("1D", key_in_box, blocked)       — 1×2 rooms, one locked door
  * ("full", agent_i, agent_j, key_in_box, blocked, num_quarters)
                                      — 3×3 rooms, per-quarter locked doors
`aux[0]` = target type, `aux[1]` = target color.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from minigrid_tpu.core import constants as C
from minigrid_tpu.core import grid as G
from minigrid_tpu.core.state import EnvConfig, EnvState, empty_state
from minigrid_tpu.envs import missions, roomgrid
from minigrid_tpu.envs.unlockpickup import pickup_target_step

MISSION = missions.register_template("pick up the {c0} ball")

# COLOR_NAMES[0..2] = blue, green, grey (sorted order — minigrid.py:~25).
BALL_COLOR = C.COLOR_TO_IDX[C.COLOR_NAMES[0]]  # blue
BLOCK_COLOR = C.COLOR_TO_IDX[C.COLOR_NAMES[1]]  # green
BOX_COLOR = C.COLOR_TO_IDX[C.COLOR_NAMES[2]]  # grey


def _add_locked_door(rg, config, key, i, j, k, color, key_in_box, blocked):
    """`ObstructedMazeEnv.add_door` (obstructedmaze.py:~40-75): locked door
    + optional blocking ball outside + matching key (possibly boxed) inside
    room (i, j)."""
    rg = roomgrid.add_door(rg, config, i, j, k, color, True)
    pos = rg.door_pos[jnp.asarray(j), jnp.asarray(i), jnp.asarray(k)]
    if blocked:
        vec = jnp.asarray(C.DIR_TO_VEC)[jnp.asarray(k)]
        ball = jnp.stack(
            [jnp.uint8(C.BALL), jnp.uint8(BLOCK_COLOR), jnp.uint8(0),
             jnp.uint8(0), jnp.uint8(0)]
        )
        rg = rg._replace(
            grid=G.set_cell(rg.grid, pos[0] - vec[0], pos[1] - vec[1], ball)
        )
    z = jnp.uint8(0)
    if key_in_box:
        cell = jnp.stack(
            [jnp.uint8(C.BOX), jnp.uint8(BOX_COLOR), z,
             jnp.uint8(C.KEY), jnp.asarray(color, jnp.uint8)]
        )
    else:
        cell = jnp.stack([jnp.uint8(C.KEY), jnp.asarray(color, jnp.uint8), z, z, z])
    rg, _, _ = roomgrid.place_in_room(rg, config, key, i, j, cell)
    return rg


def generate(key: jax.Array, config: EnvConfig) -> EnvState:
    key, k_reset = jax.random.split(key)
    state = empty_state(config, rng=k_reset)
    variant = config.extras[0]
    ks = jax.random.split(key, 16)

    rg = roomgrid.init(ks[0], config, state.grid)
    # Random permutation of the six colors for doors.
    door_colors = jnp.asarray(roomgrid.COLOR_ORDER, jnp.uint8)[
        jax.random.permutation(ks[1], 6)
    ]

    if variant == "1D":
        _, key_in_box, blocked = config.extras
        rg = _add_locked_door(
            rg, config, ks[2], 0, 0, roomgrid.RIGHT,
            door_colors[0], key_in_box, blocked,
        )
        rg, t, c, _, _ = roomgrid.add_object(
            rg, config, ks[3], 1, 0, kind=C.BALL, color=jnp.uint8(BALL_COLOR)
        )
        rg, agent_dir = roomgrid.place_agent(rg, config, ks[4], 0, 0)
    else:
        _, agent_i, agent_j, key_in_box, blocked, num_quarters = config.extras
        side_rooms = [(2, 1), (1, 2), (0, 1), (1, 0)][:num_quarters]
        for idx, (si, sj) in enumerate(side_rooms):
            # Unlocked door from the center to the side room.
            rg = roomgrid.add_door(
                rg, config, 1, 1, idx, door_colors[idx], False
            )
            # Locked doors on both lateral walls of the side room.
            for t_off, k_off in enumerate((-1, 1)):
                k = (idx + k_off) % 4
                # Reference color index: door_colors[(i+k) % len(door_colors)].
                color_idx = (idx + k_off) % 6
                rg = _add_locked_door(
                    rg, config, ks[5 + 2 * idx + t_off], si, sj, k,
                    door_colors[color_idx], key_in_box, blocked,
                )
        corners = [(2, 0), (2, 2), (0, 2), (0, 0)][:num_quarters]
        pick = jax.random.randint(ks[2], (), 0, len(corners))
        ci = jnp.asarray([c[0] for c in corners])[pick]
        cj = jnp.asarray([c[1] for c in corners])[pick]
        rg, t, c, _, _ = roomgrid.add_object(
            rg, config, ks[3], ci, cj, kind=C.BALL, color=jnp.uint8(BALL_COLOR)
        )
        rg, agent_dir = roomgrid.place_agent(rg, config, ks[4], agent_i, agent_j)

    aux = state.aux.at[0].set(int(C.BALL)).at[1].set(int(BALL_COLOR))
    mission = (
        jnp.zeros_like(state.mission)
        .at[0].set(MISSION).at[1].set(int(BALL_COLOR))
    )
    return state.replace(
        grid=rg.grid,
        agent_pos=rg.agent_pos,
        agent_dir=agent_dir,
        aux=aux,
        mission=mission,
    )


step = pickup_target_step
