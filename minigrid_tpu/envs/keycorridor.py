"""Key-corridor environment.

Reference: `KeyCorridorEnv(RoomGrid)` (envs/keycorridor.py:~1-60) — a
3-column room grid whose middle column is opened into a vertical corridor;
a target object (ball) waits behind a locked door on the right side, the
matching key hides in a random left-side room, and `connect_all` guarantees
reachability. Picking up the target succeeds.
`aux[0]` = target type, `aux[1]` = target color.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from minigrid_tpu.core import constants as C
from minigrid_tpu.core.state import EnvConfig, EnvState, empty_state
from minigrid_tpu.envs import missions, roomgrid
from minigrid_tpu.envs.unlockpickup import pickup_target_step

MISSION = missions.register_template("pick up the {c0} {t1}")


def generate(key: jax.Array, config: EnvConfig) -> EnvState:
    key, k_reset = jax.random.split(key)
    state = empty_state(config, rng=k_reset)
    rows = config.num_rows
    ks = jax.random.split(key, 8)

    rg = roomgrid.init(ks[0], config, state.grid)
    # Open the middle column into a corridor.
    for j in range(1, rows):
        rg = roomgrid.remove_wall(rg, config, 1, j, roomgrid.UP)

    # Locked door into a random right-side room, target object behind it.
    room_j = jax.random.randint(ks[1], (), 0, rows)
    door_color = roomgrid.rand_color(ks[2])
    rg = roomgrid.add_door(rg, config, 2, room_j, roomgrid.LEFT, door_color, True)
    rg, obj_type, obj_color, _, _ = roomgrid.add_object(
        rg, config, ks[3], 2, room_j, kind=C.BALL
    )

    # Key in a random left-side room.
    key_j = jax.random.randint(ks[4], (), 0, rows)
    rg, _, _, _, _ = roomgrid.add_object(
        rg, config, ks[5], 0, key_j, kind=C.KEY, color=door_color
    )

    rg, agent_dir = roomgrid.place_agent(rg, config, ks[6], 1, rows // 2)
    rg = roomgrid.connect_all(rg, config, ks[7])

    aux = state.aux.at[0].set(obj_type.astype(jnp.int32)).at[1].set(
        obj_color.astype(jnp.int32)
    )
    mission = (
        jnp.zeros_like(state.mission)
        .at[0].set(MISSION)
        .at[1].set(obj_color.astype(jnp.int32))
        .at[2].set(obj_type.astype(jnp.int32))
    )
    return state.replace(
        grid=rg.grid,
        agent_pos=rg.agent_pos,
        agent_dir=agent_dir,
        aux=aux,
        mission=mission,
    )


step = pickup_target_step
