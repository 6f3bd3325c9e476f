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


def generate_packed(keys: jnp.ndarray, config: EnvConfig):
    """Lane-major batched generation (ops/packed_gen.py): the scalar plan
    — door-slot draws, room picks, colors, `connect_plan`'s bitmask loop —
    is the vmap'd reuse of `generate`'s exact RNG call tree; the paint
    runs on `(HW, B)` int32 words with the all-static room lattice (walls
    + corridor openings) baked as one constant. Byte-exact vs
    `_pack_rolled(cfg, vmap(generate)(keys))` (tests/test_packed_gen.py).
    """
    import numpy as np

    from minigrid_tpu.envs.roomgrid import (
        DOWN,
        LEFT,
        RIGHT,
        UP,
        init_plan,
        rand_color,
    )
    from minigrid_tpu.ops import packed_gen as PG

    rows, cols, rs = config.num_rows, config.num_cols, config.room_size
    w, h = config.width, config.height
    b = keys.shape[0]

    # ---- vmapped scalar plan: generate()'s exact draw tree -------------
    def plan(key):
        key, k_reset = jax.random.split(key)
        ks = jax.random.split(key, 8)
        door_pos = init_plan(ks[0], config)
        room_j = jax.random.randint(ks[1], (), 0, rows)
        door_color = rand_color(ks[2])
        _, k_color_a, k_pos_a = jax.random.split(ks[3], 3)
        obj_color = rand_color(k_color_a)  # add_object(kind=BALL)
        key_j = jax.random.randint(ks[4], (), 0, rows)
        _, _, k_pos_b = jax.random.split(ks[5], 3)  # kind+color given
        return (k_reset, door_pos, room_j, door_color, obj_color,
                k_pos_a, key_j, k_pos_b, ks[6], ks[7])

    (k_reset, door_pos, room_j, door_color, obj_color,
     k_pos_a, key_j, k_pos_b, k_agent, k_conn) = jax.vmap(plan)(keys)

    # ---- static room lattice: walls + the opened middle column ---------
    base = np.full((h, w), PG.EMPTY_WORD, np.int32)
    for j in range(rows):
        for i in range(cols):
            tx, ty = i * (rs - 1), j * (rs - 1)
            base[ty, tx:tx + rs] = PG.WALL_WORD
            base[ty + rs - 1, tx:tx + rs] = PG.WALL_WORD
            base[ty:ty + rs, tx] = PG.WALL_WORD
            base[ty:ty + rs, tx + rs - 1] = PG.WALL_WORD
    for j in range(1, rows):  # remove_wall(1, j, UP)
        tx, ty = (rs - 1), j * (rs - 1)
        base[ty, tx + 1:tx + rs - 1] = PG.EMPTY_WORD
    xs, ys = PG.xy_iota(h, w)
    words = jnp.broadcast_to(
        jnp.asarray(base.reshape(-1))[:, None], (h * w, b)
    )

    # ---- locked door into (2, room_j) through its LEFT wall ------------
    # (the slot aliases room (1, room_j)'s RIGHT position).
    dpos = jax.vmap(
        lambda dp, rj: dp[rj, 2, LEFT], in_axes=(0, 0)
    )(door_pos, room_j)  # (B, 2)
    locked_word = (
        C.DOOR | (door_color.astype(jnp.int32) << 4) | (C.STATE_LOCKED << 8)
    )
    words = PG.set_cell_words(
        words, xs, ys, dpos[:, 0], dpos[:, 1], locked_word
    )

    # ---- ball behind the door; key in a random left-side room ----------
    # Both use the agent's INIT position (the lattice center) for the
    # free/reject tests — place_agent runs after (roomgrid.init).
    acx = (cols // 2) * (rs - 1) + rs // 2
    acy = (rows // 2) * (rs - 1) + rs // 2
    acx_b = jnp.full((b,), acx, jnp.int32)
    acy_b = jnp.full((b,), acy, jnp.int32)
    reject = PG.reject_next_to_words(xs, ys, acx, acy)  # static

    def room_mask(i, jj):
        return PG.rect_mask_words(
            xs, ys, jnp.full((b,), i * (rs - 1), jnp.int32),
            jj * (rs - 1), jnp.full((b,), rs, jnp.int32), rs,
        )

    mask_a = (
        PG.free_mask_words(words, xs, ys, acx_b, acy_b)
        & room_mask(2, room_j) & reject
    )
    bx, by = PG.sample_cell_words(k_pos_a, mask_a, w)
    ball_word = C.BALL | (obj_color.astype(jnp.int32) << 4)
    words = PG.set_cell_words(words, xs, ys, bx, by, ball_word)

    mask_b = (
        PG.free_mask_words(words, xs, ys, acx_b, acy_b)
        & room_mask(0, key_j) & reject
    )
    kx, ky = PG.sample_cell_words(k_pos_b, mask_b, w)
    key_word = C.KEY | (door_color.astype(jnp.int32) << 4)
    words = PG.set_cell_words(words, xs, ys, kx, ky, key_word)

    # ---- agent in the middle room ---------------------------------------
    interior = jnp.asarray(
        PG.rect_mask_words(
            xs, ys, jnp.zeros((1,), jnp.int32) + 1 * (rs - 1),
            jnp.zeros((1,), jnp.int32) + (rows // 2) * (rs - 1), rs, rs,
        )
    )  # (HW, 1) static
    ax, ay, adir = PG.place_agent_words(k_agent, words, xs, ys, interior, w)

    # ---- connect_all: scalar bitmask loop, then paint accepted doors ---
    jj_iota = jnp.arange(rows, dtype=jnp.int32)[None, :, None]  # (1,R,1)
    ii_iota = jnp.arange(cols, dtype=jnp.int32)[None, None, :]
    locked_2d = (jj_iota == room_j[:, None, None]) & (ii_iota == 2)  # (B,R,C)
    # Prior connectivity: the opened corridor walls (static) + the locked
    # door's two slot registrations (dynamic in room_j).
    prior_static = np.zeros((rows, cols, 4), bool)
    for j in range(1, rows):  # remove_wall(1, j, UP) registers both sides
        prior_static[j, 1, UP] = True
        prior_static[j - 1, 1, DOWN] = True
    prior = jnp.broadcast_to(
        jnp.asarray(prior_static)[None], (b, rows, cols, 4)
    )
    is_rj = jj_iota == room_j[:, None, None]
    prior = prior | (
        is_rj[..., None]
        & ((ii_iota == 2)[..., None]
           & (jnp.arange(4) == LEFT)[None, None, None, :])
    ) | (
        is_rj[..., None]
        & ((ii_iota == 1)[..., None]
           & (jnp.arange(4) == RIGHT)[None, None, None, :])
    )
    start_i = jnp.minimum(ax // (rs - 1), cols - 1)
    start_j = jnp.minimum(ay // (rs - 1), rows - 1)
    # The randomized door loop runs IN-KERNEL (ops/gen_kernel.py) — the
    # vmapped XLA while_loop was the dominant cost of batched KeyCorridor
    # generation (220 ms at B=32k vs 32 ms in-kernel; bit-identical
    # draws, tests/test_gen_kernel.py).
    from minigrid_tpu.ops.gen_kernel import connect_plan_batched

    has_door_f, colors_f = connect_plan_batched(
        k_conn, config, start_i, start_j, locked_2d, prior
    )

    closed_base = C.DOOR | (C.STATE_CLOSED << 8)
    for j in range(rows):
        for i in range(cols):
            for k in (RIGHT, DOWN):
                if (k == RIGHT and i >= cols - 1) or (
                    k == DOWN and j >= rows - 1
                ):
                    continue
                new = has_door_f[:, j, i, k] & ~prior[:, j, i, k]
                pos = door_pos[:, j, i, k]  # (B, 2)
                word = closed_base | (
                    colors_f[:, j, i, k].astype(jnp.int32) << 4
                )
                words = PG.set_cell_words(
                    words, xs, ys, pos[:, 0], pos[:, 1], word, active=new
                )

    # ---- regs -----------------------------------------------------------
    from minigrid_tpu.core.state import AUX_LEN, MISSION_LEN

    obj_type = jnp.full((b,), C.BALL, jnp.int32)
    aux = jnp.zeros((b, AUX_LEN), jnp.int32)
    aux = aux.at[:, 0].set(obj_type).at[:, 1].set(obj_color.astype(jnp.int32))
    mission = jnp.zeros((b, MISSION_LEN), jnp.int32)
    mission = (
        mission.at[:, 0].set(MISSION)
        .at[:, 1].set(obj_color.astype(jnp.int32))
        .at[:, 2].set(obj_type)
    )
    regs = PG.build_regs(
        b, ax, ay, adir, k_reset, mission=mission, aux=aux
    )
    return PG.finish_packed(words, regs, w)
