"""RoomGrid: multi-room level scaffolding.

Reference: `gym_minigrid/roomgrid.py` (~400 LoC) — a `num_rows × num_cols`
matrix of `room_size²` rooms sharing wall lines, with per-room door slots
(order: right, down, left, up), random door positions on each shared wall,
object placement helpers, and the randomized `connect_all` loop.

Device rewrite: the room matrix is static structure; the mutable parts —
grid array, door positions `(R, C, 4, 2)`, door existence `(R, C, 4)`,
locked flags `(R, C)` — live in a small `RG` carry threaded through pure
helper functions. `connect_all`'s stateful randomized loop becomes a
`lax.while_loop` whose reachability check is a ≤R·C-step mask flood over
the door adjacency (all shapes static).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from minigrid_tpu.core import constants as C
from minigrid_tpu.core import grid as G
from minigrid_tpu.core import sampling
from minigrid_tpu.core.state import EnvConfig

# _rand_color draws uniformly from sorted COLOR_NAMES (minigrid.py:~885).
COLOR_ORDER = tuple(C.COLOR_TO_IDX[name] for name in C.COLOR_NAMES)

# connect_plan: unrolled draws per while-iteration (see its body).
_DRAW_BLOCK = 16

# Door slot order: right, down, left, up (roomgrid.py:~142-200); slot k's
# wall direction vector is DIR_TO_VEC[k].
RIGHT, DOWN, LEFT, UP = 0, 1, 2, 3


class RG(NamedTuple):
    """Mutable room-grid build state (all arrays, jit-traceable)."""

    grid: jnp.ndarray  # (H, W, 5) uint8
    door_pos: jnp.ndarray  # (R, Cc, 4, 2) int32 — (x, y) per slot
    has_door: jnp.ndarray  # (R, Cc, 4) bool
    door_locked: jnp.ndarray  # (R, Cc, 4) bool
    locked: jnp.ndarray  # (R, Cc) bool — room contains/owns a locked door
    agent_pos: jnp.ndarray  # (2,) int32


def rand_color(key: jax.Array) -> jnp.ndarray:
    """Uniform color id in the reference's sorted-name order."""
    return jnp.asarray(COLOR_ORDER, jnp.uint8)[jax.random.randint(key, (), 0, 6)]


def room_top(config: EnvConfig, i, j) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Top-left corner of room (i=col, j=row)."""
    s = config.room_size - 1
    return jnp.asarray(i) * s, jnp.asarray(j) * s


def init_plan(key: jax.Array, config: EnvConfig) -> jnp.ndarray:
    """The random door-slot positions of `init` — the only RNG draws in
    the room-grid scaffold. Split out so the lane-major packed generators
    (ops/packed_gen.py) can reuse the identical draw tree while painting
    the (static) walls in the packed layout. Returns `(R, Cc, 4, 2)`."""
    rows, cols, rs = config.num_rows, config.num_cols, config.room_size
    door_pos = jnp.zeros((rows, cols, 4, 2), jnp.int32)
    keys = jax.random.split(key, rows * cols * 2).reshape(rows, cols, 2, 2)
    for j in range(rows):
        for i in range(cols):
            tx, ty = i * (rs - 1), j * (rs - 1)
            if i < cols - 1:  # right wall slot
                y = jax.random.randint(keys[j, i, 0], (), ty + 1, ty + rs - 1)
                door_pos = door_pos.at[j, i, RIGHT].set(
                    jnp.stack([jnp.int32(tx + rs - 1), y])
                )
            if j < rows - 1:  # down wall slot
                x = jax.random.randint(keys[j, i, 1], (), tx + 1, tx + rs - 1)
                door_pos = door_pos.at[j, i, DOWN].set(
                    jnp.stack([x, jnp.int32(ty + rs - 1)])
                )
    # Left/up slots alias the neighbor's right/down positions.
    for j in range(rows):
        for i in range(cols):
            if i > 0:
                door_pos = door_pos.at[j, i, LEFT].set(door_pos[j, i - 1, RIGHT])
            if j > 0:
                door_pos = door_pos.at[j, i, UP].set(door_pos[j - 1, i, DOWN])
    return door_pos


def init(key: jax.Array, config: EnvConfig, base_grid: jnp.ndarray) -> RG:
    """Paint all room walls, draw random door positions, center the agent.

    Mirrors `RoomGrid._gen_grid` (roomgrid.py:~142-200): every room gets a
    `wall_rect`; each right/down shared wall gets a random candidate door
    position (left/up slots alias the neighbor's right/down slot).
    """
    rows, cols, rs = config.num_rows, config.num_cols, config.room_size
    grid = base_grid

    for j in range(rows):
        for i in range(cols):
            tx, ty = i * (rs - 1), j * (rs - 1)
            grid = G.wall_rect(grid, tx, ty, rs, rs)

    door_pos = init_plan(key, config)

    # Agent starts at the center of the middle room facing right
    # (roomgrid.py:~195); env subclasses usually re-place it.
    ax = (cols // 2) * (rs - 1) + rs // 2
    ay = (rows // 2) * (rs - 1) + rs // 2

    return RG(
        grid=grid,
        door_pos=door_pos,
        has_door=jnp.zeros((rows, cols, 4), bool),
        door_locked=jnp.zeros((rows, cols, 4), bool),
        locked=jnp.zeros((rows, cols), bool),
        agent_pos=jnp.asarray([ax, ay], jnp.int32),
    )


def neighbor_exists(config: EnvConfig, i, j, k):
    """Whether room (i, j) has a neighbor across wall slot k (static-shape)."""
    rows, cols = config.num_rows, config.num_cols
    i, j = jnp.asarray(i), jnp.asarray(j)
    return jnp.stack(
        [i < cols - 1, j < rows - 1, i > 0, j > 0]
    )[k]


def _neighbor_idx(i, j, k):
    dx = jnp.asarray(C.DIR_TO_VEC)[k]
    return i + dx[0], j + dx[1]


def add_door(
    rg: RG,
    config: EnvConfig,
    i,
    j,
    k,
    color: jnp.ndarray,
    locked,
) -> RG:
    """Create a door on room (i, j)'s wall slot k (`RoomGrid.add_door`,
    roomgrid.py:~247-290). Registers the door on both rooms."""
    i = jnp.asarray(i, jnp.int32)
    j = jnp.asarray(j, jnp.int32)
    k = jnp.asarray(k, jnp.int32)
    locked = jnp.asarray(locked, bool)
    pos = rg.door_pos[j, i, k]
    state = jnp.where(locked, jnp.uint8(C.STATE_LOCKED), jnp.uint8(C.STATE_CLOSED))
    cell = jnp.stack(
        [jnp.uint8(C.DOOR), jnp.asarray(color, jnp.uint8), state,
         jnp.uint8(0), jnp.uint8(0)]
    )
    grid = G.set_cell(rg.grid, pos[0], pos[1], cell)

    ni, nj = _neighbor_idx(i, j, k)
    has_door = rg.has_door.at[j, i, k].set(True).at[nj, ni, (k + 2) % 4].set(True)
    door_locked = (
        rg.door_locked.at[j, i, k].set(locked)
        .at[nj, ni, (k + 2) % 4].set(locked)
    )
    room_locked = rg.locked.at[j, i].set(rg.locked[j, i] | locked)
    return rg._replace(
        grid=grid, has_door=has_door, door_locked=door_locked, locked=room_locked
    )


def remove_wall(rg: RG, config: EnvConfig, i: int, j: int, k: int) -> RG:
    """Knock out the interior of a shared wall (`RoomGrid.remove_wall`,
    roomgrid.py:~292-330). i/j/k static."""
    rs = config.room_size
    tx, ty = i * (rs - 1), j * (rs - 1)
    grid = rg.grid
    if k == RIGHT:
        grid = G.paint_rect(grid, tx + rs - 1, ty + 1, tx + rs, ty + rs - 1, G.EMPTY_CELL)
    elif k == DOWN:
        grid = G.paint_rect(grid, tx + 1, ty + rs - 1, tx + rs - 1, ty + rs, G.EMPTY_CELL)
    elif k == LEFT:
        grid = G.paint_rect(grid, tx, ty + 1, tx + 1, ty + rs - 1, G.EMPTY_CELL)
    else:  # UP
        grid = G.paint_rect(grid, tx + 1, ty, tx + rs - 1, ty + 1, G.EMPTY_CELL)
    ni, nj = i + int(C.DIR_TO_VEC[k][0]), j + int(C.DIR_TO_VEC[k][1])
    # Mark both rooms as connected through this wall for reachability.
    has_door = rg.has_door.at[j, i, k].set(True).at[nj, ni, (k + 2) % 4].set(True)
    return rg._replace(grid=grid, has_door=has_door)


def room_interior_mask(config: EnvConfig, i, j) -> jnp.ndarray:
    """(H, W) mask of room (i, j)'s full rect (walls excluded implicitly by
    the free-cell test, matching `place_obj(top=room.top, size=room.size)`)."""
    rs = config.room_size
    tx, ty = room_top(config, i, j)
    return sampling.rect_mask(config.height, config.width, tx, ty, rs, rs)


def reject_next_to_mask(config: EnvConfig, agent_pos) -> jnp.ndarray:
    """Reject cells with Manhattan distance < 2 from the agent
    (`reject_next_to`, roomgrid.py:~8-18)."""
    ys = jnp.arange(config.height)[:, None]
    xs = jnp.arange(config.width)[None, :]
    d = jnp.abs(xs - agent_pos[0]) + jnp.abs(ys - agent_pos[1])
    return d >= 2


def place_in_room(
    rg: RG, config: EnvConfig, key: jax.Array, i, j, cell
) -> Tuple[RG, jnp.ndarray, jnp.ndarray]:
    """Place one object cell in room (i, j) (`place_in_room`,
    roomgrid.py:~202-220). Returns (rg, x, y)."""
    mask = (
        sampling.free_cell_mask(rg.grid, rg.agent_pos)
        & room_interior_mask(config, i, j)
        & reject_next_to_mask(config, rg.agent_pos)
    )
    x, y = sampling.sample_cell(key, mask)
    grid = G.set_cell(rg.grid, x, y, cell)
    return rg._replace(grid=grid), x, y


def add_object(
    rg: RG,
    config: EnvConfig,
    key: jax.Array,
    i,
    j,
    kind: Optional[int] = None,
    color: Optional[jnp.ndarray] = None,
) -> Tuple[RG, jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """`RoomGrid.add_object` (roomgrid.py:~222-245): random kind in
    {key, ball, box} / random color when unspecified.
    Returns (rg, type, color, x, y)."""
    k_kind, k_color, k_pos = jax.random.split(key, 3)
    if kind is None:
        kind_arr = jnp.asarray([C.KEY, C.BALL, C.BOX], jnp.uint8)[
            jax.random.randint(k_kind, (), 0, 3)
        ]
    else:
        kind_arr = jnp.asarray(kind, jnp.uint8)
    if color is None:
        color = rand_color(k_color)
    color = jnp.asarray(color, jnp.uint8)
    z = jnp.uint8(0)
    cell = jnp.stack([kind_arr, color, z, z, z])
    rg, x, y = place_in_room(rg, config, k_pos, i, j, cell)
    return rg, kind_arr, color, x, y


def place_agent(
    rg: RG, config: EnvConfig, key: jax.Array, i, j
) -> Tuple[RG, jnp.ndarray]:
    """Re-place the agent in room (i, j) with a random heading.

    `RoomGrid.place_agent` additionally rejects placements whose FRONT cell
    holds an object (it retries until the front cell is empty or a wall) —
    the rejection loop over uniform (pos, dir) proposals converges to the
    uniform distribution over valid (pos, dir) pairs, so we sample that
    directly from an (H, W, 4) validity mask."""
    h, w = config.height, config.width
    free = sampling.free_cell_mask(rg.grid, None) & room_interior_mask(config, i, j)

    # front_ok[y, x, d]: cell one step along d is empty or wall.
    t = rg.grid[:, :, 0]
    ok_cell = (t == C.EMPTY) | (t == C.WALL)
    pad = jnp.zeros((1,) * 0, dtype=bool)  # noqa: F841 (clarity)
    front_ok = jnp.stack(
        [
            jnp.pad(ok_cell[:, 1:], ((0, 0), (0, 1))),  # d=0 right
            jnp.pad(ok_cell[1:, :], ((0, 1), (0, 0))),  # d=1 down
            jnp.pad(ok_cell[:, :-1], ((0, 0), (1, 0))),  # d=2 left
            jnp.pad(ok_cell[:-1, :], ((1, 0), (0, 0))),  # d=3 up
        ],
        axis=-1,
    )
    valid = free[:, :, None] & front_ok  # (H, W, 4)
    flat = valid.reshape(-1)
    logits = jnp.where(flat, 0.0, -jnp.inf)
    logits = jnp.where(jnp.any(flat), logits, jnp.zeros_like(logits))
    idx = jax.random.categorical(key, logits)
    d = idx % 4
    x = (idx // 4) % w
    y = idx // (4 * w)
    rg = rg._replace(agent_pos=jnp.stack([x, y]).astype(jnp.int32))
    return rg, d.astype(jnp.int32)


def connect_plan(
    key: jax.Array,
    config: EnvConfig,
    start_i,
    start_j,
    locked_2d: jnp.ndarray,  # (R, Cc) bool
    has_door0: jnp.ndarray,  # (R, Cc, 4) bool
    max_itrs: int = 5000,
):
    """The randomized door-adding loop of `connect_all`, grid-free: loop
    state is one int32 room-bitmask per slot direction and the
    reachability check is an R*Cc-step shift-OR flood, so one iteration is
    ~30 scalar int-ops per lane. Returns `(has_door_f (R, Cc, 4) bool,
    colors_f (R, Cc, 4) uint8)` for the caller to paint (the packed
    generators paint into the lane-major word layout instead of the
    PyTree grid). Identical draw sequence to the reference's loop."""
    rows, cols = config.num_rows, config.num_cols
    rc = rows * cols
    assert rc <= 30, "room-bitmask packing needs rows*cols <= 30"
    full = (1 << rc) - 1
    right_edge = sum(1 << (j * cols + cols - 1) for j in range(rows))
    left_edge = sum(1 << (j * cols) for j in range(rows))
    room_bits = 1 << jnp.arange(rc, dtype=jnp.int32)  # (RC,)

    def pack(mask_2d):  # (R, Cc) bool -> () int32 bitmask
        return jnp.sum(jnp.where(mask_2d.reshape(-1), room_bits, 0))

    locked_bits = pack(locked_2d)
    hd0 = jnp.stack([pack(has_door0[:, :, k]) for k in range(4)])  # (4,)

    def connected(hd):
        hdr, hdd, hdl, hdu = hd[0], hd[1], hd[2], hd[3]
        reach = jnp.int32(1) << (start_j * cols + start_i)
        for _ in range(rc):
            r = reach
            reach = (
                r
                | ((r & hdr & ~right_edge) << 1)
                | ((r & hdl & ~left_edge) >> 1)
                | ((r & hdd) << cols)
                | ((r & hdu) >> cols)
            ) & full
        return reach == full

    def cond(carry):
        hd, colors, key, itrs = carry
        return ~connected(hd) & (itrs < max_itrs)

    # Draws are processed in UNROLLED blocks of `_DRAW_BLOCK` per
    # while-iteration: under vmap the batched while_loop runs to the
    # SLOWEST lane (median ~20 draws, max ~130 on KeyCorridorS6R3) and
    # each while-iteration carries a large fixed dispatch cost on TPU —
    # measured ~1.6 ms/iteration at B=32k, 214 ms total, the dominant
    # cost of RoomGrid generation. Unrolling cuts the iteration count
    # ~16x. Byte-exact: each unrolled draw re-derives the per-lane stop
    # (`done`) and gates every state update on it — exactly the masking
    # vmap's while-batching applies per iteration — and a stopped lane's
    # post-convergence key splits are never consumed.
    def body(carry):
        hd, colors, key, itrs = carry
        for _ in range(_DRAW_BLOCK):
            done = connected(hd) | (itrs >= max_itrs)
            key, k_i, k_j, k_k, k_c = jax.random.split(key, 5)
            i = jax.random.randint(k_i, (), 0, cols)
            j = jax.random.randint(k_j, (), 0, rows)
            k = jax.random.randint(k_k, (), 0, 4)
            ni, nj = _neighbor_idx(i, j, k)
            nim, njm = ni % cols, nj % rows
            bit = jnp.int32(1) << (j * cols + i)
            nbit = jnp.int32(1) << (njm * cols + nim)
            ok = (
                ~done
                & neighbor_exists(config, i, j, k)
                & ((hd[k] & bit) == 0)
                & ((locked_bits & bit) == 0)
                & ((locked_bits & nbit) == 0)
            )
            color = rand_color(k_c)
            ksym = (k + 2) % 4
            hd = hd.at[k].set(hd[k] | jnp.where(ok, bit, 0))
            hd = hd.at[ksym].set(hd[ksym] | jnp.where(ok, nbit, 0))
            # Flat (R*Cc*4,) color vector; two one-hot selects per accept.
            slot = (j * cols + i) * 4 + k
            nslot = (njm * cols + nim) * 4 + ksym
            idx = jnp.arange(rc * 4)
            colors = jnp.where(
                ok & ((idx == slot) | (idx == nslot)), color, colors
            )
            itrs = itrs + jnp.where(done, 0, 1)
        return hd, colors, key, itrs

    colors0 = jnp.zeros((rc * 4,), jnp.uint8)
    hd_f, colors_flat, _, _ = lax.while_loop(
        cond, body, (hd0, colors0, key, jnp.int32(0))
    )
    has_door_f = (
        ((hd_f[None, :] >> jnp.arange(rc, dtype=jnp.int32)[:, None]) & 1)
        .astype(bool)
        .reshape(rows, cols, 4)
    )
    colors_f = colors_flat.reshape(rows, cols, 4)
    return has_door_f, colors_f


def connect_all(
    rg: RG, config: EnvConfig, key: jax.Array, max_itrs: int = 5000
) -> RG:
    """Randomly add unlocked doors until every room is reachable from the
    agent's room (`RoomGrid.connect_all`, roomgrid.py:~332-375).

    Under `vmap` the while_loop iterates until the SLOWEST lane converges
    (median ~20, tail ~100+ draws), so per-iteration state size is
    everything. Two rewrites vs the naive port: (1) the loop never touches
    the `(H, W, 5)` grid — accepted doors are painted ONCE afterwards
    (≤ R·Cc·2 shared walls, statically unrolled); (2) the loop state is
    BIT-PACKED per lane — door existence is one int32 room-bitmask per
    slot direction (bit j·Cc+i = room (i,j)) and the reachability flood is
    R·Cc shift-OR steps on those masks, so one iteration is ~30 scalar
    int-ops per lane instead of scatters into padded (R, Cc, 4) arrays
    (which made batched KeyCorridorS6R3 generation ~170× slower than
    MultiRoom). Identical draw sequence, identical final layout."""
    rows, cols, rs = config.num_rows, config.num_cols, config.room_size
    start_i = rg.agent_pos[0] // (rs - 1)
    start_j = rg.agent_pos[1] // (rs - 1)
    # Clamp to the last room for positions on the final shared wall line.
    start_i = jnp.minimum(start_i, cols - 1)
    start_j = jnp.minimum(start_j, rows - 1)
    has_door_f, colors_f = connect_plan(
        key, config, start_i, start_j, rg.locked, rg.has_door,
        max_itrs=max_itrs,
    )
    # Paint the added doors (every shared wall is some room's right/down
    # slot; the symmetric registration above guarantees the accepting
    # room's slot carries the color).
    grid = rg.grid
    for j in range(rows):
        for i in range(cols):
            for k in (RIGHT, DOWN):
                if (k == RIGHT and i >= cols - 1) or (k == DOWN and j >= rows - 1):
                    continue
                new = has_door_f[j, i, k] & ~rg.has_door[j, i, k]
                pos = rg.door_pos[j, i, k]
                cell = jnp.stack(
                    [jnp.uint8(C.DOOR), colors_f[j, i, k],
                     jnp.uint8(C.STATE_CLOSED), jnp.uint8(0), jnp.uint8(0)]
                )
                # Masked write, no gather of the old cell (vmapped dynamic
                # gathers cost more than a full-grid where — core/grid.py
                # set_cell note).
                grid = jnp.where(
                    new, G.set_cell(grid, pos[0], pos[1], cell), grid
                )
    return rg._replace(grid=grid, has_door=has_door_f)
