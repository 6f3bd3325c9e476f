"""Multi-room environment — the reference's hardest generator.

Reference: `MultiRoomEnv` (envs/multiroom.py:~1-180) — a chain of
`minNumRooms..maxNumRooms` rooms of random size ≤ `maxRoomSize` connected by
colored doors (consecutive doors differ in color), built by recursive
backtracking `_placeRoom`, retried from scratch (keeping the longest chain)
until enough rooms fit. Agent starts in the first room; goal in the last.

Device rewrite with fixed shapes:
  * the recursion is linear (a room chain), and a child call fails only at
    its own placement check, so it flattens to: for each next room, up to 8
    (exit-wall, exit-pos, size, top) draws, first valid wins — an unrolled
    8-way masked select;
  * the outer retry-until-enough-rooms loop becomes `lax.while_loop`
    keeping the longest chain in the carry;
  * room walls/doors are painted afterward with dynamic-bounds
    `paint_rect` outlines masked by the live room count.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from minigrid_tpu.core import constants as C
from minigrid_tpu.core import grid as G
from minigrid_tpu.core import sampling
from minigrid_tpu.core.state import EnvConfig, EnvState, empty_state
from minigrid_tpu.core.step import base_step
from minigrid_tpu.envs import missions
from minigrid_tpu.envs.roomgrid import COLOR_ORDER

MISSION = missions.register_template("traverse the rooms to get to the goal")

MAX_ATTEMPTS = 200  # outer retry bound (reference loops unboundedly)


class Chain(NamedTuple):
    tops: jnp.ndarray  # (N, 2) int32
    sizes: jnp.ndarray  # (N, 2) int32
    entry: jnp.ndarray  # (N, 2) int32 — entry door position per room (idx>0 valid)
    count: jnp.ndarray  # () int32


def _try_chain(key: jax.Array, config: EnvConfig, num_rooms: jnp.ndarray) -> Chain:
    """One full attempt at building a room chain (≡ one `_placeRoom`
    recursion from a fresh entry position)."""
    w, h = config.width, config.height
    nmax = config.max_num_rooms
    min_sz, max_sz = 4, config.max_room_size

    tops = jnp.zeros((nmax, 2), jnp.int32)
    sizes = jnp.zeros((nmax, 2), jnp.int32)
    entry = jnp.zeros((nmax, 2), jnp.int32)

    keys = jax.random.split(key, 3 + nmax * 8 * 5).reshape(-1, 2)
    kidx = 0

    def draw(lo, hi, i):
        return jax.random.randint(keys[i], (), lo, hi, dtype=jnp.int32)

    # First room: entryDoorPos is a fresh random point; top = that point.
    ex = draw(0, w - 2, 0)
    ey = draw(0, w - 2, 1)
    sx = draw(min_sz, max_sz + 1, 2)
    # NOTE: reference draws sizeX then sizeY from the same stream; keys are
    # independent here (distribution-equivalent).
    kidx = 3
    sy = jax.random.randint(keys[kidx], (), min_sz, max_sz + 1, dtype=jnp.int32)
    kidx += 1
    # entryDoorWall=2 (left): topX = ex, topY = rand(ey - sy + 2, ey) — but
    # for the FIRST room the reference uses top = entryDoorPos directly.
    first_ok = (ex >= 0) & (ey >= 0) & (ex + sx <= w) & (ey + sy < h)
    tops = tops.at[0].set(jnp.stack([ex, ey]))
    sizes = sizes.at[0].set(jnp.stack([sx, sy]))
    entry = entry.at[0].set(jnp.stack([ex, ey]))
    count = jnp.where(first_ok, 1, 0)
    entry_wall = jnp.int32(2)

    def overlap_any(tx, ty, sx_, sy_, tops, sizes, upto):
        """Strict overlap test vs rooms [0, upto) (reference's
        `roomList[:-1]` check; upto excludes the parent)."""
        idx = jnp.arange(nmax)
        ox, oy = tops[:, 0], tops[:, 1]
        osx, osy = sizes[:, 0], sizes[:, 1]
        non_overlap = (
            (tx + sx_ < ox) | (ox + osx <= tx) | (ty + sy_ < oy) | (oy + osy <= ty)
        )
        return jnp.any((idx < upto) & ~non_overlap)

    # Rooms 1..nmax-1: 8 tries each, first valid wins.
    for i in range(1, nmax):
        parent_tx, parent_ty = tops[i - 1, 0], tops[i - 1, 1]
        parent_sx, parent_sy = sizes[i - 1, 0], sizes[i - 1, 1]
        placed = jnp.zeros((), bool)
        # Chain alive, needs room i, and the target count isn't reached yet
        # (the reference stops recursing at numLeft == 1).
        need = (count == i) & (jnp.int32(i) < num_rooms)
        for t in range(8):
            base = kidx + 5 * (8 * (i - 1) + t)
            # Exit wall: rand over sorted({0,1,2,3} \ {entry_wall}).
            r = jax.random.randint(keys[base], (), 0, 3, dtype=jnp.int32)
            exit_wall = jnp.where(r >= entry_wall, r + 1, r)
            # Exit door position on the parent's exit wall.
            rx = jax.random.randint(keys[base + 1], (), 1, jnp.maximum(2, parent_sx - 1))
            ry = jax.random.randint(keys[base + 1], (), 1, jnp.maximum(2, parent_sy - 1))
            exit_x = jnp.select(
                [exit_wall == 0, exit_wall == 1, exit_wall == 2, exit_wall == 3],
                [parent_tx + parent_sx - 1, parent_tx + rx, parent_tx, parent_tx + rx],
            )
            exit_y = jnp.select(
                [exit_wall == 0, exit_wall == 1, exit_wall == 2, exit_wall == 3],
                [parent_ty + ry, parent_ty + parent_sy - 1, parent_ty + ry, parent_ty],
            )
            next_entry_wall = (exit_wall + 2) % 4
            # Child size + top.
            csx = jax.random.randint(keys[base + 2], (), min_sz, max_sz + 1)
            csy = jax.random.randint(keys[base + 3], (), min_sz, max_sz + 1)
            off = jax.random.randint(keys[base + 4], (), 0, jnp.maximum(1, jnp.where(
                (next_entry_wall == 0) | (next_entry_wall == 2), csy - 2, csx - 2)))
            # top per entry wall (reference _placeRoom's 4-way branch):
            #   wall 0 (entry on child's right): topX = ex-csx+1, topY = ey-csy+2+off
            #   wall 1 (south): topX = ex-csx+2+off, topY = ey-csy+1
            #   wall 2 (left):  topX = ex,          topY = ey-csy+2+off
            #   wall 3 (top):   topX = ex-csx+2+off, topY = ey
            ctx = jnp.select(
                [next_entry_wall == 0, next_entry_wall == 1,
                 next_entry_wall == 2, next_entry_wall == 3],
                [exit_x - csx + 1, exit_x - csx + 2 + off, exit_x,
                 exit_x - csx + 2 + off],
            )
            cty = jnp.select(
                [next_entry_wall == 0, next_entry_wall == 1,
                 next_entry_wall == 2, next_entry_wall == 3],
                [exit_y - csy + 2 + off, exit_y - csy + 1, exit_y - csy + 2 + off,
                 exit_y],
            )
            in_bounds = (ctx >= 0) & (cty >= 0) & (ctx + csx <= w) & (cty + csy < h)
            ok = (
                need
                & ~placed
                & in_bounds
                & ~overlap_any(ctx, cty, csx, csy, tops, sizes, i - 1)
            )
            tops = jnp.where(ok, tops.at[i].set(jnp.stack([ctx, cty])), tops)
            sizes = jnp.where(ok, sizes.at[i].set(jnp.stack([csx, csy])), sizes)
            entry = jnp.where(ok, entry.at[i].set(jnp.stack([exit_x, exit_y])), entry)
            entry_wall = jnp.where(ok, next_entry_wall, entry_wall)
            placed = placed | ok
        count = jnp.where(placed, i + 1, count)

    return Chain(tops, sizes, entry, count)


class Plan(NamedTuple):
    """Everything `generate` decides BEFORE touching the grid: the room
    chain, per-room door colors, and the grid-dependent sampling keys.
    Shared verbatim by the PyTree painter (`generate`) and the lane-major
    packed painter (`generate_packed`) so their RNG call trees — and
    therefore their layouts — are byte-identical."""

    k_reset: jnp.ndarray  # (2,) uint32 — the state's reset-chain subkey
    chain: Chain
    door_colors: jnp.ndarray  # (nmax,) uint8 (row i valid for 1 <= i < n)
    k_agent: jnp.ndarray  # (2,) uint32 — agent cell draw
    agent_dir: jnp.ndarray  # () int32
    k_goal: jnp.ndarray  # (2,) uint32 — goal cell draw


def _door_colors(k2: jax.Array, n: jnp.ndarray, nmax: int) -> jnp.ndarray:
    """Entry-door colors: consecutive-distinct, drawn in the reference's
    sorted-color-list coordinates (no grid dependency)."""
    door_keys = jax.random.split(k2, nmax)
    prev_sorted = jnp.int32(-1)
    color_order = jnp.asarray(COLOR_ORDER, jnp.uint8)
    door_colors = jnp.zeros((nmax,), jnp.uint8)
    for i in range(1, nmax):
        act = i < n
        has_prev = prev_sorted >= 0
        r6 = jax.random.randint(door_keys[i], (), 0, 6)
        r5 = jax.random.randint(door_keys[i], (), 0, 5)
        pick = jnp.where(has_prev, jnp.where(r5 >= prev_sorted, r5 + 1, r5), r6)
        door_colors = door_colors.at[i].set(color_order[pick])
        prev_sorted = jnp.where(act, pick, prev_sorted)
    return door_colors


def _plan_batched(keys: jnp.ndarray, config: EnvConfig, backend: str = "xla"):
    """Batched `_plan`. `backend="kernel"` routes the retry/`_try_chain`
    loop (93% of MultiRoom generation time at B=32k: 64.5 of 69 ms)
    through the Pallas loop (`ops.gen_kernel.multiroom_chain_batched`,
    bit-identical — tests/test_gen_kernel.py), but the DEFAULT is the
    vmapped XLA loop: measured on v5e (B=32k), the kernel is ~18%
    SLOWER (73.7 vs 62.4 ms plan; regen row 30.9M vs 33.1M steps/s).
    Unlike KeyCorridor's `connect_plan` (many tiny draws — dispatch-
    bound, 6.9x kernel win), MultiRoom's plan is COMPUTE-bound on the
    Threefry cipher itself (~620 cipher blocks per attempt across 124
    derived keys), which XLA already runs at roofline; the kernel adds
    block-granularity tail iterations without removing any work. Kept
    as an equivalence-tested negative result bounding the in-kernel
    generation design space."""
    if backend == "xla":
        return jax.vmap(lambda k: _plan(k, config))(keys)
    from minigrid_tpu.ops.gen_kernel import multiroom_chain_batched

    nmax = config.max_num_rooms

    def outer(key):
        key, k_reset = jax.random.split(key)
        ks = jax.random.split(key, 6)
        num_rooms = jax.random.randint(
            ks[0], (), config.min_num_rooms, config.max_num_rooms + 1
        )
        return k_reset, ks, num_rooms

    k_reset, ks, num_rooms = jax.vmap(outer)(keys)
    tops, sizes, entry, count = multiroom_chain_batched(
        ks[:, 1], num_rooms, config, MAX_ATTEMPTS
    )
    chain = Chain(tops, sizes, entry, count)
    door_colors = jax.vmap(lambda k, n: _door_colors(k, n, nmax))(
        ks[:, 2], count
    )
    agent_dir = jax.vmap(sampling.sample_direction)(ks[:, 4])
    return Plan(
        k_reset=k_reset,
        chain=chain,
        door_colors=door_colors,
        k_agent=ks[:, 3],
        agent_dir=agent_dir,
        k_goal=ks[:, 5],
    )


def _plan(key: jax.Array, config: EnvConfig) -> Plan:
    nmax = config.max_num_rooms
    key, k_reset = jax.random.split(key)

    ks = jax.random.split(key, 6)
    num_rooms = jax.random.randint(
        ks[0], (), config.min_num_rooms, config.max_num_rooms + 1
    )

    # Retry keeping the longest chain until it has num_rooms rooms.
    def cond(carry):
        best, key, itrs = carry
        return (best.count < num_rooms) & (itrs < MAX_ATTEMPTS)

    def body(carry):
        best, key, itrs = carry
        key, sub = jax.random.split(key)
        cand = _try_chain(sub, config, num_rooms)
        better = cand.count > best.count
        best = jax.tree.map(lambda a, b: jnp.where(better, a, b), cand, best)
        return best, key, itrs + 1

    empty_chain = Chain(
        jnp.zeros((nmax, 2), jnp.int32),
        jnp.zeros((nmax, 2), jnp.int32),
        jnp.zeros((nmax, 2), jnp.int32),
        jnp.zeros((), jnp.int32),
    )
    chain, _, _ = lax.while_loop(cond, body, (empty_chain, ks[1], jnp.int32(0)))
    n = chain.count  # dynamic <= nmax

    door_colors = _door_colors(ks[2], n, nmax)

    return Plan(
        k_reset=k_reset,
        chain=chain,
        door_colors=door_colors,
        k_agent=ks[3],
        agent_dir=sampling.sample_direction(ks[4]),
        k_goal=ks[5],
    )


def generate(key: jax.Array, config: EnvConfig) -> EnvState:
    plan = _plan(key, config)
    chain, n = plan.chain, plan.chain.count
    state = empty_state(config, rng=plan.k_reset)
    w, h = config.width, config.height
    nmax = config.max_num_rooms

    # Paint room wall outlines (active rooms only).
    grid = state.grid
    for i in range(nmax):
        act = i < n
        tx, ty = chain.tops[i, 0], chain.tops[i, 1]
        sx, sy = chain.sizes[i, 0], chain.sizes[i, 1]
        x1 = jnp.where(act, tx + sx, tx)
        y1 = jnp.where(act, ty + sy, ty)
        grid = G.paint_rect(grid, tx, ty, x1, ty + 1, G.WALL_CELL)
        grid = G.paint_rect(grid, tx, jnp.where(act, ty + sy - 1, ty), x1,
                            y1, G.WALL_CELL)
        grid = G.paint_rect(grid, tx, ty, tx + 1, y1, G.WALL_CELL)
        grid = G.paint_rect(grid, jnp.where(act, tx + sx - 1, tx), ty, x1,
                            y1, G.WALL_CELL)

    # Entry doors (colors precomputed in the plan).
    for i in range(1, nmax):
        act = i < n
        cell = jnp.stack(
            [jnp.uint8(C.DOOR), plan.door_colors[i],
             jnp.uint8(C.STATE_CLOSED), jnp.uint8(0), jnp.uint8(0)]
        )
        ex, ey = chain.entry[i, 0], chain.entry[i, 1]
        # Masked write instead of gather-then-scatter: `act` folds into one
        # (H, W, 5) where (the per-lane dynamic gather of the old cell cost
        # more than the whole wall paint under vmap).
        grid = jnp.where(act, G.set_cell(grid, ex, ey, cell), grid)

    # Agent in room 0; goal in the last room.
    t0, s0 = chain.tops[0], chain.sizes[0]
    mask0 = sampling.rect_mask(h, w, t0[0], t0[1], s0[0], s0[1])
    ax, ay = sampling.sample_cell(
        plan.k_agent, sampling.free_cell_mask(grid, None) & mask0
    )
    agent_pos = jnp.stack([ax, ay])

    tl = chain.tops[jnp.maximum(n - 1, 0)]
    sl = chain.sizes[jnp.maximum(n - 1, 0)]
    maskl = sampling.rect_mask(h, w, tl[0], tl[1], sl[0], sl[1])
    gx, gy = sampling.sample_cell(
        plan.k_goal, sampling.free_cell_mask(grid, agent_pos) & maskl
    )
    grid = G.set_cell(grid, gx, gy, (C.GOAL, C.GREEN, 0, 0, 0))

    return state.replace(
        grid=grid,
        agent_pos=agent_pos,
        agent_dir=plan.agent_dir,
        mission=jnp.asarray(missions.encode(MISSION)),
    )


def generate_packed(keys: jnp.ndarray, config: EnvConfig):
    """Lane-major batched generation (ops/packed_gen.py): the scalar plan
    is the vmap'd `_plan` (byte-identical RNG), the paint runs on
    `(HW, B)` int32 words. Byte-exact vs
    `_pack_rolled(cfg, vmap(generate)(keys))` (tests/test_packed_gen.py).
    """
    from minigrid_tpu.ops import packed_gen as PG

    w, h = config.width, config.height
    nmax = config.max_num_rooms
    b = keys.shape[0]
    plan = _plan_batched(keys, config)
    chain, n = plan.chain, plan.chain.count  # arrays (B, ...), (B,)

    xs, ys = PG.xy_iota(h, w)
    words = PG.empty_words(h, w, b)

    # Room wall outlines: one fused border mask per room slot.
    for i in range(nmax):
        words = PG.outline_rect_words(
            words, xs, ys,
            chain.tops[:, i, 0], chain.tops[:, i, 1],
            chain.sizes[:, i, 0], chain.sizes[:, i, 1],
            PG.WALL_WORD, active=i < n,
        )

    # Entry doors.
    door_word_base = C.DOOR | (C.STATE_CLOSED << 8)
    for i in range(1, nmax):
        word = door_word_base | (
            plan.door_colors[:, i].astype(jnp.int32) << 4
        )
        words = PG.set_cell_words(
            words, xs, ys, chain.entry[:, i, 0], chain.entry[:, i, 1],
            word, active=i < n,
        )

    # Agent in room 0; goal in the last room.
    mask0 = PG.rect_mask_words(
        xs, ys, chain.tops[:, 0, 0], chain.tops[:, 0, 1],
        chain.sizes[:, 0, 0], chain.sizes[:, 0, 1],
    )
    ax, ay = PG.sample_cell_words(
        plan.k_agent, PG.free_mask_words(words, xs, ys) & mask0, w
    )

    last = jnp.maximum(n - 1, 0)[:, None, None]
    tl = jnp.take_along_axis(chain.tops, last, axis=1)[:, 0, :]  # (B, 2)
    sl = jnp.take_along_axis(chain.sizes, last, axis=1)[:, 0, :]
    maskl = PG.rect_mask_words(xs, ys, tl[:, 0], tl[:, 1], sl[:, 0], sl[:, 1])
    gx, gy = PG.sample_cell_words(
        plan.k_goal, PG.free_mask_words(words, xs, ys, ax, ay) & maskl, w
    )
    words = PG.set_cell_words(words, xs, ys, gx, gy, PG.GOAL_WORD)

    regs = PG.build_regs(
        b, ax, ay, plan.agent_dir, plan.k_reset,
        mission=jnp.asarray(missions.encode(MISSION)),
    )
    return PG.finish_packed(words, regs, w)


step = base_step
