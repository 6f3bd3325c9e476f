"""Lane-major layout generation: paint directly into the packed
`(HW, B)` int32 word layout.

Generation was the last subsystem still running in the PyTree layout
(`vmap(env.generate)` over `(H, W, 5)` uint8 grids, then `_pack_rolled`)
— the same layout whose poor lane occupancy ceilings the vmap step
engine, and regen-mode throughput is generation-bound on procedural
families (BASELINE.md: MultiRoom-N4 27.1M regen vs 91.9M cached). This
module applies the step kernel's batch-in-lanes move to generation:

  * the per-lane SCALAR plan (RNG draws, room-chain building, color
    picks) stays exactly the family's existing code, `vmap`'d — it is
    `(B,)` arithmetic either way, and reusing the very same
    `jax.random.*` call tree makes the packed generator BYTE-EXACT vs
    `_pack_rolled(cfg, vmap(generate)(keys))` (asserted per family in
    tests/test_packed_gen.py);
  * the grid PAINT phase runs on `(HW, B)` int32 words — each
    paint/sample primitive is one fused elementwise op over a
    `(sublanes=HW, lanes=B)` block that tiles cleanly onto the VPU,
    instead of per-lane masked writes on `(H, W, 5)` uint8 arrays whose
    tiny minor dims (W, 5) waste most of every vreg.

A family opts in by providing `Env.generate_packed(keys, cfg) ->
(words, regs)` (agent-center-rolled words, `pack_states` reg layout);
`ops.chunked_regen.masked_template_refresh` and `packed_init`'s template
build then use it in place of `vmap(generate)` + `_pack_rolled`.

Cell words follow `ops.fused_rollout.pack_states`:
`type | color<<4 | state<<8 | extra0<<12 | extra1<<16`.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from minigrid_tpu.core import constants as C


def cell_word(typ: int, color: int = 0, state: int = 0) -> int:
    """Static cell -> packed int32 word (pack_states encoding)."""
    return typ | (color << 4) | (state << 8)


EMPTY_WORD = cell_word(C.EMPTY)
WALL_WORD = cell_word(C.WALL, C.GREY)
GOAL_WORD = cell_word(C.GOAL, C.GREEN)


def xy_iota(height: int, width: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Flat-cell coordinate columns: `(HW, 1)` xs and ys (row-major,
    cell k = (y, x) = (k // W, k % W) — `pack_states`' flattening)."""
    hw = height * width
    k = jax.lax.broadcasted_iota(jnp.int32, (hw, 1), 0)
    return k % width, k // width


def empty_words(height: int, width: int, b: int) -> jnp.ndarray:
    """All-empty `(HW, B)` grid words (`core.state.empty_state`'s grid)."""
    return jnp.full((height * width, b), EMPTY_WORD, jnp.int32)


def paint_rect_words(
    words: jnp.ndarray, xs, ys, x0, y0, x1, y1, word,
) -> jnp.ndarray:
    """Fill `x0 <= x < x1 and y0 <= y < y1` with `word` per lane — the
    packed `core.grid.paint_rect`. Bounds are `(B,)` or scalar; an empty
    range paints nothing (same clamping-free semantics)."""
    x0, y0, x1, y1 = (jnp.asarray(v)[None, :] if jnp.ndim(v) else v
                      for v in (x0, y0, x1, y1))
    mask = (xs >= x0) & (xs < x1) & (ys >= y0) & (ys < y1)
    return jnp.where(mask, word, words)


def outline_rect_words(
    words: jnp.ndarray, xs, ys, tx, ty, sx, sy, word, active=None,
) -> jnp.ndarray:
    """Paint a rectangular outline `[t, t+s)` (the four `paint_rect`
    strips of a room's walls) in ONE fused mask: on the border of the
    rect but inside it. `active` (B,) bool masks whole lanes."""
    tx, ty, sx, sy = (jnp.asarray(v)[None, :] if jnp.ndim(v) else v
                      for v in (tx, ty, sx, sy))
    inside = (xs >= tx) & (xs < tx + sx) & (ys >= ty) & (ys < ty + sy)
    border = (
        (xs == tx) | (xs == tx + sx - 1) | (ys == ty) | (ys == ty + sy - 1)
    )
    mask = inside & border
    if active is not None:
        mask &= jnp.asarray(active)[None, :]
    return jnp.where(mask, word, words)


def set_cell_words(words: jnp.ndarray, xs, ys, x, y, word, active=None):
    """Write one cell per lane (`core.grid.set_cell` as a masked where)."""
    x = jnp.asarray(x)[None, :] if jnp.ndim(x) else x
    y = jnp.asarray(y)[None, :] if jnp.ndim(y) else y
    mask = (xs == x) & (ys == y)
    if active is not None:
        mask &= jnp.asarray(active)[None, :]
    if jnp.ndim(word):
        word = jnp.asarray(word)[None, :]
    return jnp.where(mask, word, words)


def rect_mask_words(xs, ys, top_x, top_y, size_x, size_y) -> jnp.ndarray:
    """`(HW, B)` bool of cells inside `[top, top+size)` per lane
    (`core.sampling.rect_mask`, incl. its clamp of `top` at 0)."""
    top_x = jnp.maximum(jnp.asarray(top_x), 0)[None, :]
    top_y = jnp.maximum(jnp.asarray(top_y), 0)[None, :]
    size_x = jnp.asarray(size_x)[None, :] if jnp.ndim(size_x) else size_x
    size_y = jnp.asarray(size_y)[None, :] if jnp.ndim(size_y) else size_y
    return (
        (xs >= top_x) & (xs < top_x + size_x)
        & (ys >= top_y) & (ys < top_y + size_y)
    )


def free_mask_words(
    words: jnp.ndarray, xs, ys, agent_x=None, agent_y=None,
) -> jnp.ndarray:
    """`(HW, B)` bool — empty cells, optionally excluding the agent's
    (`core.sampling.free_cell_mask`)."""
    free = (words & 15) == C.EMPTY
    if agent_x is not None:
        free &= ~((xs == jnp.asarray(agent_x)[None, :])
                  & (ys == jnp.asarray(agent_y)[None, :]))
    return free


def sample_cell_words(
    keys: jnp.ndarray, mask: jnp.ndarray, width: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-lane uniform draw over True cells of an `(HW, B)` mask ->
    `(x, y)` `(B,)` int32 — BYTE-EXACT vs `vmap(core.sampling.sample_cell)`
    (same flat order, same all-False fallback, same
    `jax.random.categorical` call per lane key)."""
    flat = mask.T  # (B, HW) — lane-major rows for the per-lane draw
    any_valid = jnp.any(flat, axis=1, keepdims=True)
    logits = jnp.where(flat, 0.0, -jnp.inf)
    logits = jnp.where(any_valid, logits, jnp.zeros_like(logits))
    idx = jax.vmap(jax.random.categorical)(keys, logits)
    y, x = idx // width, idx % width
    return x.astype(jnp.int32), y.astype(jnp.int32)


def build_regs(
    b: int,
    agent_x: jnp.ndarray,
    agent_y: jnp.ndarray,
    agent_dir: jnp.ndarray,
    rng: jnp.ndarray,  # (B, 2) uint32
    mission: Optional[jnp.ndarray] = None,  # (MISSION_LEN,) or (B, L) int32
    aux: Optional[jnp.ndarray] = None,  # (B, AUX_LEN) int32
    carrying: Optional[jnp.ndarray] = None,  # (B, 4) int32
) -> jnp.ndarray:
    """`(NUM_REGS, B)` register block in `pack_states`' row layout for a
    fresh (step_count 0) generated state."""
    from minigrid_tpu.core.state import AUX_LEN, MISSION_LEN
    from minigrid_tpu.ops.fused_rollout import key_rows

    zeros = jnp.zeros((1, b), jnp.int32)
    carry = (
        jnp.zeros((4, b), jnp.int32) if carrying is None
        else jnp.asarray(carrying, jnp.int32).T
    )
    if aux is None:
        aux_rows = jnp.zeros((AUX_LEN, b), jnp.int32)
    else:
        aux_rows = jnp.asarray(aux, jnp.int32).T
    if mission is None:
        mis_rows = jnp.zeros((MISSION_LEN, b), jnp.int32)
    elif mission.ndim == 1:
        mis_rows = jnp.broadcast_to(
            jnp.asarray(mission, jnp.int32)[:, None], (MISSION_LEN, b)
        )
    else:
        mis_rows = jnp.asarray(mission, jnp.int32).T
    return jnp.concatenate(
        [
            agent_x[None, :].astype(jnp.int32),
            agent_y[None, :].astype(jnp.int32),
            agent_dir[None, :].astype(jnp.int32),
            carry,
            zeros,  # step_count
            aux_rows,
            mis_rows,
            key_rows(rng),
        ]
    )


def finish_packed(
    words: jnp.ndarray, regs: jnp.ndarray, width: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Apply the one-time agent-centering roll (`_pack_rolled`'s second
    half): row 0 becomes the agent's cell."""
    from minigrid_tpu.ops.fused_rollout import _agent_base, _roll_to_base

    return _roll_to_base(words, _agent_base(regs, width)), regs


def get_packed_generator(env):
    """The family's lane-major generator `(keys (B,2) u32, cfg) ->
    (rolled words, regs)`, or None — resolved from the family module's
    optional `generate_packed`. Callers fall back to
    `_pack_rolled(cfg, vmap(generate)(keys))`; the two are byte-exact
    where a packed generator exists (tests/test_packed_gen.py)."""
    import importlib

    try:
        mod = importlib.import_module(
            f"minigrid_tpu.envs.{env.config.family}"
        )
    except ImportError:
        return None
    return getattr(mod, "generate_packed", None)


def place_agent_words(
    keys: jnp.ndarray,  # (B, 2) uint32
    words: jnp.ndarray,  # (HW, B)
    xs, ys,
    interior_mask: jnp.ndarray,  # (HW, 1) or (HW, B) bool
    width: int,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Packed `roomgrid.place_agent`: jointly sample (pos, dir) uniformly
    over free cells whose FRONT cell is empty-or-wall — byte-exact vs the
    vmap path (same `(y*W + x)*4 + d` flat order, same all-False
    fallback). Returns `(x, y, dir)` `(B,)` int32."""
    hw, b = words.shape
    t = words & 15
    ok_cell = ((t == C.EMPTY) | (t == C.WALL)).T  # (B, HW) — lane-major:
    # the (B, HW*4) flat logits the per-lane draw consumes are built
    # without ever materializing a (HW, 4, B) -> (B, HW, 4) relayout
    # (that transpose alone cost more than the whole vmap place_agent).
    free = (free_mask_words(words, xs, ys) & interior_mask).T  # (B, HW)
    xrow = xs[:, 0][None, :]  # (1, HW)
    zrow = jnp.zeros((b, 1), bool)
    zcol = jnp.zeros((b, width), bool)
    # Front-cell lookup as flat-row shifts; row-crossing artifacts masked
    # by the x-bound tests (matching the vmap path's jnp.pad semantics).
    right = jnp.concatenate([ok_cell[:, 1:], zrow], 1) & (xrow < width - 1)
    down = jnp.concatenate([ok_cell[:, width:], zcol], 1)
    left = jnp.concatenate([zrow, ok_cell[:, :-1]], 1) & (xrow > 0)
    up = jnp.concatenate([zcol, ok_cell[:, :-width]], 1)
    valid = jnp.stack(
        [right & free, down & free, left & free, up & free], axis=-1
    )  # (B, HW, 4)
    flat = valid.reshape(b, hw * 4)
    any_valid = jnp.any(flat, axis=1, keepdims=True)
    logits = jnp.where(flat, 0.0, -jnp.inf)
    logits = jnp.where(any_valid, logits, jnp.zeros_like(logits))
    idx = jax.vmap(jax.random.categorical)(keys, logits)
    d = (idx % 4).astype(jnp.int32)
    x = ((idx // 4) % width).astype(jnp.int32)
    y = (idx // (4 * width)).astype(jnp.int32)
    return x, y, d


def reject_next_to_words(xs, ys, agent_x, agent_y) -> jnp.ndarray:
    """Packed `roomgrid.reject_next_to_mask`: Manhattan distance >= 2 from
    the agent. `agent_x/y` scalar or (B,)."""
    ax = jnp.asarray(agent_x)
    ay = jnp.asarray(agent_y)
    if ax.ndim:
        ax, ay = ax[None, :], ay[None, :]
    return (jnp.abs(xs - ax) + jnp.abs(ys - ay)) >= 2
