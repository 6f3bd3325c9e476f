"""Functional grid operations.

The reference `Grid` (minigrid.py:~367-640) is a flat Python list of
`WorldObj` with imperative helpers (`set/get`, `horz_wall`, `wall_rect`,
`rotate_left`, `slice`, `encode/decode`). Here a grid is a `(H, W, 5)` uint8
array and every helper is a pure function returning a new array; all of them
trace to gathers/scatters/dynamic-slices that XLA fuses into the surrounding
kernels.

Coordinate convention matches the reference: a cell is addressed as
`(x, y)` where `x` is the column and `y` is the row, i.e. array index
`grid[y, x]`. Rotations operate on the `[row, col]` layout, for which the
reference's `Grid.rotate_left` (minigrid.py:~450-465) is exactly
`jnp.rot90(a, k=1)` (90° CCW in x-right/y-down pixel coordinates).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from jax import lax

from minigrid_tpu.core import constants as C
from minigrid_tpu.core.state import CH_COLOR, CH_STATE, CH_TYPE, NUM_CHANNELS


def make_cell(
    type_idx: int, color_idx: int = 0, state_idx: int = 0,
    cont_type: int = 0, cont_color: int = 0,
) -> jnp.ndarray:
    """A (5,) uint8 cell vector."""
    return jnp.array(
        [type_idx, color_idx, state_idx, cont_type, cont_color], dtype=jnp.uint8
    )


EMPTY_CELL = (C.EMPTY, 0, 0, 0, 0)
WALL_CELL = (C.WALL, C.GREY, 0, 0, 0)


def set_cell(grid: jnp.ndarray, x, y, cell) -> jnp.ndarray:
    """Write one cell; `cell` is a (5,) vector or tuple. (`Grid.set`, minigrid.py:~412).

    Implemented as a masked `where` rather than `grid.at[y, x].set`: under
    `vmap` the scatter at per-lane dynamic indices costs ~1.4 µs/lane on a
    25×25 grid (TPU batched scatters serialize) while the broadcast-compare
    write costs ~0.1 µs — generator door/goal placement was scatter-bound
    (BASELINE.md batched-generation profile, round 4)."""
    cell = jnp.asarray(cell, dtype=jnp.uint8)
    h, w = grid.shape[:2]
    mask = (jnp.arange(h)[:, None] == jnp.asarray(y)) & (
        jnp.arange(w)[None, :] == jnp.asarray(x)
    )
    return jnp.where(mask[:, :, None], cell, grid)


def get_cell(grid: jnp.ndarray, x, y) -> jnp.ndarray:
    """Read one (5,) cell vector. (`Grid.get`, minigrid.py:~418)."""
    return grid[y, x, :]


def is_empty(cell: jnp.ndarray) -> jnp.ndarray:
    """True where a cell holds no object (the reference's `None` cell)."""
    return cell[..., CH_TYPE] == C.EMPTY


def horz_wall(grid: jnp.ndarray, x: int, y: int, length=None) -> jnp.ndarray:
    """Paint a horizontal wall run (`Grid.horz_wall`, minigrid.py:~426)."""
    if length is None:
        length = grid.shape[1] - x
    wall = jnp.array(WALL_CELL, dtype=jnp.uint8)
    return grid.at[y, x : x + length, :].set(wall)


def vert_wall(grid: jnp.ndarray, x: int, y: int, length=None) -> jnp.ndarray:
    """Paint a vertical wall run (`Grid.vert_wall`, minigrid.py:~432)."""
    if length is None:
        length = grid.shape[0] - y
    wall = jnp.array(WALL_CELL, dtype=jnp.uint8)
    return grid.at[y : y + length, x, :].set(wall)


def wall_rect(grid: jnp.ndarray, x: int, y: int, w: int, h: int) -> jnp.ndarray:
    """Paint a rectangular wall outline (`Grid.wall_rect`, minigrid.py:~440)."""
    grid = horz_wall(grid, x, y, w)
    grid = horz_wall(grid, x, y + h - 1, w)
    grid = vert_wall(grid, x, y, h)
    grid = vert_wall(grid, x + w - 1, y, h)
    return grid


def paint_rect(
    grid: jnp.ndarray, x0, y0, x1, y1, cell
) -> jnp.ndarray:
    """Fill every cell with `x0 <= x < x1 and y0 <= y < y1` (bounds may be
    traced values — the dynamic-position analogue of the wall helpers,
    used for generator-placed walls/strips like DoorKey's split wall)."""
    h, w = grid.shape[:2]
    ys = jnp.arange(h)[:, None]
    xs = jnp.arange(w)[None, :]
    mask = (xs >= x0) & (xs < x1) & (ys >= y0) & (ys < y1)
    cell = jnp.asarray(cell, dtype=jnp.uint8)
    return jnp.where(mask[:, :, None], cell, grid)


def rotate_left(grid: jnp.ndarray) -> jnp.ndarray:
    """Rotate 90° counter-clockwise (`Grid.rotate_left`, minigrid.py:~450)."""
    return jnp.rot90(grid, k=1, axes=(0, 1))


def slice_with_wall_fill(
    grid: jnp.ndarray, top_x, top_y, width: int, height: int
) -> jnp.ndarray:
    """Crop a `(height, width)` window; out-of-bounds cells become Wall.

    The reference's `Grid.slice` (minigrid.py:~467-490) fills out-of-bounds
    cells with `Wall()` — the agent's view may extend past the map edge.
    Implemented as a wall-pad + `dynamic_slice` so it stays a single fused op
    under jit (no data-dependent branching).
    """
    pad_h, pad_w = height, width
    wall = jnp.array(WALL_CELL, dtype=jnp.uint8)
    padded = jnp.pad(
        grid,
        ((pad_h, pad_h), (pad_w, pad_w), (0, 0)),
        mode="constant",
    )
    # jnp.pad fills zeros; overwrite the border with wall cells.
    H, W = grid.shape[0], grid.shape[1]
    mask = jnp.zeros((H + 2 * pad_h, W + 2 * pad_w, 1), dtype=bool)
    mask = mask.at[pad_h : pad_h + H, pad_w : pad_w + W, :].set(True)
    padded = jnp.where(mask, padded, wall)
    return lax.dynamic_slice(
        padded,
        (top_y + pad_h, top_x + pad_w, 0),
        (height, width, NUM_CHANNELS),
    )


def encode(grid: jnp.ndarray, vis_mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """Encode to the reference's `(W, H, 3)` uint8 observation format.

    `Grid.encode` (minigrid.py:~577-600): visible empty cells encode as
    `(empty=1, 0, 0)`, invisible cells as `(unseen=0, 0, 0)`. NOTE the
    reference's output is indexed `[x, y]` (transposed relative to our
    `[row=y, col=x]` storage) — we transpose to match byte-for-byte.
    """
    out = grid[:, :, :3]
    if vis_mask is not None:
        out = jnp.where(vis_mask[:, :, None], out, jnp.zeros((3,), dtype=jnp.uint8))
    return jnp.transpose(out, (1, 0, 2))


def decode(array: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Inverse of `encode` (`Grid.decode`, minigrid.py:~602-618).

    Returns `(grid, vis_mask)` with grid in our `[row, col, 5]` layout.
    """
    a = jnp.transpose(jnp.asarray(array, dtype=jnp.uint8), (1, 0, 2))
    vis_mask = a[:, :, CH_TYPE] != C.UNSEEN
    grid = jnp.concatenate(
        [a, jnp.zeros(a.shape[:2] + (NUM_CHANNELS - 3,), dtype=jnp.uint8)], axis=-1
    )
    # Unseen cells decode to empty cells but are reported invisible.
    empty = jnp.array(EMPTY_CELL, dtype=jnp.uint8)
    grid = jnp.where(vis_mask[:, :, None], grid, empty)
    return grid, vis_mask


def see_behind_mask(grid: jnp.ndarray) -> jnp.ndarray:
    """(H, W) bool — True where vision propagates *through* the cell.

    `see_behind()` is False for Wall and for any Door that is not open
    (minigrid.py:~218-295).
    """
    t = grid[..., CH_TYPE]
    s = grid[..., CH_STATE]
    opaque = (t == C.WALL) | ((t == C.DOOR) & (s != C.STATE_OPEN))
    return ~opaque


def can_overlap_mask(grid: jnp.ndarray) -> jnp.ndarray:
    """(H, W) bool — True where the agent may stand (incl. open doors)."""
    t = grid[..., CH_TYPE]
    s = grid[..., CH_STATE]
    table = jnp.asarray(C.CAN_OVERLAP)
    base = table[t.astype(jnp.int32)]
    return base | ((t == C.DOOR) & (s == C.STATE_OPEN))
