"""On-device placement sampling.

The reference's `place_obj` (minigrid.py:~897-945) is unbounded rejection
sampling: draw uniform cells until one is empty, not the agent's cell, and
not rejected. On device that becomes a *masked categorical*: build the
validity mask, sample uniformly over valid cells in one shot. For a uniform
proposal, rejection sampling converges to the uniform distribution over the
accepted set, so the masked draw is distribution-exact (it is not bit-exact
w.r.t. the reference's MT19937 call sequence — the host-side compat path in
`minigrid_tpu.compat` covers that).

Crucially this can never fail at trace time, unlike the reference's
`RecursionError('rejection sampling failed')` — generators statically
guarantee a non-empty mask.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from minigrid_tpu.core import constants as C
from minigrid_tpu.core.state import CH_TYPE


def rect_mask(
    height: int,
    width: int,
    top_x,
    top_y,
    size_x,
    size_y,
) -> jnp.ndarray:
    """(H, W) bool mask of cells inside `[top, top+size)` (clamped to grid).

    Mirrors the sampling window of `place_obj` (minigrid.py:~905-920):
    `top` is clamped at 0 and the window is intersected with the grid.
    """
    ys = jnp.arange(height)[:, None]
    xs = jnp.arange(width)[None, :]
    top_x = jnp.maximum(top_x, 0)
    top_y = jnp.maximum(top_y, 0)
    return (xs >= top_x) & (xs < top_x + size_x) & (ys >= top_y) & (ys < top_y + size_y)


def free_cell_mask(grid: jnp.ndarray, agent_pos: Optional[jnp.ndarray]) -> jnp.ndarray:
    """(H, W) bool — cells with no object and not under the agent.

    `place_obj`'s acceptance test (minigrid.py:~925-940). Pass
    `agent_pos=None` during generation phases where the agent is unplaced,
    or `(-1, -1)` dynamically.
    """
    free = grid[:, :, CH_TYPE] == C.EMPTY
    if agent_pos is not None:
        ys = jnp.arange(grid.shape[0])[:, None]
        xs = jnp.arange(grid.shape[1])[None, :]
        free &= ~((xs == agent_pos[0]) & (ys == agent_pos[1]))
    return free


def sample_cell(key: jax.Array, mask: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Uniformly sample one True cell from an (H, W) mask → `(x, y)` int32.

    If the mask is all-False (a generator bug — the reference would raise
    `RecursionError`), returns cell (0, 0) deterministically rather than
    poisoning the trace with NaNs.
    """
    h, w = mask.shape
    flat = mask.reshape(-1)
    any_valid = jnp.any(flat)
    logits = jnp.where(flat, 0.0, -jnp.inf)
    logits = jnp.where(any_valid, logits, jnp.zeros_like(logits))
    idx = jax.random.categorical(key, logits)
    y, x = idx // w, idx % w
    return x.astype(jnp.int32), y.astype(jnp.int32)


def sample_direction(key: jax.Array) -> jnp.ndarray:
    """Random heading 0..3 (reference `place_agent`'s `rand_dir`,
    minigrid.py:~955-970)."""
    return jax.random.randint(key, (), 0, 4, dtype=jnp.int32)
