"""On-device RGB rendering via atlas gather.

The reference renders frames tile-by-tile in Python with a memo cache
(`Grid.render`, minigrid.py:~542-575). Here a frame is: compute an integer
tile id per cell (pure arithmetic on the grid channels), gather from the
constant atlas, transpose-reshape into an image, and alpha-blend the
highlight mask — one fused XLA program, batchable with `vmap`.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from minigrid_tpu.core import constants as C
from minigrid_tpu.core.obs import gen_obs_grid
from minigrid_tpu.core.state import EnvConfig, EnvState
from minigrid_tpu.render.atlas import NUM_AGENT_CODES, get_atlas, tile_id

HIGHLIGHT_ALPHA = 0.30


def render_grid(
    grid: jnp.ndarray,
    tile_size: int = C.TILE_PIXELS,
    agent_pos: Optional[jnp.ndarray] = None,
    agent_dir: Optional[jnp.ndarray] = None,
    highlight_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Render a (H, W, 5) grid to a (H·ts, W·ts, 3) uint8 image."""
    h, w = grid.shape[:2]
    atlas = jnp.asarray(get_atlas(tile_size).tiles)

    t = grid[:, :, 0].astype(jnp.int32)
    c = grid[:, :, 1].astype(jnp.int32)
    s = grid[:, :, 2].astype(jnp.int32)

    agent_code = jnp.zeros((h, w), jnp.int32)
    if agent_pos is not None and agent_dir is not None:
        agent_code = agent_code.at[agent_pos[1], agent_pos[0]].set(
            1 + jnp.asarray(agent_dir, jnp.int32)
        )

    tid = tile_id(t, c, s, agent_code)
    tiles = atlas[tid]  # (H, W, ts, ts, 3)

    if highlight_mask is not None:
        hl = highlight_mask[:, :, None, None, None]
        blended = (
            tiles.astype(jnp.float32) * (1 - HIGHLIGHT_ALPHA) + 255.0 * HIGHLIGHT_ALPHA
        )
        tiles = jnp.where(hl, jnp.clip(blended, 0, 255).astype(jnp.uint8), tiles)

    img = jnp.transpose(tiles, (0, 2, 1, 3, 4))
    return img.reshape(h * tile_size, w * tile_size, 3)


def _view_highlight_mask(state: EnvState, config: EnvConfig) -> jnp.ndarray:
    """World-frame mask of visible view cells (`MiniGridEnv.render`'s
    highlight computation, minigrid.py:~1255-1275)."""
    v = config.agent_view_size
    _, vis_mask = gen_obs_grid(state, config)

    # f_vec/r_vec from agent dir; top-left of view in world frame:
    # top_left = agent_pos + f_vec*(v-1) - r_vec*(v//2).
    f_vec = jnp.asarray(C.DIR_TO_VEC)[state.agent_dir]
    r_vec = jnp.stack([-f_vec[1], f_vec[0]])
    top_left = state.agent_pos + f_vec * (v - 1) - r_vec * (v // 2)

    mask = jnp.zeros((config.height, config.width), bool)
    for vis_j in range(v):
        for vis_i in range(v):
            # View cell (x=vis_i, y=vis_j) → world position
            # (reference: abs = top_left - f_vec*vis_j + r_vec*vis_i;
            # our vis_mask is [row, col] = [vis_j, vis_i]).
            pos = top_left - f_vec * vis_j + r_vec * vis_i
            ok = (
                vis_mask[vis_j, vis_i]
                & (pos[0] >= 0) & (pos[0] < config.width)
                & (pos[1] >= 0) & (pos[1] < config.height)
            )
            px = jnp.clip(pos[0], 0, config.width - 1)
            py = jnp.clip(pos[1], 0, config.height - 1)
            mask = mask.at[py, px].set(mask[py, px] | ok)
    return mask


def render_state(
    state: EnvState,
    config: EnvConfig,
    tile_size: int = C.TILE_PIXELS,
    highlight: bool = True,
) -> jnp.ndarray:
    """Full-frame render with agent + view highlight
    (`MiniGridEnv.render('rgb_array')`, minigrid.py:~1242-1295)."""
    hl = _view_highlight_mask(state, config) if highlight else None
    return render_grid(
        state.grid,
        tile_size=tile_size,
        agent_pos=state.agent_pos,
        agent_dir=state.agent_dir,
        highlight_mask=hl,
    )


def render_obs_image(
    obs_image: jnp.ndarray,
    tile_size: int = C.TILE_PIXELS // 2,
) -> jnp.ndarray:
    """Render an encoded (V, V, 3) partial observation
    (`get_obs_render`, minigrid.py:~1217-1240): agent at bottom-center
    facing up, invisible cells dark, visible cells highlighted."""
    from minigrid_tpu.core.grid import decode

    grid, vis_mask = decode(obs_image)
    v = grid.shape[0]
    return render_grid(
        grid,
        tile_size=tile_size,
        agent_pos=jnp.asarray([v // 2, v - 1], jnp.int32),
        agent_dir=jnp.asarray(3, jnp.int32),
        highlight_mask=vis_mask,
    )
