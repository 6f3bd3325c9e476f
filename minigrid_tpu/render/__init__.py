"""Rendering: tile-atlas rasterizer for RGB observations and frames."""

from minigrid_tpu.render.atlas import TileAtlas, get_atlas
from minigrid_tpu.render.render import (
    render_grid,
    render_obs_image,
    render_state,
)

__all__ = [
    "TileAtlas",
    "get_atlas",
    "render_grid",
    "render_obs_image",
    "render_state",
]
