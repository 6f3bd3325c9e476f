"""Distribution-shift evaluation pair.

Reference: `DistShiftEnv` (envs/distshift.py:~1-60) — 9×7 room, goal at
`(width-2, 1)`, two lava strips spanning columns 3..width-4: one fixed at
row 1 and one at `strip2_row` (2 for DistShift1, 5 for DistShift2). Agent
fixed at (1, 1) facing right; fully deterministic layout.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from minigrid_tpu.core import constants as C
from minigrid_tpu.core import grid as G
from minigrid_tpu.core.state import EnvConfig, EnvState, empty_state
from minigrid_tpu.core.step import base_step
from minigrid_tpu.envs import missions

MISSION = missions.register_template("get to the green goal square")

LAVA_CELL = (C.LAVA, C.RED, 0, 0, 0)


def generate(key: jax.Array, config: EnvConfig) -> EnvState:
    key, k_reset = jax.random.split(key)
    state = empty_state(config, rng=k_reset)
    w, h = config.width, config.height

    grid = G.wall_rect(state.grid, 0, 0, w, h)
    grid = G.set_cell(grid, w - 2, 1, (C.GOAL, C.GREEN, 0, 0, 0))
    # Lava strips: columns 3 .. 3+(w-6), rows 1 and strip2_row.
    grid = G.paint_rect(grid, 3, 1, 3 + (w - 6), 2, LAVA_CELL)
    r2 = config.strip2_row
    grid = G.paint_rect(grid, 3, r2, 3 + (w - 6), r2 + 1, LAVA_CELL)

    return state.replace(
        grid=grid,
        agent_pos=jnp.asarray(config.agent_start_pos, dtype=jnp.int32),
        agent_dir=jnp.asarray(config.agent_start_dir, dtype=jnp.int32),
        mission=jnp.asarray(missions.encode(MISSION)),
    )


step = base_step
