"""The environment state PyTree and static per-environment configuration.

In the reference, environment state is a live Python object graph: a
`Grid` holding `WorldObj` instances plus `agent_pos/agent_dir/carrying/
step_count` attributes mutated in place by `step` (minigrid.py:~642-1300).

Here the full state is a fixed-shape PyTree of arrays so that:
  * `jax.vmap` gives batched lockstep simulation for free,
  * `jax.lax.scan` rolls out whole trajectories on device,
  * `jax.tree.map(select)` implements auto-reset without host round-trips,
  * checkpoint/restore is trivial array serialization (the reference has no
    save/restore at all — SURVEY.md §5).

Grid encoding: a single `(H, W, 5)` uint8 array with channels
`(type, color, state, contains_type, contains_color)`. The first three
channels match the reference's `Grid.encode()` byte format exactly
(minigrid.py:~577-600); the last two carry `Box.contains` (the reference
stores the contained `WorldObj` as a Python reference, minigrid.py:~335-365;
nested containment deeper than one level is unused by every registered env
and is not represented).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import jax.numpy as jnp
from flax import struct

# Grid channel indices.
CH_TYPE = 0
CH_COLOR = 1
CH_STATE = 2
CH_CONT_TYPE = 3
CH_CONT_COLOR = 4
NUM_CHANNELS = 5

# Carrying-vector lanes (uint8[4]): what the agent holds.
# carrying[0] == 0 (no object type) means "hands empty" — the reference's
# `self.carrying = None` (minigrid.py:~744).
CARRY_TYPE = 0
CARRY_COLOR = 1
CARRY_CONT_TYPE = 2
CARRY_CONT_COLOR = 3

# Sizes of the fixed per-family scratch vectors.
MISSION_LEN = 8  # (template_id, slot0..slot6) int32
AUX_LEN = 24  # per-family extras (target positions, obstacle coords, flags)


class Actions:
    """The 7-action vocabulary (reference `MiniGridEnv.Actions`, minigrid.py:~650-665)."""

    left = 0  # turn left
    right = 1  # turn right
    forward = 2  # move forward
    pickup = 3  # pick up the object in front
    drop = 4  # drop the carried object in front
    toggle = 5  # toggle/activate the object in front
    done = 6  # explicit no-op / task-completion signal


@struct.dataclass
class EnvState:
    """Complete, device-resident environment state.

    A batched simulation is simply this PyTree with a leading `(B,)` axis on
    every leaf (produced by `jax.vmap` of `reset`).
    """

    grid: jnp.ndarray  # (H, W, 5) uint8 — see channel constants above
    agent_pos: jnp.ndarray  # (2,) int32 — (x, y); x is the column index
    agent_dir: jnp.ndarray  # () int32 — 0=right 1=down 2=left 3=up
    carrying: jnp.ndarray  # (4,) uint8 — (type, color, cont_type, cont_color)
    step_count: jnp.ndarray  # () int32
    rng: jnp.ndarray  # (2,) uint32 PRNG key — stochastic transitions + auto-reset
    mission: jnp.ndarray  # (MISSION_LEN,) int32 — template id + slot fills
    aux: jnp.ndarray  # (AUX_LEN,) int32 — family-specific scratch


@dataclasses.dataclass(frozen=True)
class EnvConfig:
    """Static (trace-time) environment configuration.

    The reference freezes per-id constructor kwargs inside `register()` calls
    (register.py:~5-25); here the same information is a hashable frozen
    dataclass passed as a static argument to jit, so each registered id
    compiles to its own specialized XLA program.
    """

    family: str  # generator/step family name, e.g. "empty", "doorkey"
    width: int
    height: int
    max_steps: int
    agent_view_size: int = 7
    see_through_walls: bool = False
    num_actions: int = 7  # DynamicObstacles restricts to 3

    # --- family-specific static parameters (unused fields stay None) ---
    agent_start_pos: Optional[Tuple[int, int]] = None  # None => random placement
    agent_start_dir: Optional[int] = None
    num_objs: Optional[int] = None  # Fetch / GoTo* / PutNear object count
    n_obstacles: Optional[int] = None  # DynamicObstacles
    num_crossings: Optional[int] = None  # Crossing
    obstacle_type: Optional[str] = None  # Crossing / LavaGap: "lava" | "wall"
    strip2_row: Optional[int] = None  # DistShift lava row
    room_size: Optional[int] = None  # RoomGrid family
    num_rows: Optional[int] = None  # RoomGrid family
    num_cols: Optional[int] = None  # RoomGrid family
    min_num_rooms: Optional[int] = None  # MultiRoom
    max_num_rooms: Optional[int] = None  # MultiRoom
    max_room_size: Optional[int] = None  # MultiRoom
    random_length: Optional[bool] = None  # Memory
    num_distractors: Optional[int] = None  # RoomGrid-style distractor count
    extras: Tuple[Any, ...] = ()  # escape hatch for anything else

    @property
    def view_offset(self) -> int:
        """Half-width of the egocentric view (agent sits at bottom-center)."""
        return self.agent_view_size // 2


def empty_state(config: EnvConfig, rng: jnp.ndarray) -> EnvState:
    """An all-empty state skeleton with the right shapes/dtypes for `config`."""
    from minigrid_tpu.core import constants as C

    grid = jnp.zeros((config.height, config.width, NUM_CHANNELS), dtype=jnp.uint8)
    grid = grid.at[:, :, CH_TYPE].set(C.EMPTY)
    return EnvState(
        grid=grid,
        agent_pos=jnp.zeros((2,), dtype=jnp.int32),
        agent_dir=jnp.zeros((), dtype=jnp.int32),
        carrying=jnp.zeros((4,), dtype=jnp.uint8),
        step_count=jnp.zeros((), dtype=jnp.int32),
        rng=rng,
        mission=jnp.zeros((MISSION_LEN,), dtype=jnp.int32),
        aux=jnp.zeros((AUX_LEN,), dtype=jnp.int32),
    )
