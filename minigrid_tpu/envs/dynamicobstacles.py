"""Dynamic obstacles environment — the only stochastic-transition env.

Reference: `DynamicObstaclesEnv` (envs/dynamicobstacles.py:~1-110) —
`n_obstacles` blue balls random-walk one cell per step (each resampled
uniformly in its 3×3 neighborhood among free cells, sequentially, staying
put if boxed in); walking `forward` into a non-goal obstacle/wall cell
costs reward −1 and ends the episode. Action space restricted to
{left, right, forward}; invalid actions are remapped to 0.

Obstacle coordinates live in `aux[0:2n]` so the random walk is 2n scalar
reads instead of a grid scan.

The walk's randomness is COUNTER-BASED (core/prng.py): draw i at
in-episode step t consumes `threefry2x32(state.rng, t·n + i)`, and
`state.rng` is never advanced by the transition. This keeps the rng leaf
episode-stationary (so the packed engines' template auto-reset and regen
chain replay work unchanged) and lets the packed pre-hook
(`ops/packed_hooks.py`) reproduce the vmap engine's stream bit-for-bit
from its in-kernel register file. The candidate selection
(`select_walk_target`) is shared by both engines for the same reason.
Distribution parity with the reference's sequential
`place_obj(top=pos-(1,1), size=(3,3))` rejection loop
(dynamicobstacles.py:~60-95) holds because rejection sampling over a
uniform proposal is uniform over the accepted set.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from minigrid_tpu.core import constants as C
from minigrid_tpu.core import grid as G
from minigrid_tpu.core import prng, sampling
from minigrid_tpu.core.state import Actions, EnvConfig, EnvState, empty_state
from minigrid_tpu.core.step import StepResult, base_step
from minigrid_tpu.envs import missions

MISSION = missions.register_template("get to the green goal square")

BALL_CELL = (C.BALL, C.BLUE, 0, 0, 0)

# 3×3 neighborhood in row-major (dy, dx) order — the candidate order both
# engines' selection math indexes into.
WALK_OFFSETS = tuple((dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1))


def select_walk_target(valid9, u31, xs9, ys9, ox, oy):
    """Uniform pick among valid 3×3 candidates; stay put when boxed in.

    `valid9/xs9/ys9` are 9-element sequences of same-shaped integer/bool
    arrays in `WALK_OFFSETS` order; `u31` supplies 31 uniform bits (the
    `u % count` draw has negligible modulo bias: count ≤ 9 ≪ 2³¹). Pure
    elementwise math — runs identically under vmap (scalars) and on packed
    `(1, B)` lane rows inside the Pallas kernel; SHARED so the engines
    cannot drift.
    """
    count = valid9[0].astype(jnp.int32)
    for v in valid9[1:]:
        count = count + v.astype(jnp.int32)
    r = u31 % jnp.maximum(count, 1)
    movable = count > 0
    nx = jnp.zeros_like(ox)
    ny = jnp.zeros_like(oy)
    cum = jnp.zeros_like(count)
    for j in range(9):
        vj = valid9[j].astype(jnp.int32)
        picked = (vj > 0) & (cum == r)
        nx = jnp.where(picked, xs9[j], nx)
        ny = jnp.where(picked, ys9[j], ny)
        cum = cum + vj
    return jnp.where(movable, nx, ox), jnp.where(movable, ny, oy)


def generate(key: jax.Array, config: EnvConfig) -> EnvState:
    key, k_reset = jax.random.split(key)
    state = empty_state(config, rng=k_reset)
    w, h = config.width, config.height

    grid = G.wall_rect(state.grid, 0, 0, w, h)
    grid = G.set_cell(grid, w - 2, h - 2, (C.GOAL, C.GREEN, 0, 0, 0))

    ks = jax.random.split(key, 2 + config.n_obstacles)
    if config.agent_start_pos is not None:
        agent_pos = jnp.asarray(config.agent_start_pos, dtype=jnp.int32)
        agent_dir = jnp.asarray(config.agent_start_dir or 0, dtype=jnp.int32)
    else:
        x, y = sampling.sample_cell(ks[0], sampling.free_cell_mask(grid, None))
        agent_pos = jnp.stack([x, y])
        agent_dir = sampling.sample_direction(ks[1])

    aux = state.aux
    for i in range(config.n_obstacles):
        ox, oy = sampling.sample_cell(
            ks[2 + i], sampling.free_cell_mask(grid, agent_pos)
        )
        grid = G.set_cell(grid, ox, oy, BALL_CELL)
        aux = aux.at[2 * i].set(ox).at[2 * i + 1].set(oy)

    return state.replace(
        grid=grid,
        agent_pos=agent_pos,
        agent_dir=agent_dir,
        aux=aux,
        mission=jnp.asarray(missions.encode(MISSION)),
    )


def step(state: EnvState, action: jnp.ndarray, config: EnvConfig) -> StepResult:
    action = jnp.asarray(action, dtype=jnp.int32)
    # Invalid action (≥ 3) → action 0 (reference dynamicobstacles.py:~60).
    action = jnp.where(action >= config.num_actions, 0, action)

    # Front-cell clearance BEFORE obstacles move decides the collision
    # penalty (reference computes `not_clear` first).
    fwd = state.agent_pos + jnp.asarray(C.DIR_TO_VEC)[state.agent_dir]
    fwd_type = state.grid[fwd[1], fwd[0], 0].astype(jnp.int32)
    not_clear = (fwd_type != C.EMPTY) & (fwd_type != C.GOAL)

    # Sequential random walk: each obstacle resamples within its 3×3 box
    # among free cells (excluding the agent), staying put when boxed in.
    # Counter-based randomness keyed on (state.rng, step_count·n + i); the
    # rng leaf is NOT advanced (see module docstring).
    grid = state.grid
    aux = state.aux
    k0, k1 = prng.key_words(state.rng)
    h, w = config.height, config.width
    n = config.n_obstacles
    for i in range(n):
        u = prng.hash_u31(k0, k1, state.step_count * n + i)
        ox, oy = aux[2 * i], aux[2 * i + 1]
        valid9, xs9, ys9 = [], [], []
        for dy, dx in WALK_OFFSETS:
            nx, ny = ox + dx, oy + dy
            nxc = jnp.clip(nx, 0, w - 1)
            nyc = jnp.clip(ny, 0, h - 1)
            inb = (nx >= 0) & (nx < w) & (ny >= 0) & (ny < h)
            free = (
                inb
                & (grid[nyc, nxc, 0] == C.EMPTY)
                & ~((nx == state.agent_pos[0]) & (ny == state.agent_pos[1]))
            )
            valid9.append(free)
            xs9.append(nx)
            ys9.append(ny)
        nx, ny = select_walk_target(valid9, u, xs9, ys9, ox, oy)
        grid = G.set_cell(grid, ox, oy, G.EMPTY_CELL)
        grid = G.set_cell(grid, nx, ny, BALL_CELL)
        aux = aux.at[2 * i].set(nx).at[2 * i + 1].set(ny)

    moved = state.replace(grid=grid, aux=aux)
    return post_walk_step(moved, action, config, not_clear)


def post_walk_step(
    state: EnvState, action: jnp.ndarray, config: EnvConfig, not_clear
) -> StepResult:
    """The deterministic tail of `step` — base transition + collision
    penalty — for a state whose obstacle walk has ALREADY been applied.
    `not_clear` is the PRE-walk front-cell blockage (the reference computes
    it before the walk, dynamicobstacles.py:~65-70). Split out so the
    bit-exact compat path (`compat.exact.dynobst_step`) can replay the
    walk host-side from the reference's MT19937 stream and still run the
    deterministic part through the device kernel."""
    action = jnp.asarray(action, dtype=jnp.int32)
    action = jnp.where(action >= config.num_actions, 0, action)
    res = base_step(state, action, config)
    collided = (action == Actions.forward) & not_clear
    reward = jnp.where(collided, -1.0, res.reward)
    terminated = res.terminated | collided
    return StepResult(res.state, reward, terminated, res.truncated)
