"""Occlusion / visibility kernel.

Reference algorithm (`Grid.process_vis`, minigrid.py:~620-640): seed the
agent's cell, then for each row from the bottom of the (already egocentric,
agent-at-bottom-center) view upward, run a left-to-right pass then a
right-to-left pass; every visible, transparent cell lights its lateral
neighbor in scan direction plus the two diagonal/vertical neighbors one row
up. The scans are order-dependent (light propagates along a row within a
single pass), which is why a naive translation would be a 2·V² sequential
Python loop.

TPU-native derivation: within one pass the lateral propagation
`mask[i+1] |= mask[i] & trans[i]` is a monotone directed flood along the row,
so the value each cell is *visited with* equals the converged scan value.
Hence one pass is computable as ≤ V−1 vectorized shift-OR steps over the
whole row, and the row-(j−1) seeding collapses to shift/OR combinations of
`q = converged_mask & trans` (the set of cells that both saw light and let it
through):

  L→R pass over row j (visits i ∈ [0, V−2]):
      rowLR  = flood_right(row)
      qL     = (rowLR & trans) with the last lane cleared
      seeds up: positions {i, i+1} for each lit i  →  qL | shift_right(qL)
  R→L pass (visits i ∈ [1, V−1], reads rowLR):
      rowRL  = flood_left(rowLR)
      qR     = (rowRL & trans) with lane 0 cleared
      seeds up: positions {i−1, i}                 →  qR | shift_left(qR)

Rows are processed bottom-up with the accumulated carry OR-ed into the next
row's seed. Everything is branchless boolean algebra on `(V,)` lanes —
`vmap` turns it into `(B, V)` VPU ops with no sequential dependence across
the batch. The view size is static, so the whole kernel unrolls at trace
time.
"""

from __future__ import annotations

import jax.numpy as jnp

from minigrid_tpu.core.grid import see_behind_mask


def _shift_right(x: jnp.ndarray) -> jnp.ndarray:
    """[0, x0, x1, ..., x_{n-2}] along the last axis."""
    pad = jnp.zeros_like(x[..., :1])
    return jnp.concatenate([pad, x[..., :-1]], axis=-1)


def _shift_left(x: jnp.ndarray) -> jnp.ndarray:
    """[x1, ..., x_{n-1}, 0] along the last axis."""
    pad = jnp.zeros_like(x[..., :1])
    return jnp.concatenate([x[..., 1:], pad], axis=-1)


def _flood(row: jnp.ndarray, trans: jnp.ndarray, shift) -> jnp.ndarray:
    """Converge `row[i+d] |= row[i] & trans[i]` (d = shift direction)."""
    n = row.shape[-1]
    for _ in range(n - 1):
        row = row | shift(row & trans)
    return row


def process_vis(view_grid: jnp.ndarray) -> jnp.ndarray:
    """Visibility mask for an egocentric view grid.

    Args:
      view_grid: `(V, V, 5)` uint8 egocentric view, agent at
        `[row V-1, col V//2]` facing up (i.e. after rotation).

    Returns:
      `(V, V)` bool visibility mask (True = visible).
    """
    v = view_grid.shape[0]
    trans = see_behind_mask(view_grid)  # (V, V) True where light passes through

    agent_col = v // 2
    rows = []
    carry = jnp.zeros((v,), dtype=bool)
    for j in range(v - 1, -1, -1):
        seed = carry
        if j == v - 1:
            seed = seed.at[agent_col].set(True)
        trow = trans[j]

        row = _flood(seed, trow, _shift_right)
        q_l = (row & trow).at[v - 1].set(False)
        row = _flood(row, trow, _shift_left)
        q_r = (row & trow).at[0].set(False)

        carry = q_l | _shift_right(q_l) | q_r | _shift_left(q_r)
        rows.append(row)

    rows.reverse()
    return jnp.stack(rows, axis=0)
