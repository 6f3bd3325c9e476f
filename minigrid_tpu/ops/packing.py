"""State <-> packed-lane layout: the register file, cell-word packing,
visibility LUTs, direction tables, row readers, and the agent-centering
rolls shared by every packed engine (ops/fused_rollout.py,
ops/policy_rollout.py, ops/packed_gen.py). Split out of fused_rollout.py
(VERDICT r4 #9) — pure layout code with no step/rollout semantics.

Layout recap: one int32 word per grid cell (`type | color<<4 | state<<8 |
cont_type<<12 | cont_color<<16`), the grid as `(H*W, B)` with the batch
in the lane dimension, all per-env scalars/aux/mission/rng as rows of a
`(NUM_REGS, B)` int32 register file, and the grid kept AGENT-CENTERED
(lane b's rows rolled so the agent's cell is row 0).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from minigrid_tpu.core import constants as C
from minigrid_tpu.core.state import EnvConfig, EnvState

# Register-file row layout (the `(NUM_REGS, B)` int32 block): 8 scalars,
# then the per-env aux vector, the integer mission encoding, and the two
# words of the per-env PRNG key. aux/mission/rng are inert during an
# episode (for rng: stochastic-transition families draw counter-based bits
# keyed on it without mutating it) but change on auto-reset (the fresh
# layout's target ids / reset key differ from the live episode's), so they
# ride in the register file and reset through the same done-select as
# everything else.
R_X, R_Y, R_DIR, R_CT, R_CC, R_CCT, R_CCC, R_SC = range(8)
R_AUX = 8  # ..R_AUX+AUX_LEN
from minigrid_tpu.core.state import AUX_LEN as _AUX_LEN  # noqa: E402
from minigrid_tpu.core.state import MISSION_LEN as _MISSION_LEN  # noqa: E402

R_MISSION = R_AUX + _AUX_LEN  # ..R_MISSION+MISSION_LEN
R_RNG = R_MISSION + _MISSION_LEN  # ..R_RNG+2 (uint32 key bit-cast to int32)
NUM_REGS = R_RNG + 2

_WALL_WORD = C.WALL | (C.GREY << 4)  # OOB view cells read as grey walls
_EMPTY_WORD = C.EMPTY

# VMEM budget for auto-sizing the lane block (per-core VMEM is ~16 MiB; leave
# headroom for Mosaic's own buffers and the pipelined input/output blocks).
_VMEM_BUDGET_BYTES = 10 * 1024 * 1024


# --------------------------------------------------------------------------
# State <-> packed layout
# --------------------------------------------------------------------------


def pack_states(states: EnvState) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batched `EnvState` -> (`(H·W, B)` grid words, `(NUM_REGS, B)` regs)."""
    g = states.grid.astype(jnp.int32)  # (B, H, W, 5)
    words = (
        g[..., 0]
        | (g[..., 1] << 4)
        | (g[..., 2] << 8)
        | (g[..., 3] << 12)
        | (g[..., 4] << 16)
    )
    b = words.shape[0]
    words = words.reshape(b, -1).T  # (HW, B)
    carry = states.carrying.astype(jnp.int32)
    regs = jnp.concatenate(
        [
            jnp.stack(
                [
                    states.agent_pos[:, 0],
                    states.agent_pos[:, 1],
                    states.agent_dir,
                    carry[:, 0],
                    carry[:, 1],
                    carry[:, 2],
                    carry[:, 3],
                    states.step_count,
                ]
            ),
            states.aux.astype(jnp.int32).T,
            states.mission.astype(jnp.int32).T,
            key_rows(states.rng),
        ]
    )  # (NUM_REGS, B)
    return words, regs


def key_rows(rng: jnp.ndarray) -> jnp.ndarray:
    """`(B, 2)` uint32 PRNG keys → `(2, B)` int32 register rows (bit cast)."""
    return lax.bitcast_convert_type(rng, jnp.int32).T


def rows_key(rows: jnp.ndarray) -> jnp.ndarray:
    """Inverse of `key_rows`."""
    return lax.bitcast_convert_type(rows.T, jnp.uint32)


def unpack_states(
    words: jnp.ndarray, regs: jnp.ndarray, config: EnvConfig
) -> EnvState:
    """Inverse of `pack_states` — every `EnvState` leaf (including the rng
    key, which rides in the register file) is rebuilt from the packed
    arrays."""
    hw, b = words.shape
    w = words.T.reshape(b, config.height, config.width)
    grid = jnp.stack(
        [w & 15, (w >> 4) & 15, (w >> 8) & 15, (w >> 12) & 15, (w >> 16) & 15],
        axis=-1,
    ).astype(jnp.uint8)
    return EnvState(
        grid=grid,
        agent_pos=jnp.stack([regs[R_X], regs[R_Y]], axis=-1),
        agent_dir=regs[R_DIR],
        carrying=jnp.stack(
            [regs[R_CT], regs[R_CC], regs[R_CCT], regs[R_CCC]], axis=-1
        ).astype(jnp.uint8),
        step_count=regs[R_SC],
        rng=rows_key(regs[R_RNG : R_RNG + 2]),
        mission=regs[R_MISSION : R_MISSION + _MISSION_LEN].T,
        aux=regs[R_AUX : R_AUX + _AUX_LEN].T,
    )


# --------------------------------------------------------------------------
# Occlusion flood on per-row bitmasks (testable outside the kernel)
# --------------------------------------------------------------------------


def visibility_bitmask(trans_rows: jnp.ndarray, view: int) -> jnp.ndarray:
    """`Grid.process_vis` (minigrid.py:~620-640) on V-bit row bitmasks.

    Args:
      trans_rows: `(V, N)` int32 — bit i of row j is 1 iff view cell (j, i)
        is transparent (`see_behind`). N is an arbitrary lane dimension
        (batch); plain jnp ops only, so this runs identically inside the
        Pallas kernel, in the XLA twin, and under the unit test
        (tests/test_fused_rollout.py, which checks it against
        `core.vision.process_vis` on random grids).

    Returns:
      `(V, N)` int32 — bit i of row j is 1 iff view cell (j, i) is visible.
      The agent sits at (row V-1, col V//2) and is always visible.

    Derivation mirrors `core/vision.py`: within one scan pass the lateral
    propagation is a monotone flood, so each pass is V-1 shift-OR steps; the
    row-above seeding collapses to shifts of `q = converged & trans`.
    """
    half = view // 2
    all_bits = (1 << view) - 1
    last_clear = all_bits >> 1  # mask clearing bit view-1
    first_clear = all_bits & ~1  # mask clearing bit 0

    carry = jnp.zeros_like(trans_rows[0])
    vis_rows = [None] * view
    for j in range(view - 1, -1, -1):
        seed = carry
        if j == view - 1:
            seed = seed | (1 << half)
        trow = trans_rows[j]
        row = seed
        for _ in range(view - 1):  # L→R flood (reference's first pass)
            row = row | ((row & trow) << 1)
        row = row & all_bits
        q_l = row & trow & last_clear
        for _ in range(view - 1):  # R→L flood (reference's second pass)
            row = row | ((row & trow) >> 1)
        q_r = row & trow & first_clear
        carry = (q_l | (q_l << 1) | q_r | (q_r >> 1)) & all_bits
        vis_rows[j] = row
    return jnp.stack([vis_rows[j] for j in range(view)], axis=0)


# --------------------------------------------------------------------------
# Shared step math (backend-independent)
# --------------------------------------------------------------------------


def _dir_tables(width: int, height: int, view: int):
    """Per-direction constant offset tables (numpy; trace-time only).

    In the agent-centered rolled layout every address the step needs is a
    COMPILE-TIME constant per direction:
      off_fwd[d]  — rolled row of the forward cell;
      off_view[d] — (V²,) rolled rows of the egocentric view cells;
      dxk/dyk[d]  — (V²,) world-frame view offsets (for the OOB mask).
    """
    hw = width * height
    half = view // 2
    kv = np.arange(view * view)
    rd = (view - 1) - kv // view  # forward distance per view cell
    co = kv % view - half  # lateral offset per view cell
    off_fwd, off_view, dxk, dyk = [], [], [], []
    for f0, f1 in ((1, 0), (0, 1), (-1, 0), (0, -1)):  # DIR_TO_VEC
        r0, r1 = -f1, f0  # right-perpendicular
        dx = f0 * rd + r0 * co
        dy = f1 * rd + r1 * co
        dxk.append(dx.astype(np.int32))
        dyk.append(dy.astype(np.int32))
        off_view.append(((dy * width + dx) % hw).astype(np.int32))
        off_fwd.append(int((f1 * width + f0) % hw))
    return off_fwd, off_view, dxk, dyk


def _sel4(d: jnp.ndarray, vals) -> jnp.ndarray:
    """4-way select by direction (branchless `lax.switch`-equivalent)."""
    return jnp.where(
        d == 0,
        vals[0],
        jnp.where(d == 1, vals[1], jnp.where(d == 2, vals[2], vals[3])),
    )


def _sliced_rows(x: jnp.ndarray, rows) -> jnp.ndarray:
    """Rows of `x` at compile-time-constant indices as a concat of static
    slices — lowers on every backend including Mosaic (where value-level
    gathers do not), but drives XLA:TPU compile time through the roof at
    V²-scale row counts; the kernel uses it, XLA paths use `_take_rows`."""
    return jnp.concatenate(
        [lax.slice_in_dim(x, int(r), int(r) + 1, axis=0) for r in rows], axis=0
    )


def _take_rows(x: jnp.ndarray, rows) -> jnp.ndarray:
    """Rows of `x` at compile-time-constant indices as one gather."""
    return jnp.take(x, jnp.asarray(np.asarray(rows, dtype=np.int32)), axis=0)


def _matmul_rows(x: jnp.ndarray, rows) -> jnp.ndarray:
    """Rows of `x` at compile-time-constant indices as one MXU matmul:
    `onehot(rows) @ x` with f32 accumulation. Exact for packed cell words
    (< 2^20 < 2^24, the f32 mantissa); each output row copies exactly one
    input row. The TPU-friendly reader: a (R, HW)·(HW, B) matmul instead of
    a gather XLA:TPU lowers poorly."""
    rows = np.asarray(rows, dtype=np.int64)
    sel = np.zeros((len(rows), x.shape[0]), dtype=np.float32)
    sel[np.arange(len(rows)), rows] = 1.0
    return jnp.dot(
        jnp.asarray(sel), x.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    ).astype(jnp.int32)


def _roll_static(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """`out[s] = x[(s + k) % n]` for a compile-time-constant k."""
    k %= x.shape[0]
    if k == 0:
        return x
    return jnp.concatenate([x[k:], x[:k]], axis=0)


def _roll_to_base(words: jnp.ndarray, base: jnp.ndarray) -> jnp.ndarray:
    """Per-lane roll: `out[s, b] = words[(base[b] + s) % HW, b]`.

    Binary-decomposed: log2(HW) static rolls, each kept or skipped per lane
    by one bit of `base` — O(HW·log HW) data movement, no gathers. Used once
    per rollout (pack / template / unpack), never inside the step loop.
    """
    hw = words.shape[0]
    out = words
    shift = 1
    while shift < hw:
        rolled = jnp.concatenate([out[shift:], out[:shift]], axis=0)
        out = jnp.where((base // shift) % 2 == 1, rolled, out)
        shift *= 2
    return out


