"""Packed-lane multi-step rollout: one Pallas TPU kernel, plus an XLA twin.

Why: the `vmap`-over-envs path (`core/rollout.py`) keeps each environment's
state as tiny `(H, W, 5)` uint8 arrays whose minormost dims (8×5) occupy a
fraction of the TPU's (sublane×lane) = (8×128) vector registers — every
elementwise op runs nearly empty and every scan step round-trips state
through HBM. Measured ceiling on one v5e core: ~2.6 M env-steps/s
regardless of batch size.

TPU-native layout instead puts the *batch* in the lane dimension:

  * the whole grid cell `(type, color, state, cont_type, cont_color)` packs
    into one int32 word (4+4+4+4+4 bits), so the grid is a single
    `(H·W, B)` int32 array — full 128-lane occupancy on every op;
  * all per-env scalars (agent x/y/dir, carried object, step count) plus
    the aux / mission vectors are rows of a `(NUM_REGS, B)` int32 register
    file;
  * the grid is kept AGENT-CENTERED: lane b's rows are rolled so the agent's
    cell is row 0 (`_roll_to_base`, applied once outside the loop). Every
    address the step needs — the forward cell, all V² egocentric view
    cells — is then a compile-time constant per direction, so reads are
    static slices + 4-way selects and a forward move is one static roll.
    No per-lane dynamic addressing anywhere in the hot loop.

Two backends share the SAME step math (`_step_core`):

  * `build_fused_rollout` — the whole step loop runs inside ONE
    `pallas_call`; state never leaves VMEM between steps. The step axis is
    chunked over a second (sequential) grid dimension, so VMEM usage and
    compile time are bounded regardless of `num_steps` (state lives in
    scratch, which persists across grid iterations).
  * `build_packed_xla_rollout` — the same packed layout under a plain
    `lax.scan`; XLA schedules each step as fused VPU ops over the (rows, B)
    arrays. No Mosaic dependency; runs anywhere.

Semantics are the base transition kernel (`core/step.py`, mirroring
`MiniGridEnv.step`, minigrid.py:~1087-1160), the observation pipeline of
`core/obs.py`/`core/vision.py` (gen_obs, minigrid.py:~1162-1215), and
template auto-reset. Two modes, matching `core.autoreset`:

  * mode="regen"  — reference reset semantics (fresh layout per episode,
    minigrid.py:~722-748). Deterministic-layout families (fixed Empty /
    DistShift) reset to the static template (identical by construction)
    with the per-env rng chain replayed host-side (`_replay_rng_chain`);
    random-layout families run the exact chunked template-refresh scheme
    (`_build_chunked_regen`): every reset consumes a pre-generated fresh
    layout (refreshed per `regen_chunk` steps for consumed lanes only;
    in-chunk repeat resets deferred to a re-entry pass) — byte-exact vs
    the vmap regen path for any `regen_chunk`.
  * mode="cached" — every reset replays ONE pinned layout per lane:
    byte-for-byte `core.rollout.build_rollout(..., autoreset_mode="cached")`.

Both modes cover all 21 families: the base step kernel, ten post-hook
families, and DynamicObstacles via a PRE-step hook whose counter-based
obstacle walk (`core/prng.py`) reproduces the vmap engine's stream
bit-for-bit from the in-register rng key.

The occlusion flood (`Grid.process_vis`, minigrid.py:~620-640) is computed
on V-bit *bitmasks*: each egocentric view row lives in the low V bits of one
int32 lane-vector, so a whole left-to-right light-propagation pass is V-1
`x |= (x & trans) << 1` integer ops across the full batch. The flood lives
in `visibility_bitmask`, unit-tested against `core.vision.process_vis`
on random view grids (tests/test_fused_rollout.py).

Actions are supplied as a precomputed `(T, B)` array (the random policy is
sampled with `jax.random` outside the kernel), which keeps the kernel
deterministic and lets tests replay identical action streams through the
reference path for step-for-step equivalence.

Note on reward summation: `total_reward` is accumulated per-env over T
steps and then summed across the batch, while the vmap path sums across the
batch per step. Float32 addition order therefore differs — integer metrics
(`episodes`, `total_steps`, `obs_checksum`) are exact, `total_reward`
matches to float tolerance only.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from minigrid_tpu.core import constants as C
from minigrid_tpu.core.rollout import RolloutMetrics, random_policy
from minigrid_tpu.core.state import EnvConfig, EnvState
from minigrid_tpu.core.step import base_step
from minigrid_tpu.envs.base import Env

# The packed layout itself (register rows, pack/unpack, visibility LUTs,
# direction tables, row readers, agent-centering rolls) lives in
# ops/packing.py; re-exported here — this module and its callers import
# these names from fused_rollout historically.
from minigrid_tpu.ops.packing import (  # noqa: E402,F401
    _AUX_LEN,
    _EMPTY_WORD,
    _MISSION_LEN,
    _WALL_WORD,
    _VMEM_BUDGET_BYTES,
    NUM_REGS,
    R_AUX,
    R_CC,
    R_CCC,
    R_CCT,
    R_CT,
    R_DIR,
    R_MISSION,
    R_RNG,
    R_SC,
    R_X,
    R_Y,
    key_rows,
    pack_states,
    rows_key,
    unpack_states,
    visibility_bitmask,
    _dir_tables,
    _matmul_rows,
    _roll_static,
    _roll_to_base,
    _sel4,
    _sliced_rows,
    _take_rows,
)


def _step_core(
    words: jnp.ndarray,  # (HW, B) int32, agent-centered rolled layout
    regs: jnp.ndarray,  # (NUM_REGS, B) int32
    a: jnp.ndarray,  # (1, B) int32
    tmpl_words: jnp.ndarray,  # (HW, B) rolled to the template agent's base
    tmpl_regs: jnp.ndarray,
    *,
    width: int,
    height: int,
    view: int,
    max_steps: int,
    see_through_walls: bool,
    row_reader=_sliced_rows,
    hook=None,  # packed_hooks.HOOKS entry for this family (or None)
    remap_action=None,  # packed_hooks.ACTION_REMAPS entry (or None)
    pre_hook=None,  # built packed_hooks.PRE_HOOK_FACTORIES entry (or None)
    with_obs=False,  # also return the post-step (vw, vis) view
    chunk_ctl=None,  # (3, B) int32 [consumed; steps_done; frozen] — the
    # exact-chunked-regen commit protocol (see below); None outside it
    chunk_len=None,  # static chunk length tc (required with chunk_ctl)
    ablate=frozenset(),  # profiling only (tools/profile_packed.py): stage
    # names to skip — "fwdwrite", "roll", "reset", "obs" — so the pruned
    # kernel's runtime attributes per-stage cost. NEVER set in production.
):
    """One packed transition + auto-reset + obs checksum.

    Returns `(words2, regs2, reward(1,B) f32, done(1,B) bool, obs_sum(1,B))`.
    Pure jnp on (rows, B) arrays — runs identically inside the Pallas kernel
    (values loaded from VMEM refs) and in the XLA scan body.

    Exact chunked regen (`chunk_ctl`): reference regen semantics give every
    reset a BRAND-NEW layout (minigrid.py:~722-748), but one chunk
    invocation carries only ONE fresh template per lane. The commit
    protocol makes that exact anyway: a lane whose episode ends while its
    template is already consumed (`consumed == 1`) FREEZES — the whole
    step is discarded (state, reward, done, obs checksum) and re-executed
    bit-identically on the next invocation, after the outer loop
    (`_build_chunked_regen`) has advanced its chain and installed the
    fresh layout the reference demands. `chunk_ctl` rows: `consumed`
    (0/1, this invocation's template used), `steps_done` (steps committed
    toward `chunk_len` this chunk — the lane's global action-stream
    cursor), `frozen` (0/1, lane stopped for this invocation). A lane
    commits steps strictly in order, so within one invocation the lanes'
    committed steps are a prefix of the (per-lane pre-shifted) action rows.

    Layout: `words` is AGENT-CENTERED — row s of lane b holds world cell
    `(base_b + s) % HW` where `base_b = y_b·W + x_b` is the agent's flat
    position. The agent is always row 0, so the forward cell and all V²
    egocentric view cells sit at per-direction COMPILE-TIME-CONSTANT rows
    (`_dir_tables`): reads are static slices, the observation gather is four
    static row-selections + a 4-way select, and a `forward` move is one
    static roll of the grid. This removes every per-lane dynamic address
    from the hot loop (the naive packed layout spent half its step budget on
    an O(HW·V²) masked-sum gather).
    """
    hw = width * height
    off_fwd, _, _, _ = _dir_tables(width, height, view)

    iota_hw = lax.broadcasted_iota(jnp.int32, (hw, 1), 0)  # (HW, 1)

    assert (chunk_ctl is None) == (chunk_len is None)
    words_in, regs_in = words, regs  # pre-everything (commit revert target)

    a_orig = a
    if remap_action is not None:
        a = remap_action(a)

    # Family PRE-hook (packed_hooks.py): stochastic pre-step grid mutation
    # (DynamicObstacles' obstacle walk), exactly where the vmap engine's
    # per-family `step` mutates the state before calling `base_step`. The
    # stash (e.g. pre-walk front-cell clearance) is handed to the
    # post-hook.
    stash = None
    if pre_hook is not None:
        words, regs, stash = pre_hook(words, regs)

    x = regs[R_X : R_X + 1, :]
    y = regs[R_Y : R_Y + 1, :]
    d = regs[R_DIR : R_DIR + 1, :]
    ct = regs[R_CT : R_CT + 1, :]
    cc = regs[R_CC : R_CC + 1, :]
    cct = regs[R_CCT : R_CCT + 1, :]
    ccc = regs[R_CCC : R_CCC + 1, :]
    sc = regs[R_SC : R_SC + 1, :]

    # ---- transition (core/step.py semantics, minigrid.py:~1087-1160) ------
    dirx = (d == 0).astype(jnp.int32) - (d == 2).astype(jnp.int32)
    diry = (d == 1).astype(jnp.int32) - (d == 3).astype(jnp.int32)
    fwd_x = x + dirx
    fwd_y = y + diry
    # Forward-cell read: 4 static rows of the rolled grid, select by dir.
    fwd4 = row_reader(words, off_fwd)  # (4, B)
    fwdw = _sel4(d, [fwd4[i : i + 1, :] for i in range(4)])
    ft = fwdw & 15
    fc = (fwdw >> 4) & 15
    fs = (fwdw >> 8) & 15
    fct = (fwdw >> 12) & 15
    fcc = (fwdw >> 16) & 15

    is_left = a == 0
    is_right = a == 1
    is_fwd = a == 2
    is_pickup = a == 3
    is_drop = a == 4
    is_toggle = a == 5

    d1 = jnp.where(is_right, d + 1, jnp.where(is_left, d + 3, d)) % 4

    can_overlap = (
        (ft == C.EMPTY)
        | (ft == C.FLOOR)
        | (ft == C.GOAL)
        | (ft == C.LAVA)
        | ((ft == C.DOOR) & (fs == C.STATE_OPEN))
    )
    moves = is_fwd & can_overlap
    x1 = jnp.where(moves, fwd_x, x)
    y1 = jnp.where(moves, fwd_y, y)

    sc1 = sc + 1
    hit_goal = is_fwd & (ft == C.GOAL)
    hit_lava = is_fwd & (ft == C.LAVA)
    terminated = hit_goal | hit_lava
    reward = jnp.where(
        hit_goal,
        1.0 - 0.9 * (sc1.astype(jnp.float32) / max_steps),
        jnp.zeros_like(sc1, dtype=jnp.float32),
    )

    hands_empty = ct == 0
    can_pickup = (ft == C.KEY) | (ft == C.BALL) | (ft == C.BOX)
    do_pickup = is_pickup & can_pickup & hands_empty
    do_drop = is_drop & (ft == C.EMPTY) & ~hands_empty

    ct1 = jnp.where(do_pickup, ft, jnp.where(do_drop, 0, ct))
    cc1 = jnp.where(do_pickup, fc, jnp.where(do_drop, 0, cc))
    cct1 = jnp.where(do_pickup, fct, jnp.where(do_drop, 0, cct))
    ccc1 = jnp.where(do_pickup, fcc, jnp.where(do_drop, 0, ccc))

    # Door toggle: locked opens iff carrying the matching-color key.
    has_key = (ct == C.KEY) & (cc == fc)
    new_door_state = jnp.where(
        fs == C.STATE_LOCKED,
        jnp.where(has_key, C.STATE_OPEN, C.STATE_LOCKED),
        1 - fs,
    )
    toggled_door = (fwdw & ~(15 << 8)) | (new_door_state << 8)
    # Box toggle: replaced by its contents (or an empty cell); the color
    # channel carries the contents color either way (core/step.py).
    toggled_box = jnp.where(fct > 0, fct, _EMPTY_WORD) | (fcc << 4)

    dropped = ct | (cc << 4) | (cct << 12) | (ccc << 16)
    new_fwd = fwdw
    new_fwd = jnp.where(do_pickup, _EMPTY_WORD, new_fwd)
    new_fwd = jnp.where(do_drop, dropped, new_fwd)
    new_fwd = jnp.where(is_toggle & (ft == C.DOOR), toggled_door, new_fwd)
    new_fwd = jnp.where(is_toggle & (ft == C.BOX), toggled_box, new_fwd)
    # Write-back at the forward cell: its rolled row is one of 4 constants.
    if "fwdwrite" in ablate:
        words1 = words
    else:
        off_f = _sel4(d, [jnp.full_like(d, o) for o in off_fwd])  # (1, B)
        fwd_mask = iota_hw == off_f  # (HW, B)
        words1 = jnp.where(fwd_mask, new_fwd, words)

    # ---- family post-hook (packed_hooks.py) --------------------------------
    # Runs on the base transition's outcome, exactly where the vmap engine's
    # per-family `step` wraps `base_step`. Absolute cell reads resolve in
    # the pre-step agent frame (`words` / `words1` are both rolled to it).
    if hook is not None:
        from minigrid_tpu.ops.packed_hooks import HookVals

        base = y * width + x  # (1, B) pre-step agent flat position

        def _read_abs(grid_words, ax, ay):
            row = ((ay * width + ax) - base) % hw  # (1, B)
            return jnp.sum(
                jnp.where(iota_hw == row, grid_words, 0), axis=0, keepdims=True
            )

        reward, terminated = hook(
            HookVals(
                a=a_orig,
                x=x, y=y, ct=ct, cc=cc,
                x1=x1, y1=y1, ct1=ct1, cc1=cc1,
                fwd_x=fwd_x, fwd_y=fwd_y,
                reward=reward,
                terminated=terminated,
                success=1.0 - 0.9 * (sc1.astype(jnp.float32) / max_steps),
                aux=regs[R_AUX : R_AUX + _AUX_LEN, :],
                read_pre=functools.partial(_read_abs, words),
                read_post=functools.partial(_read_abs, words1),
                stash=stash,
            )
        )

    # Re-center the grid on the agent after a forward move: a static roll by
    # the per-direction offset, selected branchlessly per lane.
    if "roll" in ablate:
        words_m = words1
    else:
        rolls = [_roll_static(words1, o) for o in off_fwd]
        words_m = words1
        for i in range(4):
            words_m = jnp.where(moves & (d == i), rolls[i], words_m)

    truncated = sc1 >= max_steps
    done = terminated | truncated

    # ---- template auto-reset (core/autoreset.py semantics) ----------------
    if "reset" in ablate:
        words2 = words_m
    else:
        words2 = jnp.where(done, tmpl_words, words_m)
    x2 = jnp.where(done, tmpl_regs[R_X : R_X + 1, :], x1)
    y2 = jnp.where(done, tmpl_regs[R_Y : R_Y + 1, :], y1)
    d2 = jnp.where(done, tmpl_regs[R_DIR : R_DIR + 1, :], d1)
    ct2 = jnp.where(done, tmpl_regs[R_CT : R_CT + 1, :], ct1)
    cc2 = jnp.where(done, tmpl_regs[R_CC : R_CC + 1, :], cc1)
    cct2 = jnp.where(done, tmpl_regs[R_CCT : R_CCT + 1, :], cct1)
    ccc2 = jnp.where(done, tmpl_regs[R_CCC : R_CCC + 1, :], ccc1)
    sc2 = jnp.where(done, 0, sc1)
    # aux + mission rows: inert during the episode, template on reset.
    tail2 = jnp.where(done, tmpl_regs[R_AUX:, :], regs[R_AUX:, :])
    regs2 = jnp.concatenate(
        [x2, y2, d2, ct2, cc2, cct2, ccc2, sc2, tail2], axis=0
    )

    # ---- exact-chunked-regen commit protocol (see docstring) --------------
    commit = None
    if chunk_ctl is not None:
        consumed = chunk_ctl[0:1, :]
        steps_done = chunk_ctl[1:2, :]
        frozen = chunk_ctl[2:3, :]
        active = (steps_done < chunk_len) & (frozen == 0)
        # A done while the invocation's fresh template is already consumed
        # would have to REUSE it (a layout the reference never produces) —
        # freeze instead: discard this step wholesale; the outer loop
        # re-executes it bit-identically with a fresh template installed.
        freeze_now = active & done & (consumed == 1)
        commit = active & ~freeze_now
        words2 = jnp.where(commit, words2, words_in)
        regs2 = jnp.where(commit, regs2, regs_in)
        done = done & commit
        reward = jnp.where(commit, reward, 0.0)
        chunk_ctl2 = jnp.concatenate(
            [
                jnp.where(done, 1, consumed),
                steps_done + commit.astype(jnp.int32),
                frozen | freeze_now.astype(jnp.int32),
            ],
            axis=0,
        )

    # ---- post-step observation (the next policy input) --------------------
    if "obs" in ablate:
        vw = jnp.zeros((view * view, words.shape[1]), jnp.int32)
        vis = jnp.ones_like(vw)
        obs_sum = jnp.sum(words2[0:1] & 15, axis=0, keepdims=True)
    else:
        vw, vis = _obs_core(
            words2,
            regs2,
            width=width,
            height=height,
            view=view,
            see_through_walls=see_through_walls,
            row_reader=row_reader,
        )

        # ---- obs checksum (type+color+state over visible cells) -----------
        tcs = (vw & 15) + ((vw >> 4) & 15) + ((vw >> 8) & 15)
        obs_sum = jnp.sum(tcs * vis, axis=0, keepdims=True)

    out = (words2, regs2, reward, done)
    if chunk_ctl is not None:
        # Only committed steps contribute to the checksum (the obs above is
        # computed from the already-reverted state for frozen lanes).
        out += (jnp.where(commit, obs_sum, 0), chunk_ctl2)
    else:
        out += (obs_sum,)
    if with_obs:
        out += (vw, vis)
    return out


def _obs_core(
    words: jnp.ndarray,  # (HW, B) int32, agent-centered rolled layout
    regs: jnp.ndarray,  # (NUM_REGS, B) int32
    *,
    width: int,
    height: int,
    view: int,
    see_through_walls: bool,
    row_reader=_sliced_rows,
):
    """Egocentric view of a packed state: `(vw, vis)`, both `(V², B)` int32.

    `vw[j·V + i]` is the packed word of egocentric view cell (row j, col i)
    — row-major, agent at (row V-1, col V//2), same layout as
    `core.obs.gen_obs_grid` — wall-filled out of bounds, carried-object
    overlay applied; `vis` is the occlusion mask (1 = visible). Shared by
    `_step_core` (post-step obs + checksum) and callers that need the
    pre-action observation of a freshly packed state (parallel/train.py).
    """
    hw = width * height
    half = view // 2
    agent_k = (view - 1) * view + half
    _, off_view, _, _ = _dir_tables(width, height, view)
    kvec = lax.broadcasted_iota(jnp.int32, (view * view, 1), 0)
    pow_i = 1 << (kvec % view)

    x2 = regs[R_X : R_X + 1, :]
    y2 = regs[R_Y : R_Y + 1, :]
    d2 = regs[R_DIR : R_DIR + 1, :]
    ct2 = regs[R_CT : R_CT + 1, :]
    cc2 = regs[R_CC : R_CC + 1, :]

    # ---- egocentric view read (static rows of the re-centered grid) -------
    v2 = view * view
    vw_all = row_reader(words, np.concatenate(off_view))  # (4·V², B)
    vw4 = [vw_all[i * v2 : (i + 1) * v2] for i in range(4)]
    vw = _sel4(d2, vw4)
    # OOB mask: in rolled coordinates OOB reads wrap around the grid, so
    # mask them with the world-frame extents (wall fill, Grid.slice
    # semantics, minigrid.py:~467-490). Offsets are rebuilt arithmetically
    # from iota (a Pallas kernel cannot capture constant arrays).
    rdv = (view - 1) - kvec // view  # forward distance per view cell
    cov = kvec % view - half  # lateral offset per view cell
    f0 = (d2 == 0).astype(jnp.int32) - (d2 == 2).astype(jnp.int32)
    f1 = (d2 == 1).astype(jnp.int32) - (d2 == 3).astype(jnp.int32)
    wx = x2 + f0 * rdv - f1 * cov  # (V², B)
    wy = y2 + f1 * rdv + f0 * cov
    inb = (wx >= 0) & (wx < width) & (wy >= 0) & (wy < height)
    vw = jnp.where(inb, vw, _WALL_WORD)
    # Carried-object overlay on the agent's own view cell.
    agent_word = jnp.where(ct2 > 0, ct2 | (cc2 << 4), _EMPTY_WORD)
    vw = jnp.where(kvec == agent_k, agent_word, vw)

    # ---- occlusion flood on V-bit row masks (core/vision.py) --------------
    if see_through_walls:
        vis = jnp.ones_like(vw)
    else:
        vt = vw & 15
        vs = (vw >> 8) & 15
        trans = (
            ~((vt == C.WALL) | ((vt == C.DOOR) & (vs != C.STATE_OPEN)))
        ).astype(jnp.int32)
        trans_bits = trans * pow_i  # (V², B)
        trans_rows = jnp.concatenate(
            [
                jnp.sum(trans_bits[j * view : (j + 1) * view], axis=0, keepdims=True)
                for j in range(view)
            ],
            axis=0,
        )  # (V, B)
        vis_rows = visibility_bitmask(trans_rows, view)  # (V, B)
        vis = (
            jnp.concatenate(
                [
                    jnp.broadcast_to(vis_rows[j : j + 1, :], (view, vis_rows.shape[1]))
                    for j in range(view)
                ],
                axis=0,
            )
            >> (kvec % view)
        ) & 1
    return vw, vis


def packed_obs_image(vw: jnp.ndarray, vis: jnp.ndarray, view: int) -> jnp.ndarray:
    """`(V², B)` packed view words + visibility → the `(B, V, V, 3)` uint8
    observation image of `core.obs.gen_obs_image` ([x, y]-indexed, unseen
    cells zeroed) — asserted byte-identical in tests/test_fused_rollout.py."""
    t = (vw & 15) * vis
    c = ((vw >> 4) & 15) * vis
    s = ((vw >> 8) & 15) * vis
    img = jnp.stack([t, c, s], axis=-1)  # (V², B, 3); kv = y·V + x
    img = img.reshape(view, view, -1, 3)  # (y, x, B, 3)
    return img.transpose(2, 1, 0, 3).astype(jnp.uint8)  # (B, x, y, 3)


# --------------------------------------------------------------------------
# The Pallas kernel
# --------------------------------------------------------------------------


def _rollout_kernel(
    *refs,
    width: int,
    height: int,
    view: int,
    max_steps: int,
    step_chunk: int,
    see_through_walls: bool,
    hook=None,
    remap_action=None,
    pre_hook=None,
    ablate=frozenset(),
    matmul_reader: bool = False,
    chunk_exact: bool = False,
):
    """Ref order: inputs (words0, regs0, tmpl_words, tmpl_regs, actions,
    sel[, ctl0]), outputs (words, regs, rsum, counts[, ctl]), scratch
    (words, regs, rsum, epi, csum[, ctl]). `sel` is the (4+4V², HW) f32
    row-selection matrix (dummy when the matmul reader is off); the `ctl`
    blocks are the (3, B) exact-chunked-regen commit state (`_step_core`'s
    `chunk_ctl`), present iff `chunk_exact`."""
    if chunk_exact:
        (
            words0_ref, regs0_ref, tmpl_words_ref, tmpl_regs_ref,
            actions_ref, sel_ref, ctl0_ref,
            words_out_ref, regs_out_ref, rsum_ref, counts_ref, ctl_out_ref,
            words_s, regs_s, rsum_s, epi_s, csum_s, ctl_s,
        ) = refs
    else:
        (
            words0_ref, regs0_ref, tmpl_words_ref, tmpl_regs_ref,
            actions_ref, sel_ref,
            words_out_ref, regs_out_ref, rsum_ref, counts_ref,
            words_s, regs_s, rsum_s, epi_s, csum_s,
        ) = refs
        ctl0_ref = ctl_out_ref = ctl_s = None

    # First step-chunk for this batch block: load state, zero accumulators.
    @pl.when(pl.program_id(1) == 0)
    def _init():
        words_s[:] = words0_ref[:]
        regs_s[:] = regs0_ref[:]
        rsum_s[:] = jnp.zeros_like(rsum_s)
        epi_s[:] = jnp.zeros_like(epi_s)
        csum_s[:] = jnp.zeros_like(csum_s)
        if chunk_exact:
            ctl_s[:] = ctl0_ref[:]

    tmpl_words = tmpl_words_ref[:]
    tmpl_regs = tmpl_regs_ref[:]

    if matmul_reader:
        # Row reads as ONE MXU matmul against the input selection matrix
        # (a Mosaic kernel cannot capture large trace-time constants, so
        # the 0/1 matrix arrives as an input). Exact: packed words < 2^20
        # < 2^24 (f32 mantissa) and each output row copies one input row.
        # The only two row sets `_step_core`/`_obs_core` read are the
        # 4-row forward set and the 4V²-row view set, laid out in sel as
        # [fwd(4); view(4V²)] — disambiguated by length.
        def row_reader(x, rows):
            n = len(rows)
            sl = sel_ref[0:4, :] if n == 4 else sel_ref[4 : 4 + n, :]
            return jnp.dot(
                sl, x.astype(jnp.float32),
                preferred_element_type=jnp.float32,
            ).astype(jnp.int32)
    else:
        row_reader = _sliced_rows

    def step(t, _):
        a = actions_ref[pl.ds(t, 1), :]  # (1, Bt) int32
        out = _step_core(
            words_s[:],
            regs_s[:],
            a,
            tmpl_words,
            tmpl_regs,
            width=width,
            height=height,
            view=view,
            max_steps=max_steps,
            see_through_walls=see_through_walls,
            row_reader=row_reader,
            hook=hook,
            remap_action=remap_action,
            pre_hook=pre_hook,
            chunk_ctl=ctl_s[:] if chunk_exact else None,
            chunk_len=step_chunk if chunk_exact else None,
            ablate=ablate,
        )
        if chunk_exact:
            words2, regs2, reward, done, obs_sum, ctl2 = out
            ctl_s[:] = ctl2
        else:
            words2, regs2, reward, done, obs_sum = out
        words_s[:] = words2
        regs_s[:] = regs2
        rsum_s[:] = rsum_s[:] + reward
        epi_s[:] = epi_s[:] + done.astype(jnp.int32)
        csum_s[:] = csum_s[:] + obs_sum
        return 0

    lax.fori_loop(0, step_chunk, step, 0)

    # The output blocks live in VMEM for the whole (fixed-i) chunk sweep and
    # are flushed to HBM when the batch block advances, so unconditional
    # stores here are cheap; only the last chunk's values survive.
    words_out_ref[:] = words_s[:]
    regs_out_ref[:] = regs_s[:]
    rsum_ref[:] = rsum_s[:]
    counts_ref[:] = jnp.concatenate([epi_s[:], csum_s[:]], axis=0)
    if chunk_exact:
        ctl_out_ref[:] = ctl_s[:]


# --------------------------------------------------------------------------
# Host-side wrappers
# --------------------------------------------------------------------------

# Layout-deterministic families: the generator ignores the key for
# everything except the stored rng leaf, so template auto-reset reproduces
# "regen" semantics exactly.
_DETERMINISTIC_LAYOUT = ("empty", "distshift")


def _is_base_step(env: Env) -> bool:
    return env.transition is base_step


def _packed_hook(env: Env):
    """(hook, remap_action, pre_hook) for this env's transition, or all-None
    for the base step kernel. Raises KeyError-free: an unknown transition
    simply has no packed support (see `fused_rollout_supported`)."""
    if _is_base_step(env):
        return None, None, None
    from minigrid_tpu.ops.packed_hooks import (
        ACTION_REMAPS,
        HOOKS,
        PRE_HOOK_FACTORIES,
    )

    factory = PRE_HOOK_FACTORIES.get(env.transition)
    return (
        HOOKS.get(env.transition),
        ACTION_REMAPS.get(env.transition),
        factory(env.config) if factory is not None else None,
    )


def _has_packed_step(env: Env) -> bool:
    if _is_base_step(env):
        return True
    from minigrid_tpu.ops.packed_hooks import HOOKS

    return env.transition in HOOKS


def _regen_is_static(env: Env) -> bool:
    """True iff template auto-reset alone reproduces regen semantics for
    `env` — the layout is key-independent (fixed Empty variants, DistShift),
    so every reset regenerates the identical grid and no per-chunk template
    refresh is needed."""
    cfg = env.config
    return (
        _is_base_step(env)
        and cfg.family in _DETERMINISTIC_LAYOUT
        and (cfg.family != "empty" or cfg.agent_start_pos is not None)
    )


def fused_rollout_supported(
    env: Env, batch_size: Optional[int] = None, mode: str = "regen"
) -> bool:
    """True iff the packed rollouts (`build_fused_rollout` /
    `build_packed_xla_rollout`) support `env` under `mode`.

    Both modes cover every family whose transition is the base step kernel
    or has a registered packed hook (packed_hooks.py). mode="cached" is
    byte-exact vs `build_rollout(..., autoreset_mode="cached")`; for
    mode="regen", deterministic-layout families are exact via the static
    template, and random-layout families run the exact chunked
    template-refresh scheme (`_build_chunked_regen`: fresh layout per
    reset; in-chunk repeat resets deferred to a re-entry pass) — byte-exact
    vs the vmap regen path for ANY `regen_chunk`.
    """
    cfg = env.config
    if not _has_packed_step(env):
        return False
    if mode not in ("regen", "cached"):
        return False
    # VMEM sizing: the auto-derived lane block must be viable (>= 128).
    ok = _auto_lane_block(cfg.width * cfg.height, 1024) >= 128
    if batch_size is not None:
        ok = ok and batch_size % 128 == 0
    return ok


def _auto_lane_block(hw: int, step_chunk: int, fixed_bytes: int = 0) -> int:
    """Largest lane block (multiple of 128) fitting the VMEM budget.

    Resident per lane: grid words ×4 (in, template, out, scratch) + regs ×4
    + actions chunk + accumulators, all int32. `fixed_bytes` covers
    lane-independent residents (the matmul-reader selection matrix).
    """
    words_per_lane = 4 * hw + 4 * NUM_REGS + step_chunk + 8
    max_lanes = max(0, _VMEM_BUDGET_BYTES - fixed_bytes) // (4 * words_per_lane)
    return (max_lanes // 128) * 128


def _replay_rng_chain_fn(step_rng, rng0: jnp.ndarray, n_resets: jnp.ndarray):
    """Apply the regen-mode rng chain `rng <- step_rng(rng)` n times per lane
    (bounded while_loop; iterates max(n_resets) times)."""

    def cond(carry):
        return jnp.any(carry[1] > 0)

    def body(carry):
        rng, rem = carry
        nxt = step_rng(rng)
        take = rem > 0
        rng = jnp.where(take[:, None], nxt, rng)
        return rng, rem - take.astype(rem.dtype)

    return lax.while_loop(cond, body, (rng0, n_resets))[0]


def _replay_rng_chain(env: Env, rng0: jnp.ndarray, n_resets: jnp.ndarray):
    """Apply the regen-mode rng chain `rng <- generate(rng).rng` n times.

    The XLA regen auto-reset path (core/autoreset.py) stores
    `generate(state.rng).rng` on every reset; replaying that chain from the
    per-env episode count reproduces the exact final keys. Only the rng leaf
    of `generate` is consumed, so XLA dead-code-eliminates the layout work.
    """
    step_rng = jax.vmap(lambda k: env.generate(k, env.config).rng)
    return _replay_rng_chain_fn(step_rng, rng0, n_resets)


def _agent_base(regs: jnp.ndarray, width: int) -> jnp.ndarray:
    return regs[R_Y : R_Y + 1, :] * width + regs[R_X : R_X + 1, :]  # (1, B)


def _pack_rolled(cfg: EnvConfig, states: EnvState):
    """`pack_states` + the one-time agent-centering roll."""
    words, regs = pack_states(states)
    return _roll_to_base(words, _agent_base(regs, cfg.width)), regs


def _prepare_packed(env: Env, states: EnvState, mode: str = "regen"):
    """Packed + agent-center-rolled live state and reset template.

    The reset target is each env's own layout, regenerated from its rng
    leaf (identical to the live layout for deterministic families; the
    pinned layout in cached mode). In cached mode the template's rng
    register rows are pinned back to the live key, so every reset replays
    the SAME layout (core/autoreset.py's `fresh.replace(rng=state.rng)`);
    in regen mode they carry the generator's fresh subkey — the next link
    of the reset chain."""
    from minigrid_tpu.ops.packed_gen import get_packed_generator

    cfg = env.config
    words0, regs0 = _pack_rolled(cfg, states)
    gp = get_packed_generator(env)
    if gp is not None:
        tmpl_words, tmpl_regs = gp(states.rng, cfg)
    else:
        template = jax.vmap(lambda s: env.generate(s.rng, cfg))(states)
        tmpl_words, tmpl_regs = _pack_rolled(cfg, template)
    if mode == "cached":
        tmpl_regs = tmpl_regs.at[R_RNG : R_RNG + 2].set(key_rows(states.rng))
    return words0, regs0, tmpl_words, tmpl_regs


def _action_stream(env: Env, num_steps: int, key, states: EnvState):
    """The `(T, B)` random-policy action stream (identical to the stream
    `core.rollout.build_rollout` samples under the same key, enabling
    step-for-step equivalence tests)."""
    return _action_stream_b(env, num_steps, key, states.step_count.shape[0])


def _unpack_rolled(cfg: EnvConfig, words_f: jnp.ndarray, regs_f: jnp.ndarray):
    """Undo the agent-centered roll (inverse roll by HW − base), unpack."""
    hw = cfg.width * cfg.height
    base_f = _agent_base(regs_f, cfg.width)
    words_f = _roll_to_base(words_f, (hw - base_f) % hw)
    return unpack_states(words_f, regs_f, cfg)


def _fit_chunk(num_steps: int, chunk: int) -> int:
    """Largest divisor of `num_steps` that is ≤ `chunk`."""
    tc = min(chunk, num_steps)
    while num_steps % tc:
        tc -= 1
    return tc


# --------------------------------------------------------------------------
# Steady-state (carry) API
#
# The legacy `rollout(key, states)` surface pays per CALL: template
# generation (`vmap(env.generate)` over the whole batch — for procedural
# families like MultiRoom this dwarfs the kernel at small `num_steps`),
# the two agent-centering `_roll_to_base` passes, pack, and unpack. A
# production loop calls the rollout thousands of times back to back, where
# all of that is loop-invariant (cached mode) or already per-chunk
# (regen). The carry API hoists it: `packed_init` once, then each
# `step_fn(key, carry) -> (carry, metrics)` call runs ONLY the kernel,
# the action stream, and (regen) the per-chunk refresh; `packed_finish`
# unpacks once at the end. The legacy builders are thin wrappers
# (init → one step → finish), so the two surfaces cannot diverge.
# --------------------------------------------------------------------------


class PackedCarry(NamedTuple):
    """Opaque device state threaded between carry-API rollout calls.

    `words`/`regs` are the live packed state (agent-centered rolled
    layout); `tmpl_*` the auto-reset template — the pinned layout in
    cached mode, and in chunked-regen mode each lane's NEXT fresh layout
    (invariant `tmpl == generate(rng)` per lane, maintained incrementally
    by `_masked_template_refresh`); `rng` the `(B, 2)` uint32 regen
    reset-chain position (`EnvState.rng` semantics — the register file's
    rng rows only hold the LAST reset's key, which lags it).
    """

    words: jnp.ndarray
    regs: jnp.ndarray
    tmpl_words: Optional[jnp.ndarray]
    tmpl_regs: Optional[jnp.ndarray]
    rng: jnp.ndarray


def packed_init(env: Env, states: EnvState, mode: str = "regen") -> PackedCarry:
    """Pack a batched `EnvState` into a `PackedCarry` (one-time cost).

    In every mode the carry holds a template per lane: chunked-regen mode
    seeds it with `generate(state.rng)` — each lane's next fresh layout —
    after which `_build_chunked_regen` maintains it incrementally."""
    words0, regs0, tmpl_words, tmpl_regs = _prepare_packed(env, states, mode)
    return PackedCarry(words0, regs0, tmpl_words, tmpl_regs, states.rng)


def packed_finish(env: Env, carry: PackedCarry) -> EnvState:
    """Unpack a `PackedCarry` back into a batched `EnvState`."""
    final = _unpack_rolled(env.config, carry.words, carry.regs)
    return final.replace(rng=carry.rng)


def _wrap_legacy(env: Env, mode: str, step_carry):
    """The legacy `rollout(key, states)` surface as init → step → finish."""

    def rollout(key: jax.Array, states: EnvState):
        carry = packed_init(env, states, mode)
        carry, metrics = step_carry(key, carry)
        return packed_finish(env, carry), metrics

    return rollout


def _make_plain_carry_step(
    env: Env, num_steps: int, mode: str, run_core, actions_override=None
):
    """Carry step for the static-template paths (cached mode, or regen on
    deterministic-layout families).

    `run_core(words, regs, tmpl_words, tmpl_regs, actions)` executes the
    whole `num_steps` and returns `(words', regs', rsum, epi, csum)` with
    `(1, B)` per-lane accumulators.
    """

    def step_carry(key: jax.Array, carry: PackedCarry):
        b = carry.words.shape[1]
        actions = _action_stream_b(env, num_steps, key, b, actions_override)
        words_f, regs_f, rsum, epi, csum = run_core(
            carry.words, carry.regs, carry.tmpl_words, carry.tmpl_regs, actions
        )
        rng = carry.rng
        if mode == "regen":
            # Deterministic-layout families: advance each lane's reset
            # chain by its episode count (rng-leaf-only replay — XLA
            # dead-code-eliminates the layout math).
            rng = _replay_rng_chain(env, rng, epi[0])
        metrics = RolloutMetrics(
            episodes=jnp.sum(epi),
            total_reward=jnp.sum(rsum),
            total_steps=jnp.int32(b * num_steps),
            obs_checksum=jnp.sum(csum),
            reset_overlaps=jnp.zeros((), jnp.int32),
        )
        return (
            PackedCarry(
                words_f, regs_f, carry.tmpl_words, carry.tmpl_regs, rng
            ),
            metrics,
        )

    return step_carry


def _action_stream_b(env: Env, num_steps: int, key, b: int, override=None):
    """`_action_stream` from a bare batch size (carry API — no EnvState).

    `override` (a `(T, B)` or `(T,)` int array) replaces the random-policy
    stream — the scripted-solution tests drive the engines with hand-planned
    solves through it (a `(T,)` script broadcasts across lanes)."""
    if override is not None:
        actions = jnp.asarray(override, jnp.int32)
        if actions.ndim == 1:
            actions = jnp.broadcast_to(actions[:, None], (num_steps, b))
        return actions
    policy = random_policy(env.config.num_actions)
    keys = jax.random.split(key, num_steps)
    actions = jax.vmap(lambda k: policy(k, jnp.zeros((b, 1), jnp.int32)))(keys)
    return actions.astype(jnp.int32)


# Exact chunked regen (freeze/re-entry commit protocol) lives in
# ops/chunked_regen.py; these aliases keep the historical private names
# importable from here (parallel/train.py, older tests).
from minigrid_tpu.ops.chunked_regen import (  # noqa: E402
    build_chunked_regen as _build_chunked_regen,
    masked_template_refresh as _masked_template_refresh,
    refresh_block_size as _refresh_block_size,
)
from minigrid_tpu.utils.platform import mosaic_available as _mosaic_available


def build_fused_rollout(
    env: Env,
    num_steps: int,
    lane_block: Optional[int] = None,
    step_chunk: int = 128,
    mode: str = "regen",
    interpret: Optional[bool] = None,
    regen_chunk: int = 32,
    refresh_block: Optional[int] = None,
    _ablate: frozenset = frozenset(),
    as_carry: bool = False,
    row_reader: str = "auto",
    actions_override=None,
):
    """Returns `rollout(key, states) -> (states, RolloutMetrics)` — the
    single-pallas_call backend — or, with `as_carry=True`, the
    steady-state `step(key, carry) -> (carry, RolloutMetrics)` surface
    (see `packed_init`/`packed_finish`), which skips the per-call
    template-generation/pack/unpack cost of the legacy surface.

    `row_reader`: how the kernel reads the per-direction forward/view rows
    — "slices" (4 + 4V² single-row static slices), "matmul" (one MXU
    matmul against an input 0/1 selection matrix; exact, see
    `_rollout_kernel`), or "auto". Measured on 1× v5e: matmul won a
    standalone microbenchmark at HW=625 (~27%/step) but LOST in the full
    kernel (MultiRoom-N4 steady 137M vs 144M steps/s — the slice chain
    overlaps with the rest of the step, the MXU issue does not), so
    "auto" currently always picks slices; "matmul" stays available and
    equivalence-tested for future hardware where the tradeoff flips.

    Drop-in for `core.rollout.build_rollout(env, num_steps)` (mode="regen")
    or `build_rollout(env, num_steps, autoreset_mode="cached")`
    (mode="cached") on supported families: same action stream under the
    same key, same auto-reset semantics, same integer metrics
    (`total_reward` to float tolerance — see module docstring). Equivalence
    is asserted by tests/test_fused_rollout.py; measured speedup vs the
    vmap path is recorded in BENCH_*.json by bench.py.

    mode="regen" on random-layout families runs the exact chunked
    template-refresh scheme (`_build_chunked_regen`): the kernel executes
    `regen_chunk` steps per invocation under an outer scan that installs
    each lane's next fresh layout between invocations; in-chunk repeat
    resets are deferred to a re-entry pass (freeze/resume commit protocol)
    so the result is byte-exact vs the vmap regen path for ANY
    `regen_chunk` (`metrics.reset_overlaps` counts the deferred resets —
    extra kernel passes, not an exactness caveat). `refresh_block` sizes
    the compacted template-regeneration slices (default `max(128, B/8)`).
    """
    if not fused_rollout_supported(env, mode=mode):
        raise ValueError(
            f"packed rollout (mode={mode!r}) does not support {env.env_id!r}; "
            "use core.rollout.build_rollout"
        )
    cfg = env.config
    if interpret is None:
        interpret = not _mosaic_available()

    refresh = mode == "regen" and not _regen_is_static(env)
    # Bound the per-invocation step chunk (second grid dim walks the chunks;
    # with template refresh each invocation IS one chunk).
    tc = _fit_chunk(num_steps, regen_chunk if refresh else step_chunk)
    num_chunks = num_steps // tc

    hw = cfg.width * cfg.height
    if row_reader not in ("auto", "slices", "matmul"):
        raise ValueError(f"unknown row_reader {row_reader!r}")
    use_mm = row_reader == "matmul"
    # The kernel's matmul reader keys the [fwd(4); view(4V²)] selection
    # sub-matrix off len(rows), which would alias at V == 1 (4V² == 4).
    # EnvConfig asserts V odd and ≥ 3, so this is belt-and-braces.
    assert cfg.agent_view_size > 1, "row_reader='matmul' requires view > 1"
    v0 = cfg.agent_view_size
    sel_bytes = (4 + 4 * v0 * v0) * hw * 4 if use_mm else 8 * 128 * 4
    auto_bt = _auto_lane_block(hw, tc, fixed_bytes=sel_bytes)
    if lane_block is None:
        lane_block = min(512, auto_bt)
    if lane_block > auto_bt:
        raise ValueError(
            f"lane_block={lane_block} exceeds the VMEM budget for a "
            f"{cfg.width}x{cfg.height} grid (max {auto_bt})"
        )
    v = cfg.agent_view_size
    off_fwd, off_view, _, _ = _dir_tables(cfg.width, cfg.height, v)
    sel_rows = np.concatenate([np.asarray(off_fwd, np.int32)] + off_view)
    if use_mm:
        sel_np = np.zeros((len(sel_rows), hw), np.float32)
        sel_np[np.arange(len(sel_rows)), sel_rows] = 1.0
    else:
        sel_np = np.zeros((8, 128), np.float32)  # unused dummy input

    hook, remap_action, pre_hook = _packed_hook(env)
    kernel = functools.partial(
        _rollout_kernel,
        width=cfg.width,
        height=cfg.height,
        view=v,
        max_steps=cfg.max_steps,
        step_chunk=tc,
        see_through_walls=cfg.see_through_walls,
        hook=hook,
        remap_action=remap_action,
        pre_hook=pre_hook,
        ablate=_ablate,
        matmul_reader=use_mm,
        chunk_exact=refresh,
    )

    def pallas_run(
        words0, regs0, tmpl_words, tmpl_regs, actions, n_chunks, ctl0=None
    ):
        b = words0.shape[1]
        bt = min(lane_block, b)
        if b % bt:
            raise ValueError(f"batch {b} not divisible by lane block {bt}")
        state_block = lambda rows: pl.BlockSpec((rows, bt), lambda i, j: (0, i))
        action_block = pl.BlockSpec((tc, bt), lambda i, j: (j, i))
        sel_block = pl.BlockSpec(sel_np.shape, lambda i, j: (0, 0))
        in_specs = [
            state_block(hw),
            state_block(NUM_REGS),
            state_block(hw),
            state_block(NUM_REGS),
            action_block,
            sel_block,
        ]
        out_specs = [
            state_block(hw),
            state_block(NUM_REGS),
            state_block(1),
            state_block(2),
        ]
        out_shape = [
            jax.ShapeDtypeStruct((hw, b), jnp.int32),
            jax.ShapeDtypeStruct((NUM_REGS, b), jnp.int32),
            jax.ShapeDtypeStruct((1, b), jnp.float32),
            jax.ShapeDtypeStruct((2, b), jnp.int32),
        ]
        scratch_shapes = [
            pltpu.VMEM((hw, bt), jnp.int32),
            pltpu.VMEM((NUM_REGS, bt), jnp.int32),
            pltpu.VMEM((1, bt), jnp.float32),
            pltpu.VMEM((1, bt), jnp.int32),
            pltpu.VMEM((1, bt), jnp.int32),
        ]
        operands = [words0, regs0, tmpl_words, tmpl_regs, actions,
                    jnp.asarray(sel_np)]
        if ctl0 is not None:
            in_specs.append(state_block(3))
            out_specs.append(state_block(3))
            out_shape.append(jax.ShapeDtypeStruct((3, b), jnp.int32))
            scratch_shapes.append(pltpu.VMEM((3, bt), jnp.int32))
            operands.append(ctl0)
        return pl.pallas_call(
            kernel,
            grid=(b // bt, n_chunks),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            scratch_shapes=scratch_shapes,
            compiler_params=pltpu.CompilerParams(
                # Batch blocks (i) are independent — only the step-chunk
                # dim (j) carries state (scratch persists across j).
                dimension_semantics=("parallel", "arbitrary"),
            ),
            interpret=interpret,
        )(*operands)

    if refresh:

        def chunk_fn(words, regs, tmpl_words, tmpl_regs, a_chunk, ctl0):
            words_f, regs_f, rsum, counts, ctl = pallas_run(
                words, regs, tmpl_words, tmpl_regs, a_chunk, 1, ctl0
            )
            return words_f, regs_f, ctl, rsum, counts[0:1], counts[1:2]

        step_carry = _build_chunked_regen(
            env, num_steps, tc, chunk_fn, refresh_block=refresh_block,
            actions_override=actions_override,
        )
    else:

        def run_core(words, regs, tmpl_words, tmpl_regs, actions):
            words_f, regs_f, rsum, counts = pallas_run(
                words, regs, tmpl_words, tmpl_regs, actions, num_chunks
            )
            return words_f, regs_f, rsum, counts[0:1], counts[1:2]

        step_carry = _make_plain_carry_step(
            env, num_steps, mode, run_core, actions_override
        )

    if as_carry:
        return step_carry
    return _wrap_legacy(env, mode, step_carry)


def build_packed_xla_rollout(
    env: Env,
    num_steps: int,
    mode: str = "regen",
    regen_chunk: int = 32,
    refresh_block: Optional[int] = None,
    as_carry: bool = False,
    actions_override=None,
):
    """Returns `rollout(key, states) -> (states, RolloutMetrics)` — the
    packed-lane layout under a plain `lax.scan` (no Pallas). With
    `as_carry=True`, the steady-state carry surface instead (see
    `build_fused_rollout`).

    Identical semantics and metrics to `build_fused_rollout` (they share
    `_step_core` and `_build_chunked_regen`); XLA schedules each step as
    fused full-lane VPU ops over the `(H·W, B)` / `(NUM_REGS, B)` arrays,
    with one HBM round-trip per step instead of the kernel's VMEM
    residency. Use as the portable fast path and as a second reference for
    kernel equivalence tests.
    """
    if not fused_rollout_supported(env, mode=mode):
        raise ValueError(
            f"packed rollout (mode={mode!r}) does not support {env.env_id!r}; "
            "use core.rollout.build_rollout"
        )
    cfg = env.config

    hook, remap_action, pre_hook = _packed_hook(env)
    step_math = functools.partial(
        _step_core,
        width=cfg.width,
        height=cfg.height,
        view=cfg.agent_view_size,
        max_steps=cfg.max_steps,
        see_through_walls=cfg.see_through_walls,
        row_reader=_matmul_rows,
        hook=hook,
        remap_action=remap_action,
        pre_hook=pre_hook,
    )

    def scan_chunk(words, regs, tmpl_words, tmpl_regs, actions, ctl0=None):
        b = words.shape[1]
        zeros_f = jnp.zeros((1, b), jnp.float32)
        zeros_i = jnp.zeros((1, b), jnp.int32)
        chunk_len = actions.shape[0] if ctl0 is not None else None

        def body(carry, a_t):
            words, regs, ctl, rsum, epi, csum = carry
            out = step_math(
                words, regs, a_t[None, :], tmpl_words, tmpl_regs,
                chunk_ctl=ctl, chunk_len=chunk_len,
            )
            if ctl0 is not None:
                words2, regs2, reward, done, obs_sum, ctl = out
            else:
                words2, regs2, reward, done, obs_sum = out
            return (
                words2,
                regs2,
                ctl,
                rsum + reward,
                epi + done.astype(jnp.int32),
                csum + obs_sum,
            ), None

        (words_f, regs_f, ctl, rsum, epi, csum), _ = lax.scan(
            body, (words, regs, ctl0, zeros_f, zeros_i, zeros_i), actions
        )
        if ctl0 is not None:
            return words_f, regs_f, ctl, rsum, epi, csum
        return words_f, regs_f, rsum, epi, csum

    if mode == "regen" and not _regen_is_static(env):
        tc = _fit_chunk(num_steps, regen_chunk)
        step_carry = _build_chunked_regen(
            env, num_steps, tc, scan_chunk, refresh_block=refresh_block,
            actions_override=actions_override,
        )
    else:
        step_carry = _make_plain_carry_step(
            env, num_steps, mode, scan_chunk, actions_override
        )

    if as_carry:
        return step_carry
    return _wrap_legacy(env, mode, step_carry)
