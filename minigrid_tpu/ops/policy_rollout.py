"""Policy-in-kernel rollouts: the actor fused into the packed step kernel.

The packed train step (`parallel/train.py`) runs env simulation in the
packed lane layout but hops back to XLA between steps for the policy
apply — per step the `(HW, B)` state round-trips HBM, the obs converts to
a `(B, V, V, 3)` image, one-hots to a `(B, 980)` feature block, and one
`(B, 980)×(980, 256)` matmul runs per step (BASELINE.md "Train-step
profile" attributes ~42% of the train budget to this rollout side). This
module fuses the WHOLE policy-in-the-loop rollout into the kernel:

  * the actor-critic torso runs on the MXU inside the kernel: weights
    (~0.7 MB bf16) ride in VMEM next to the env state, features are built
    from the packed egocentric view with ~20 vectorized compares (one per
    one-hot LANE VALUE, not one per cell — the weight matrix is
    column-permuted host-side to match the cheap value-major feature
    layout, `eval_weights_from_params`), and each step runs one
    `(256, 980) @ (980, lanes)` bf16 matmul;
  * action sampling is inverse-CDF on the softmax with one counter-based
    Threefry uniform per (step, lane) (`core/prng.py`), seeded by a
    precomputed `(T, B)` int32 seed array — the XLA twin consumes the
    identical seeds and shares `policy_logits`/`sample_categorical`, so
    the two backends are step-for-step equivalent (asserted in
    tests/test_policy_rollout.py);
  * everything else (transition, occlusion flood, auto-reset, metrics) is
    the shared `_step_core` of `ops/fused_rollout.py`.

Two surfaces:

  * **Evaluation** (`build_policy_eval_rollout`) — serving/eval: nothing
    leaves the chip but metrics. Measured 160.9M env-steps/s with the
    actor in the loop (Empty-8x8, B=1M, 1× v5e) vs 13.6M for the unfused
    XLA policy loop.
  * **Training collection** (`build_fused_train_rollout` /
    `parallel.train.build_fused_train_step`) — the same kernel
    additionally SPILLS the trajectory per step (packed obs words, action,
    log-prob, value, reward, done) to HBM output blocks; the time-chunked
    gradient pass (`parallel.train._trajectory_grads`) then consumes it.
    The critic rides as the 8th row of the padded head matrix.

Scope: BOTH surfaces cover both auto-reset modes on every hooked family —
random-layout regen runs `ops.chunked_regen`'s exact chunked refresh,
with the freeze/re-entry commit protocol composing cleanly with online
actions (a replayed step re-derives the identical action from the
identical state and seed; the per-lane pre-shift applies to the SEED
rows). The trajectory-collecting train rollout composes too: the kernel
spills at pass-local rows and the chunk wrapper merges them to each
lane's commit cursor (chunked_regen invariant I6), so reference regen
semantics hold during training, not just eval.

Equivalence to the flax model: `policy_logits` mirrors
`models.policy.ActorCritic.__call__` op for op (bf16 torso matmuls with
bf16 outputs, f32 head) on a transposed weight layout, so it agrees with
`model.apply` to bf16 matmul-order tolerance (asserted allclose); kernel
vs XLA twin agree exactly (same ops, same order). Hardware caveat,
measured 2026-08-21 on 1x v5e: on REAL TPU the two backends remain
byte-identical in every integer quantity and every f32 logp/value — but
the f32 reward expression may differ in the LAST ULP on a handful of
lanes (2/32,768 at 6e-8; FMA contraction differs between Mosaic and
XLA:TPU under the terminal's --xla_allow_excess_precision). Actions,
states, obs, and episode accounting are unaffected.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from minigrid_tpu.core import constants as C
from minigrid_tpu.core import prng
from minigrid_tpu.core.rollout import RolloutMetrics
from minigrid_tpu.core.state import EnvState
from minigrid_tpu.envs.base import Env
from minigrid_tpu.ops.fused_rollout import (
    NUM_REGS,
    PackedCarry,
    _fit_chunk,
    _matmul_rows,
    _obs_core,
    _packed_hook,
    _regen_is_static,
    _replay_rng_chain,
    _sliced_rows,
    _step_core,
    packed_finish,
    packed_init,
)
from minigrid_tpu.utils.platform import mosaic_available as _mosaic_available

# One-hot channel widths, matching models.policy._CHANNEL_WIDTHS.
_WIDTHS = (C.NUM_OBJECTS, C.NUM_COLORS, C.NUM_STATES)
_F = sum(_WIDTHS)  # 20 features per cell
_SEED_SALT = 0x243F6A88  # second Threefry key word for the sampling stream

_VMEM_BUDGET_BYTES = 10 * 1024 * 1024


class EvalWeights(NamedTuple):
    """Actor(-critic) weights in the kernel's transposed, permuted layout.

    `wt1` is `(H1, V²·20)` bf16 over the VALUE-MAJOR feature rows the
    kernel builds (row `off_ch + v·V² + kv` = one-hot of channel value `v`
    at packed view cell `kv`); `wta` is the 8-row head: rows
    `0..num_actions-1` = actor logits, unused rows pinned to −1e9 bias,
    and — when built by `train_weights_from_params` — row 7 = the critic
    (`sample_categorical` only ever reads the actor rows).
    """

    wt1: jnp.ndarray  # (H1, F_total) bf16
    b1: jnp.ndarray  # (H1, 1) bf16
    wt2: jnp.ndarray  # (H2, H1) bf16
    b2: jnp.ndarray  # (H2, 1) bf16
    wta: jnp.ndarray  # (8, H2) f32
    ba: jnp.ndarray  # (8, 1) f32


def _feature_permutation(view: int) -> np.ndarray:
    """Map the kernel's value-major feature row -> flax feature index.

    flax (`models.policy.encode_obs`): index = k_img·20 + offset + v with
    k_img = x·V + y ([x, y] image order). Kernel: row = off_ch + v·V² + kv
    with kv = y·V + x (packed view order).
    """
    v2 = view * view
    perm = np.zeros(v2 * _F, dtype=np.int64)
    off = 0
    ch_off = (0, _WIDTHS[0], _WIDTHS[0] + _WIDTHS[1])
    for ch, width in enumerate(_WIDTHS):
        for val in range(width):
            for kv in range(v2):
                x, y = kv % view, kv // view
                k_img = x * view + y
                perm[off + val * v2 + kv] = k_img * _F + ch_off[ch] + val
        off += width * v2
    return perm


def eval_weights_from_params(params, view: int) -> EvalWeights:
    """Flax `ActorCritic` params -> `EvalWeights` (transpose + permute)."""
    p = params["params"]
    perm = _feature_permutation(view)
    w1 = jnp.asarray(p["torso_0"]["kernel"])[perm, :]  # (980, H1)
    wa = jnp.asarray(p["actor"]["kernel"], jnp.float32)  # (H2, A)
    ba = jnp.asarray(p["actor"]["bias"], jnp.float32)
    a = wa.shape[1]
    wa_pad = jnp.zeros((8, wa.shape[0]), jnp.float32).at[:a, :].set(wa.T)
    ba_pad = jnp.full((8, 1), -1e9, jnp.float32).at[:a, 0].set(ba)
    return EvalWeights(
        wt1=w1.T.astype(jnp.bfloat16),
        b1=jnp.asarray(p["torso_0"]["bias"], jnp.bfloat16)[:, None],
        wt2=jnp.asarray(p["torso_1"]["kernel"]).T.astype(jnp.bfloat16),
        b2=jnp.asarray(p["torso_1"]["bias"], jnp.bfloat16)[:, None],
        wta=wa_pad,
        ba=ba_pad,
    )


def train_weights_from_params(params, view: int) -> EvalWeights:
    """Like `eval_weights_from_params`, with the critic head in row 7."""
    w = eval_weights_from_params(params, view)
    p = params["params"]
    wv = jnp.asarray(p["critic"]["kernel"], jnp.float32)  # (H2, 1)
    bv = jnp.asarray(p["critic"]["bias"], jnp.float32)  # (1,)
    return w._replace(
        wta=w.wta.at[7, :].set(wv[:, 0]),
        ba=w.ba.at[7, 0].set(bv[0]),
    )


def _dot_bf16_f32(a, b):
    """bf16 x bf16 -> f32-accumulated dot, portable.

    Off-TPU the inputs upcast to f32 first: XLA:CPU's partitioned dot
    thunk lacks BF16xBF16=F32 (hit by the sharded gradient pass), and the
    upcast is BIT-IDENTICAL — bf16 values embed losslessly in f32, the
    products are exact in f32 either way, and the accumulation is f32 in
    both forms. On TPU the bf16 operands feed the MXU directly.
    """
    if jax.default_backend() != "tpu":
        a = a.astype(jnp.float32)
        b = b.astype(jnp.float32)
    return jnp.dot(a, b, preferred_element_type=jnp.float32)


def policy_logits(vw, vis, w: EvalWeights, view: int) -> jnp.ndarray:
    """(V², B) packed view -> (8, B) f32 head rows (actor [+ critic]).

    Mirrors `ActorCritic.__call__` (bf16 torso, f32 head) on the
    transposed layout; shared by the Pallas kernel and the XLA twin.
    """
    t = (vw & 15) * vis
    c = ((vw >> 4) & 15) * vis
    s = ((vw >> 8) & 15) * vis
    rows = []
    for chan, width in zip((t, c, s), _WIDTHS):
        for val in range(width):
            rows.append((chan == val).astype(jnp.bfloat16))
    feats = jnp.concatenate(rows, axis=0)  # (V²·20, B) bf16
    h1 = _dot_bf16_f32(w.wt1, feats)
    h1 = jnp.maximum(h1.astype(jnp.bfloat16) + w.b1, 0)
    h2 = _dot_bf16_f32(w.wt2, h1)
    h2 = jnp.maximum(h2.astype(jnp.bfloat16) + w.b2, 0)
    logits = jnp.dot(
        w.wta, h2.astype(jnp.float32), preferred_element_type=jnp.float32
    )
    return logits + w.ba


def sample_categorical(logits, seed_row, num_actions: int) -> jnp.ndarray:
    """(8, B) head rows + (1, B) int32 seeds -> (1, B) int32 actions."""
    a, _ = sample_categorical_with_logp(logits, seed_row, num_actions)
    return a


def sample_categorical_with_logp(logits, seed_row, num_actions: int):
    """Inverse-CDF categorical over the first `num_actions` head rows with
    one 31-bit Threefry uniform per lane — pure elementwise int/float
    math, identical in the kernel and the XLA twin (which is what makes
    the two backends byte-equivalent; the recipe intentionally does NOT
    try to match `jax.random.categorical`, whose Gumbel path needs one
    uniform per action per draw). Also returns the sampled action's
    log-probability. Rows ≥ `num_actions` (head padding / the critic) are
    never read.
    """
    u31 = prng.hash_u31(seed_row, jnp.full_like(seed_row, _SEED_SALT), 0)
    u01 = u31.astype(jnp.float32) * jnp.float32(2.0 ** -31)
    m = logits[0:1, :]
    for i in range(1, num_actions):
        m = jnp.maximum(m, logits[i : i + 1, :])
    p_rows = [jnp.exp(logits[i : i + 1, :] - m) for i in range(num_actions)]
    cums = []
    cum = jnp.zeros_like(u01)
    for p in p_rows:
        cum = cum + p
        cums.append(cum)
    total = cum
    thresh = u01 * total
    hits = jnp.zeros_like(seed_row)
    for cu in cums:
        hits = hits + (cu > thresh).astype(jnp.int32)
    action = num_actions - hits
    l_a = jnp.zeros_like(u01)
    for i in range(num_actions):
        l_a = jnp.where(action == i, logits[i : i + 1, :], l_a)
    logp = (l_a - m) - jnp.log(total)
    return action, logp


def pack_obs_words(vw, vis):
    """(V², B) view + visibility -> one int32 obs word per cell: the
    `(type, color, state)` triple of the encoded observation, zero when
    occluded — the compact trajectory form the fused train rollout spills
    (12 bits/cell vs the 3-byte image channel encoding)."""
    return (vw & 0xFFF) * vis


def obs_words_to_images(words: jnp.ndarray, view: int) -> jnp.ndarray:
    """(..., V², B) packed obs words -> (..., B, V, V, 3) uint8 images
    byte-identical to `core.obs.gen_obs_image` ([x, y]-indexed)."""
    t = words & 15
    c = (words >> 4) & 15
    s = (words >> 8) & 15
    img = jnp.stack([t, c, s], axis=-1)  # (..., V², B, 3); kv = y·V + x
    img = img.reshape(img.shape[:-3] + (view, view, -1, 3))  # (..., y, x, B, 3)
    perm = tuple(range(img.ndim - 4)) + (
        img.ndim - 2, img.ndim - 3, img.ndim - 4, img.ndim - 1,
    )
    return img.transpose(perm).astype(jnp.uint8)  # (..., B, x, y, 3)


# --------------------------------------------------------------------------
# Pallas kernel (eval: metrics only; collect: + trajectory spill)
# --------------------------------------------------------------------------


def _policy_kernel(
    *refs,
    width: int,
    height: int,
    view: int,
    max_steps: int,
    step_chunk: int,
    see_through_walls: bool,
    num_actions: int,
    collect: bool = False,
    chunk_exact: bool = False,
    hook=None,
    remap_action=None,
    pre_hook=None,
):
    """Ref order: inputs (words0, regs0, tmpl_words, tmpl_regs, seeds,
    wt1, b1, wt2, b2, wta, ba[, ctl0]), outputs (words, regs, rsum,
    counts[, spill][, ctl]), scratch (words, regs, vw, vis, rsum, epi,
    csum[, ctl]). `chunk_exact` runs `_step_core`'s chunked-regen commit
    protocol; with `collect` the spill stays indexed by the PASS-LOCAL
    loop step — `ops.chunked_regen` merges it to global rows at each
    lane's commit cursor (invariant I6 there)."""
    n_in = 11 + (1 if chunk_exact else 0)
    (
        words0_ref, regs0_ref, tmpl_words_ref, tmpl_regs_ref, seeds_ref,
        wt1_ref, b1_ref, wt2_ref, b2_ref, wta_ref, ba_ref,
    ) = refs[:11]
    ctl0_ref = refs[11] if chunk_exact else None
    n_out = 4 + (1 if collect else 0) + (1 if chunk_exact else 0)
    outs = refs[n_in : n_in + n_out]
    words_out_ref, regs_out_ref, rsum_ref, counts_ref = outs[:4]
    _oi = 4
    spill_ref = None
    if collect:
        spill_ref = outs[_oi]
        _oi += 1
    ctl_out_ref = outs[_oi] if chunk_exact else None
    scratch = refs[n_in + n_out :]
    words_s, regs_s, vw_s, vis_s, rsum_s, epi_s, csum_s = scratch[:7]
    ctl_s = scratch[7] if chunk_exact else None

    obs = functools.partial(
        _obs_core,
        width=width, height=height, view=view,
        see_through_walls=see_through_walls, row_reader=_sliced_rows,
    )

    @pl.when(pl.program_id(1) == 0)
    def _init():
        words_s[:] = words0_ref[:]
        regs_s[:] = regs0_ref[:]
        vw0, vis0 = obs(words0_ref[:], regs0_ref[:])
        vw_s[:] = vw0
        vis_s[:] = vis0
        rsum_s[:] = jnp.zeros_like(rsum_s)
        epi_s[:] = jnp.zeros_like(epi_s)
        csum_s[:] = jnp.zeros_like(csum_s)
        if chunk_exact:
            ctl_s[:] = ctl0_ref[:]

    w = EvalWeights(
        wt1=wt1_ref[:], b1=b1_ref[:], wt2=wt2_ref[:], b2=b2_ref[:],
        wta=wta_ref[:], ba=ba_ref[:],
    )
    tmpl_words = tmpl_words_ref[:]
    tmpl_regs = tmpl_regs_ref[:]
    v2 = view * view

    def step(t, _):
        vw_pre = vw_s[:]
        vis_pre = vis_s[:]
        logits = policy_logits(vw_pre, vis_pre, w, view)
        a, logp = sample_categorical_with_logp(
            logits, seeds_ref[pl.ds(t, 1), :], num_actions
        )
        out = _step_core(
            words_s[:], regs_s[:], a, tmpl_words, tmpl_regs,
            width=width, height=height, view=view, max_steps=max_steps,
            see_through_walls=see_through_walls, row_reader=_sliced_rows,
            hook=hook, remap_action=remap_action, pre_hook=pre_hook,
            with_obs=True,
            chunk_ctl=ctl_s[:] if chunk_exact else None,
            chunk_len=step_chunk if chunk_exact else None,
        )
        if chunk_exact:
            words2, regs2, reward, done, obs_sum, ctl2, vw2, vis2 = out
            ctl_s[:] = ctl2
        else:
            words2, regs2, reward, done, obs_sum, vw2, vis2 = out
        if collect:
            # One aligned (1, v2p, bt) store per step: the pre-action obs
            # words plus the scalar rows (action, logp, value, reward,
            # done bit-packed into the sublane padding) — Mosaic requires
            # tiled-dim offsets provably 8-aligned, so the per-step slab
            # is the UNTILED leading axis (see `_SPILL_ROWS`).
            cast = lambda x: lax.bitcast_convert_type(x, jnp.int32)
            v2p = spill_ref.shape[1]
            pad = jnp.zeros((v2p - v2 - 5, a.shape[1]), jnp.int32)
            spill = jnp.concatenate(
                [
                    pack_obs_words(vw_pre, vis_pre),
                    a, cast(logp), cast(logits[7:8, :]), cast(reward),
                    done.astype(jnp.int32),
                    pad,
                ],
                axis=0,
            )
            spill_ref[pl.ds(t, 1), :, :] = spill[None]
        words_s[:] = words2
        regs_s[:] = regs2
        vw_s[:] = vw2
        vis_s[:] = vis2
        rsum_s[:] = rsum_s[:] + reward
        epi_s[:] = epi_s[:] + done.astype(jnp.int32)
        csum_s[:] = csum_s[:] + obs_sum
        return 0

    lax.fori_loop(0, step_chunk, step, 0)

    words_out_ref[:] = words_s[:]
    regs_out_ref[:] = regs_s[:]
    rsum_ref[:] = rsum_s[:]
    counts_ref[:] = jnp.concatenate([epi_s[:], csum_s[:]], axis=0)
    if chunk_exact:
        ctl_out_ref[:] = ctl_s[:]


def _spill_rows(v2: int) -> int:
    """Sublane-padded rows of the per-step trajectory spill slab: the V²
    obs words + 5 scalar rows (action, logp, value, reward, done), rounded
    up to a multiple of 8 so the tiled store dims stay aligned."""
    return ((v2 + 5 + 7) // 8) * 8


def _auto_lane_block_policy(
    hw: int, view: int, step_chunk: int, collect: bool = False
) -> int:
    """VMEM-budgeted lane block: env state ×4 + obs scratch + the feature /
    hidden temporaries (bf16 ≈ half-words) + the weight block + (collect)
    the per-chunk trajectory spill block."""
    v2 = view * view
    weight_bytes = (256 * v2 * _F + 256 * 256 + 8 * 256) * 2 + 4096
    words_per_lane = (
        4 * hw + 4 * NUM_REGS + step_chunk + 8
        + 2 * v2  # vw/vis scratch
        + (v2 * _F) // 2 + 256  # feature block + hidden (bf16)
        + 64  # temporaries slack
        # Spill OUTPUT block counts twice: Mosaic double-buffers grid
        # output windows (a chunk_exact regen run at regen_chunk=128
        # OOM'd scoped VMEM with the single-counted estimate).
        + (2 * step_chunk * _spill_rows(v2) if collect else 0)
    )
    max_lanes = max(0, _VMEM_BUDGET_BYTES - weight_bytes) // (4 * words_per_lane)
    return (max_lanes // 128) * 128


def policy_rollout_supported(
    env: Env, mode: str = "cached", collect: bool = False
) -> bool:
    """True iff the fused policy rollouts support `env` under `mode`.

    Both surfaces support every hooked family in both modes —
    random-layout regen runs the exact chunked refresh with the
    freeze/re-entry commit protocol (ops/chunked_regen.py; online actions
    replay identically: they are pure functions of the replayed state and
    seed). The trajectory-collecting TRAIN rollout (`collect=True`)
    composes with the protocol too: the kernel spills at pass-local rows
    and the chunk wrapper merges them to each lane's commit cursor
    (chunked_regen invariant I6), so fresh-layout resets hold during
    training as well (minigrid.py:~722-748)."""
    from minigrid_tpu.ops.fused_rollout import _has_packed_step

    if not _has_packed_step(env):
        return False
    if mode not in ("cached", "regen"):
        return False
    cfg = env.config
    return (
        _auto_lane_block_policy(
            cfg.width * cfg.height, cfg.agent_view_size, 128
        )
        >= 128
    )


def _build_policy_core(
    env: Env,
    num_steps: int,
    backend: str,
    collect: bool,
    lane_block: Optional[int],
    step_chunk: int,
    interpret: Optional[bool],
    chunk_exact: bool = False,
):
    """Returns `run(words0, regs0, tmpl_words, tmpl_regs, seeds, weights
    [, ctl0]) -> (words_f, regs_f, rsum, epi, csum[, traj][, ctl])` where
    `traj` (collect only) is `(obs_words (T, V², B), actions (T, B), logp,
    value, reward (T, B) f32, done (T, B) i32)` and `ctl` (chunk_exact
    only) is the commit-protocol state for `_build_chunked_regen`."""
    cfg = env.config
    v = cfg.agent_view_size
    v2 = v * v
    hw = cfg.width * cfg.height
    if interpret is None:
        interpret = not _mosaic_available()
    hook, remap_action, pre_hook = _packed_hook(env)
    tc = _fit_chunk(num_steps, step_chunk)
    num_chunks = num_steps // tc

    if backend == "pallas":
        auto_bt = _auto_lane_block_policy(hw, v, tc, collect)
        bt0 = min(512, auto_bt) if lane_block is None else lane_block
        if bt0 > auto_bt:
            raise ValueError(
                f"lane_block={bt0} exceeds the VMEM budget (max {auto_bt})"
            )
        kernel = functools.partial(
            _policy_kernel,
            width=cfg.width, height=cfg.height, view=v,
            max_steps=cfg.max_steps, step_chunk=tc,
            see_through_walls=cfg.see_through_walls,
            num_actions=cfg.num_actions, collect=collect,
            chunk_exact=chunk_exact,
            hook=hook, remap_action=remap_action, pre_hook=pre_hook,
        )

        def run(words0, regs0, tmpl_words, tmpl_regs, seeds, weights,
                ctl0=None):
            b = words0.shape[1]
            bt = min(bt0, b)
            if b % bt:
                # The VMEM-budgeted auto block is a multiple of 128 but
                # not necessarily a divisor of b (e.g. 384 at DoorKey-8x8
                # collect): step down to the largest 128-multiple that
                # divides b.
                cand = (bt // 128) * 128
                while cand >= 128 and b % cand:
                    cand -= 128
                if cand < 128:
                    raise ValueError(
                        f"batch {b} not divisible by block {bt} and no "
                        f"128-multiple divisor fits"
                    )
                bt = cand
            state_block = lambda rows: pl.BlockSpec(
                (rows, bt), lambda i, j: (0, i)
            )
            tstep_block = lambda rows: pl.BlockSpec(
                (rows, bt), lambda i, j: (j, i)
            )
            rep = lambda arr: pl.BlockSpec(arr.shape, lambda i, j: (0, 0))
            in_specs = [
                state_block(hw),
                state_block(NUM_REGS),
                state_block(hw),
                state_block(NUM_REGS),
                tstep_block(tc),
                rep(weights.wt1), rep(weights.b1),
                rep(weights.wt2), rep(weights.b2),
                rep(weights.wta), rep(weights.ba),
            ]
            operands = [words0, regs0, tmpl_words, tmpl_regs, seeds,
                        *weights]
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
            v2p = _spill_rows(v2)
            if collect:
                out_specs += [
                    pl.BlockSpec((tc, v2p, bt), lambda i, j: (j, 0, i)),
                ]
                out_shape += [
                    jax.ShapeDtypeStruct((num_steps, v2p, b), jnp.int32),
                ]
            if chunk_exact:
                in_specs.append(state_block(3))
                operands.append(ctl0)
                out_specs.append(state_block(3))
                out_shape.append(jax.ShapeDtypeStruct((3, b), jnp.int32))
            scratch_shapes = [
                pltpu.VMEM((hw, bt), jnp.int32),
                pltpu.VMEM((NUM_REGS, bt), jnp.int32),
                pltpu.VMEM((v2, bt), jnp.int32),
                pltpu.VMEM((v2, bt), jnp.int32),
                pltpu.VMEM((1, bt), jnp.float32),
                pltpu.VMEM((1, bt), jnp.int32),
                pltpu.VMEM((1, bt), jnp.int32),
            ]
            if chunk_exact:
                scratch_shapes.append(pltpu.VMEM((3, bt), jnp.int32))
            out = pl.pallas_call(
                kernel,
                grid=(b // bt, num_chunks),
                in_specs=in_specs,
                out_specs=out_specs,
                out_shape=out_shape,
                scratch_shapes=scratch_shapes,
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("parallel", "arbitrary"),
                ),
                interpret=interpret,
            )(*operands)
            words_f, regs_f, rsum, counts, *rest = out
            base = (words_f, regs_f, rsum, counts[0:1], counts[1:2])
            if collect:
                spill = rest[0]  # (T, v2p, B) int32
                fbits = lambda x: lax.bitcast_convert_type(x, jnp.float32)
                base = base + ((
                    spill[:, :v2, :],
                    spill[:, v2, :],
                    fbits(spill[:, v2 + 1, :]),
                    fbits(spill[:, v2 + 2, :]),
                    fbits(spill[:, v2 + 3, :]),
                    spill[:, v2 + 4, :],
                ),)
            if chunk_exact:
                base = base + (rest[-1],)
            return base

        return run

    if backend != "xla":
        raise ValueError(f"unknown backend {backend!r}")

    step_math = functools.partial(
        _step_core,
        width=cfg.width, height=cfg.height, view=v,
        max_steps=cfg.max_steps,
        see_through_walls=cfg.see_through_walls,
        row_reader=_matmul_rows,
        hook=hook, remap_action=remap_action, pre_hook=pre_hook,
        with_obs=True,
    )
    obs0_fn = functools.partial(
        _obs_core,
        width=cfg.width, height=cfg.height, view=v,
        see_through_walls=cfg.see_through_walls,
        row_reader=_matmul_rows,
    )

    def run(words0, regs0, tmpl_words, tmpl_regs, seeds, weights, ctl0=None):
        b = words0.shape[1]
        vw0, vis0 = obs0_fn(words0, regs0)
        zeros_f = jnp.zeros((1, b), jnp.float32)
        zeros_i = jnp.zeros((1, b), jnp.int32)
        chunk_len = seeds.shape[0] if chunk_exact else None

        def body(carry, seed_t):
            words, regs, vw, vis, ctl, rsum, epi, csum = carry
            logits = policy_logits(vw, vis, weights, v)
            a, logp = sample_categorical_with_logp(
                logits, seed_t[None, :], cfg.num_actions
            )
            out = step_math(
                words, regs, a, tmpl_words, tmpl_regs,
                chunk_ctl=ctl, chunk_len=chunk_len,
            )
            if chunk_exact:
                words2, regs2, reward, done, obs_sum, ctl, vw2, vis2 = out
            else:
                words2, regs2, reward, done, obs_sum, vw2, vis2 = out
            ys = None
            if collect:
                ys = (
                    pack_obs_words(vw, vis),
                    a[0], logp[0], logits[7], reward[0],
                    done[0].astype(jnp.int32),
                )
            return (
                words2, regs2, vw2, vis2, ctl,
                rsum + reward,
                epi + done.astype(jnp.int32),
                csum + obs_sum,
            ), ys

        (words_f, regs_f, _, _, ctl, rsum, epi, csum), ys = lax.scan(
            body,
            (words0, regs0, vw0, vis0, ctl0, zeros_f, zeros_i, zeros_i),
            seeds,
        )
        base = (words_f, regs_f, rsum, epi, csum)
        if collect:
            obs_w, a_t, logp_t, val_t, rew_t, done_t = ys
            base = base + ((obs_w, a_t, logp_t, val_t, rew_t, done_t),)
        if chunk_exact:
            base = base + (ctl,)
        return base

    return run


def _seeds_for(key, num_steps, b):
    bits = jax.random.bits(key, (num_steps, b), dtype=jnp.uint32)
    return lax.bitcast_convert_type(bits, jnp.int32)


def build_policy_eval_rollout(
    env: Env,
    params,
    num_steps: int,
    mode: str = "cached",
    backend: str = "pallas",
    lane_block: Optional[int] = None,
    step_chunk: int = 128,
    regen_chunk: int = 32,
    interpret: Optional[bool] = None,
    as_carry: bool = False,
):
    """Returns `rollout(key, states) -> (states, RolloutMetrics)` running
    the ACTOR inside the rollout (policy-in-the-loop evaluation), or with
    `as_carry=True` the steady surface `step(key, carry)` over a
    `PackedCarry` from `packed_init`.

    `params` are flax `ActorCritic` params (converted once via
    `eval_weights_from_params`). The key only seeds the per-(step, lane)
    sampling stream; backends "pallas" and "xla" consume identical seeds
    and share the policy/sampling math, so they are step-for-step
    equivalent (tests/test_policy_rollout.py). Random-layout regen runs
    the exact chunked template refresh of `_build_chunked_regen` (fresh
    layout per reset; repeat resets deferred and replayed — identical
    actions re-derive from the identical state and seed).
    """
    if not policy_rollout_supported(env, mode):
        raise ValueError(
            f"policy rollout (mode={mode!r}) does not support {env.env_id!r}"
        )
    weights = eval_weights_from_params(params, env.config.agent_view_size)

    if mode == "regen" and not _regen_is_static(env):
        from minigrid_tpu.ops.chunked_regen import (
            build_chunked_regen as _build_chunked_regen,
        )

        tc = _fit_chunk(num_steps, regen_chunk)
        core = _build_policy_core(
            env, tc, backend, False, lane_block, tc, interpret,
            chunk_exact=True,
        )

        def chunk_fn(words, regs, tmpl_words, tmpl_regs, seeds_chunk, ctl0):
            words_f, regs_f, rsum, epi, csum, ctl = core(
                words, regs, tmpl_words, tmpl_regs, seeds_chunk, weights,
                ctl0,
            )
            return words_f, regs_f, ctl, rsum, epi, csum

        step_carry = _build_chunked_regen(
            env, num_steps, tc, chunk_fn,
            stream_fn=lambda key, b: _seeds_for(key, num_steps, b),
        )

        if as_carry:
            return step_carry

        def rollout(key: jax.Array, states: EnvState):
            carry = packed_init(env, states, mode)
            carry, metrics = step_carry(key, carry)
            return packed_finish(env, carry), metrics

        return rollout

    run = _build_policy_core(
        env, num_steps, backend, False, lane_block, step_chunk, interpret
    )

    def step_carry(key: jax.Array, carry: PackedCarry):
        b = carry.words.shape[1]
        seeds = _seeds_for(key, num_steps, b)
        words_f, regs_f, rsum, epi, csum = run(
            carry.words, carry.regs, carry.tmpl_words, carry.tmpl_regs,
            seeds, weights,
        )
        rng = carry.rng
        if mode == "regen":
            rng = _replay_rng_chain(env, rng, epi[0])
        metrics = RolloutMetrics(
            episodes=jnp.sum(epi),
            total_reward=jnp.sum(rsum),
            total_steps=jnp.int32(b * num_steps),
            obs_checksum=jnp.sum(csum),
            reset_overlaps=jnp.zeros((), jnp.int32),
        )
        return (
            PackedCarry(words_f, regs_f, carry.tmpl_words, carry.tmpl_regs,
                        rng),
            metrics,
        )

    if as_carry:
        return step_carry

    def rollout(key: jax.Array, states: EnvState):
        carry = packed_init(env, states, mode)
        carry, metrics = step_carry(key, carry)
        return packed_finish(env, carry), metrics

    return rollout


def build_fused_train_rollout(
    env: Env,
    num_steps: int,
    mode: str = "cached",
    backend: str = "pallas",
    lane_block: Optional[int] = None,
    step_chunk: int = 16,
    regen_chunk: int = 32,
    interpret: Optional[bool] = None,
    raw_obs: bool = False,
):
    """Returns `rollout(params, key, carry) -> (carry, traj, metrics)` —
    the trajectory-COLLECTING policy-in-kernel rollout that feeds
    `parallel.train.build_fused_train_step`.

    `raw_obs=True` returns the spilled COMPACT obs words `(T, V², B)`
    int32 in place of the images — the packed-layout gradient pass
    (`parallel.train._trajectory_grads_packed`) consumes them directly,
    skipping the (T, B, V, V, 3) image materialization and the flax
    one-hot re-encode entirely.

    `traj` is `(obs_images (T, B, V, V, 3) u8, actions (T, B) i32, logp
    (T, B) f32, value (T, B) f32, reward (T, B) f32, done (T, B) bool)` —
    the exact tuple `parallel.train._trajectory_grads` consumes. Weights
    convert from `params` per call (cheap transposes), so the same built
    rollout serves every optimizer step.

    Random-layout regen runs the exact chunked template refresh
    (ops/chunked_regen.py): every reset installs a brand-new layout
    during TRAINING, matching the reference's `reset()` -> `_gen_grid`
    (minigrid.py:~722-748). The kernel spills trajectories at pass-local
    rows; the chunk wrapper merges them to each lane's committed-step
    cursor, so the collected trajectory is byte-exact for any
    `regen_chunk` (chunked_regen invariant I6;
    tests/test_policy_rollout.py).
    """
    if not policy_rollout_supported(env, mode, collect=True):
        raise ValueError(
            f"fused train rollout (mode={mode!r}) does not support "
            f"{env.env_id!r}"
        )
    cfg = env.config
    v = cfg.agent_view_size

    if mode == "regen" and not _regen_is_static(env):
        from minigrid_tpu.ops.chunked_regen import build_chunked_regen

        tc = _fit_chunk(num_steps, regen_chunk)
        core = _build_policy_core(
            env, tc, backend, True, lane_block, tc, interpret,
            chunk_exact=True,
        )

        def chunk_fn(words, regs, tw, tr, seeds_chunk, ctl0, weights):
            words_f, regs_f, rsum, epi, csum, traj, ctl = core(
                words, regs, tw, tr, seeds_chunk, weights, ctl0
            )
            return words_f, regs_f, ctl, rsum, epi, csum, traj

        step_carry = build_chunked_regen(
            env, num_steps, tc, chunk_fn,
            stream_fn=lambda key, b: _seeds_for(key, num_steps, b),
            collect=True, with_ctx=True,
        )

        def rollout(params, key: jax.Array, carry: PackedCarry):
            weights = train_weights_from_params(params, v)
            carry, metrics, traj = step_carry(key, carry, weights)
            obs_w, a_t, logp_t, val_t, rew_t, done_t = traj
            traj_out = (
                obs_w if raw_obs else obs_words_to_images(obs_w, v),
                a_t,
                logp_t,
                val_t,
                rew_t,
                done_t.astype(bool),
            )
            return carry, traj_out, metrics

        return rollout

    run = _build_policy_core(
        env, num_steps, backend, True, lane_block, step_chunk, interpret
    )

    def rollout(params, key: jax.Array, carry: PackedCarry):
        weights = train_weights_from_params(params, v)
        b = carry.words.shape[1]
        seeds = _seeds_for(key, num_steps, b)
        words_f, regs_f, rsum, epi, csum, traj = run(
            carry.words, carry.regs, carry.tmpl_words, carry.tmpl_regs,
            seeds, weights,
        )
        rng = carry.rng
        if mode == "regen":
            rng = _replay_rng_chain(env, rng, epi[0])
        obs_w, a_t, logp_t, val_t, rew_t, done_t = traj
        traj_out = (
            obs_w if raw_obs else obs_words_to_images(obs_w, v),
            a_t,
            logp_t,
            val_t,
            rew_t,
            done_t.astype(bool),
        )
        metrics = RolloutMetrics(
            episodes=jnp.sum(epi),
            total_reward=jnp.sum(rsum),
            total_steps=jnp.int32(b * num_steps),
            obs_checksum=jnp.sum(csum),
            reset_overlaps=jnp.zeros((), jnp.int32),
        )
        carry = PackedCarry(
            words_f, regs_f, carry.tmpl_words, carry.tmpl_regs, rng
        )
        return carry, traj_out, metrics

    return rollout
