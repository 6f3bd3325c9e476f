"""Exact chunked regen: reference-faithful random-layout auto-reset for
the packed engines, byte-exact at ANY chunk length.

The reference resamples a brand-new layout on every reset
(`reset()` -> `_gen_grid`, minigrid.py:~722-748). Generating layouts
inside the lockstep step loop would pay full generation cost every step
(the vmap regen engine's bottleneck), so the packed engines instead run
in chunks of `tc` steps with each lane carrying ONE pre-generated "next
layout" template, and make that exact via the freeze/re-entry commit
protocol. This module owns that machinery; `_step_core`
(ops/fused_rollout.py) implements the in-kernel commit arithmetic.

PROTOCOL INVARIANTS (stated once, relied on everywhere):

  I1. Template freshness: for every lane, `(tmpl_words, tmpl_regs)[lane]
      == _pack_rolled(generate(rng[lane]))` — the layout that lane's NEXT
      reset must install. `rng[lane]` is the lane's reset-chain position
      (the regen autoreset's `state.rng`).
  I2. One template per invocation: a lane's FIRST in-chunk reset consumes
      its template (`ctl` row 0, `consumed`, flips to 1). A second done
      while `consumed == 1` would have to reuse the layout — a
      distribution the reference never produces — so the lane FREEZES
      instead (`ctl` row 2): the step is discarded wholesale (state,
      reward, done, obs checksum) inside `_step_core`.
  I3. In-order commits: a lane commits steps strictly in order; `ctl`
      row 1 (`steps_done`) is the lane's committed-step cursor within the
      chunk. Within one kernel pass, lane `b` commits pass-local rows
      `0..k-1` which are global chunk rows `c0[b]..c0[b]+k-1`, where
      `c0[b]` is the cursor at pass entry — because the action/seed rows
      are PRE-SHIFTED per lane (`rows = min(c0 + iota, tc-1)`) so kernel
      row `s` always consumes global row `c0 + s`.
  I4. Replay determinism: a frozen lane's discarded step re-executes
      bit-identically on the next pass — the state was reverted and the
      (pre-shifted) action/seed row is the same, and in-kernel actors are
      pure functions of (state, seed). Between passes the outer loop
      advances consumed lanes' chains (`rng <- generate(rng).rng`, read
      from the template's R_RNG rows) and refreshes ONLY consumed lanes'
      templates (`masked_template_refresh` — demand-proportional,
      restoring I1) before re-entering.
  I5. Termination: each pass commits >= 1 step for every unfrozen,
      unfinished lane, and a frozen lane is unfrozen by the re-entry
      (fresh template, `consumed` reset to 0), so the per-chunk
      `while_loop` reaches `steps_done == tc` on every lane. The common
      case (no lane resets twice in a chunk) is exactly ONE pass.
  I6. Trajectory spill under the protocol (`collect=True`): the kernel
      spills at the PASS-LOCAL row `s`; by I3 that row belongs at global
      chunk row `c0 + s` for exactly the lanes' committed prefix, so the
      merge `slab[i, lane] = spill[i - c0[lane], lane] for c0 <= i < c1`
      (c1 = cursor after the pass) assembles the exact trajectory;
      discarded rows never land (their `i` falls outside `[c0, c1)`), and
      every chunk row is committed exactly once across passes (I3 + I5).

Every committed step is bit-identical to the vmap regen path's step at
the same global index, for ANY `regen_chunk`
(tests/test_fused_rollout.py, tests/test_policy_rollout.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from minigrid_tpu.core.rollout import RolloutMetrics
from minigrid_tpu.envs.base import Env


def refresh_block_size(b: int) -> int:
    """Default compaction block for `masked_template_refresh`."""
    return max(128, b // 8)


def masked_template_refresh(
    env: Env, tw: jnp.ndarray, tr: jnp.ndarray, cur_rng: jnp.ndarray,
    consumed: jnp.ndarray, block: int,
):
    """Regenerate the reset templates of `consumed` lanes ONLY (restores
    invariant I1 after resets advanced some lanes' chains).

    A reset stales its lane's template; unconsumed lanes' templates stay
    valid, so regenerating the full batch (one `vmap(generate)` over B —
    the old scheme's fixed per-chunk cost) wastes `generate` work on every
    lane that didn't reset. Instead consumed lanes are COMPACTED to the
    front (one stable argsort), regenerated in `block`-lane slices under a
    while_loop (`ceil(count / block)` rounds — ZERO when nothing reset),
    and scattered back. Generation cost is thus proportional to the actual
    reset demand (one layout per reset — the reference's own semantics),
    not to B; on generation-bound procedural families (MultiRoom,
    KeyCorridor) this is the regen-mode bottleneck (BASELINE.md).

    The final (clamped) slice may straddle already-refreshed lanes; the
    rewrite is idempotent (`generate` is a pure function of `cur_rng`), so
    duplicates are harmless.

    Args:
      consumed: `(B,)` bool — lanes whose chain advanced this invocation.
    Returns the refreshed `(tw, tr)`.
    """
    from minigrid_tpu.ops.fused_rollout import _pack_rolled
    from minigrid_tpu.ops.packed_gen import get_packed_generator

    cfg = env.config
    b = tw.shape[1]
    block = min(block, b)
    gp = get_packed_generator(env)
    if gp is not None:
        # Lane-major generation (ops/packed_gen.py): paints straight into
        # the packed word layout — byte-exact vs the vmap path.
        gen_packed = lambda ks: gp(ks, cfg)  # noqa: E731
    else:
        gen_block = jax.vmap(lambda k: env.generate(k, cfg))
        gen_packed = lambda ks: _pack_rolled(cfg, gen_block(ks))  # noqa: E731
    count = jnp.sum(consumed.astype(jnp.int32))
    order = jnp.argsort(jnp.where(consumed, 0, 1), stable=True).astype(jnp.int32)

    def cond(st):
        return st[0] * block < count

    def body(st):
        r, tw, tr = st
        start = jnp.minimum(r * block, b - block)
        idx = lax.dynamic_slice(order, (start,), (block,))  # (block,) lanes
        mask = consumed[idx][None, :]  # (1, block)
        fw, fr = gen_packed(cur_rng[idx])
        tw = tw.at[:, idx].set(jnp.where(mask, fw, tw[:, idx]))
        tr = tr.at[:, idx].set(jnp.where(mask, fr, tr[:, idx]))
        return r + 1, tw, tr

    _, tw, tr = lax.while_loop(cond, body, (jnp.int32(0), tw, tr))
    return tw, tr


def _merge_spill(slab, spill, c0, c1, first_pass: bool = False):
    """Merge one pass's pass-local spill into the chunk's global slab
    (invariant I6): lane `b`'s pass row `s` holds its global chunk row
    `c0[b] + s`; only rows in `[c0, c1)` were committed this pass.

    `slab`/`spill`: `(tc, ..., B)` (any middle dims); `c0`/`c1`: `(1, B)`
    commit cursors at pass entry/exit. `first_pass=True` asserts `c0 == 0`
    (pass 1 always starts every lane at cursor 0), reducing the merge to
    one row-masked select. Later passes realize the per-lane row shift as
    a log2(tc) doubling roll (`_roll_to_base`'s trick) — a general
    `take_along_axis` gather here measured ~100x slower than the whole
    eval rollout on TPU (DoorKey regen collect: 9.8 s vs 92 ms a call).
    """
    tc = spill.shape[0]
    b = spill.shape[-1]
    shape = spill.shape
    spill3 = spill.reshape(tc, -1, b)
    slab3 = slab.reshape(tc, -1, b)
    i = jnp.arange(tc, dtype=jnp.int32)[:, None]  # (tc, 1)
    if first_pass:
        valid = (i < c1)[:, None, :]
        return jnp.where(valid, spill3, slab3).reshape(shape)
    # g[i] = spill[i - c0] realized as a roll by (tc - c0) mod tc; rows
    # that wrap land outside [c0, c1) and are masked off.
    shift = (tc - c0) % tc  # (1, B)
    g = spill3
    s = 1
    while s < tc:
        rolled = jnp.concatenate([g[s:], g[:s]], axis=0)
        g = jnp.where(((shift // s) % 2 == 1)[:, None, :], rolled, g)
        s *= 2
    valid = ((i >= c0) & (i < c1))[:, None, :]
    return jnp.where(valid, g, slab3).reshape(shape)


def build_chunked_regen(
    env: Env, num_steps: int, tc: int, chunk_fn, refresh_block=None,
    actions_override=None, stream_fn=None, collect: bool = False,
    with_ctx: bool = False,
):
    """Reference-faithful regen auto-reset for RANDOM-layout families on
    the packed engines — UNCONDITIONALLY byte-exact vs the vmap regen path
    (see the module docstring for the protocol and its invariants).

    `chunk_fn(words, regs, tmpl_words, tmpl_regs, actions_chunk, ctl0
    [, ctx])` runs `tc` packed steps under the commit protocol and returns
    `(words', regs', ctl, rsum, episodes, csum[, spill])` with the
    accumulators as `(1, B)` per-lane totals of COMMITTED steps. With
    `collect=True` it additionally returns `spill` — a PyTree of
    `(tc, ..., B)` pass-local trajectory arrays, assembled into exact
    global rows here (invariant I6).

    `stream_fn(key, b) -> (T, B) int32` replaces the random-action stream
    — the policy-in-kernel rollouts route their per-(step, lane) sampling
    SEEDS through it (a lane's i-th committed step must consume row i
    whether actions are pre-sampled or derived in-kernel, so the same
    per-lane pre-shift applies; a replayed step re-derives the identical
    action because the state and seed are identical, invariant I4).

    `with_ctx=True` threads an extra runtime argument (e.g. live policy
    weights) through `step_carry(key, carry, ctx)` into every `chunk_fn`
    call — required by the train rollout, whose weights change every
    optimizer step while the built function stays compiled.

    Returns the CARRY-form step `step_carry(key, carry[, ctx]) ->
    (carry, metrics[, traj])`, where `traj` (collect only) is the
    chunk-stacked spill PyTree reshaped to `(num_steps, ..., B)`. Wrap
    with `_wrap_legacy` for the `rollout(key, states)` surface.
    """
    from minigrid_tpu.ops.fused_rollout import (
        R_RNG,
        PackedCarry,
        _action_stream_b,
        rows_key,
    )

    n_chunks = num_steps // tc
    t_iota = jnp.arange(tc, dtype=jnp.int32)[:, None]  # (tc, 1)

    def step_carry(key: jax.Array, carry: PackedCarry, ctx=None):
        ctx_args = (ctx,) if with_ctx else ()
        words0, regs0 = carry.words, carry.regs
        b = words0.shape[1]
        block = refresh_block or refresh_block_size(b)
        if stream_fn is not None:
            actions = stream_fn(key, b)
        else:
            actions = _action_stream_b(env, num_steps, key, b, actions_override)
        actions = actions.reshape(n_chunks, tc, b)
        assert carry.tmpl_words is not None, (
            "chunked-regen carry has no templates — build it with "
            "packed_init(env, states, mode='regen')"
        )

        slab0 = None
        if collect:
            # The spill slab's structure comes from chunk_fn itself
            # (trace-time only); its values are fully overwritten by the
            # merges (I5: every chunk row commits exactly once).
            spill_sd = jax.eval_shape(
                lambda *a: chunk_fn(*a)[6],
                words0, regs0, carry.tmpl_words, carry.tmpl_regs,
                actions[0], jnp.zeros((3, b), jnp.int32), *ctx_args,
            )
            slab0 = jax.tree.map(
                lambda s: jnp.zeros(s.shape, s.dtype), spill_sd
            )

        # Re-entry sub-batch width: a multiple of 128 (the engines' lane
        # minimum). Re-entry only serves lanes whose steps were deferred
        # (typically a small fraction of B), so re-running the FULL batch
        # through the kernel — as the protocol's first implementation did —
        # wasted up to 8x the kernel time per extra pass.
        rb = min(b, max(128, ((b // 8) // 128) * 128))

        def _account(m, rsum, epi, csum, ctl):
            return RolloutMetrics(
                episodes=m.episodes + jnp.sum(epi),
                total_reward=m.total_reward + jnp.sum(rsum),
                total_steps=m.total_steps,
                obs_checksum=m.obs_checksum + jnp.sum(csum),
                reset_overlaps=m.reset_overlaps + jnp.sum(ctl[2]),
            )

        def _advance_chain(cur_rng, tr, consumed):
            # Consumed lanes' chains advance one link (invariant I4) — to
            # the subkey the template generator stored (generate(rng).rng),
            # which the in-kernel reset also installed in the live regs.
            return jnp.where(
                consumed[:, None], rows_key(tr[R_RNG : R_RNG + 2]), cur_rng
            )

        def chunk_body(ch_carry, a_chunk):
            words, regs, tw, tr, cur_rng, m, slab = ch_carry

            # ---- pass 1: every lane needs all tc steps (cursor 0, so no
            # action pre-shift is needed) --------------------------------
            zeros_b = jnp.zeros((1, b), jnp.int32)
            ctl0 = jnp.concatenate([zeros_b, zeros_b, zeros_b], axis=0)
            out = chunk_fn(words, regs, tw, tr, a_chunk, ctl0, *ctx_args)
            words, regs, ctl, rsum, epi, csum = out[:6]
            if collect:
                slab = jax.tree.map(
                    lambda sl, sp: _merge_spill(
                        sl, sp, zeros_b, ctl[1:2, :], first_pass=True
                    ),
                    slab, out[6],
                )
            consumed = ctl[0] == 1  # (B,)
            cur_rng = _advance_chain(cur_rng, tr, consumed)
            tw, tr = masked_template_refresh(
                env, tw, tr, cur_rng, consumed, block
            )
            m = _account(m, rsum, epi, csum, ctl)
            steps_done = ctl[1:2, :]

            # ---- compacted re-entry rounds (invariants I3-I5): frozen
            # lanes — now holding fresh templates — are COMPACTED into
            # `rb`-lane sub-batches and only those re-enter the kernel
            # (chunk_fn is batch-width-agnostic: the same built kernel
            # grid-blocks any multiple of the lane block) ----------------
            def reentry_cond(st):
                return jnp.any(st[5] < tc)

            def reentry_body(st):
                words, regs, tw, tr, cur_rng, steps_done, m, slab = st
                unfin = steps_done[0] < tc  # (B,)
                order = jnp.argsort(
                    jnp.where(unfin, 0, 1), stable=True
                ).astype(jnp.int32)
                idx = order[:rb]  # (rb,) unfinished-first lanes
                act = unfin[idx]  # finished fill lanes no-op and are masked
                sd_s = steps_done[:, idx]
                # Per-lane action alignment (invariant I3): pre-shift each
                # lane's rows to its commit cursor so kernel row s is
                # global row steps_done + s.
                rows = jnp.minimum(sd_s + t_iota, tc - 1)  # (tc, rb)
                a_s = jnp.take_along_axis(a_chunk[:, idx], rows, axis=0)
                zeros_r = jnp.zeros((1, rb), jnp.int32)
                ctl0 = jnp.concatenate([zeros_r, sd_s, zeros_r], axis=0)
                out = chunk_fn(
                    words[:, idx], regs[:, idx], tw[:, idx], tr[:, idx],
                    a_s, ctl0, *ctx_args,
                )
                w2, r2, ctl, rsum, epi, csum = out[:6]
                words = words.at[:, idx].set(
                    jnp.where(act, w2, words[:, idx])
                )
                regs = regs.at[:, idx].set(jnp.where(act, r2, regs[:, idx]))
                if collect:
                    def _merge_sub(sl, sp):
                        sub = _merge_spill(sl[..., idx], sp, sd_s, ctl[1:2])
                        return sl.at[..., idx].set(
                            jnp.where(act, sub, sl[..., idx])
                        )

                    slab = jax.tree.map(_merge_sub, slab, out[6])
                consumed = (ctl[0] == 1) & act  # (rb,)
                cur_sub = _advance_chain(cur_rng[idx], tr[:, idx], consumed)
                cur_rng = cur_rng.at[idx].set(cur_sub)
                tw_s, tr_s = masked_template_refresh(
                    env, tw[:, idx], tr[:, idx], cur_sub, consumed,
                    min(block, rb),
                )
                tw = tw.at[:, idx].set(tw_s)
                tr = tr.at[:, idx].set(tr_s)
                steps_done = steps_done.at[:, idx].set(
                    jnp.where(act, ctl[1:2], sd_s)
                )
                m = _account(m, rsum, epi, csum, ctl)
                return (words, regs, tw, tr, cur_rng, steps_done, m, slab)

            st = (words, regs, tw, tr, cur_rng, steps_done, m, slab)
            words, regs, tw, tr, cur_rng, _, m, slab = lax.while_loop(
                reentry_cond, reentry_body, st
            )
            m = m._replace(total_steps=m.total_steps + b * tc)
            return (words, regs, tw, tr, cur_rng, m, slab), (
                slab if collect else None
            )

        m0 = RolloutMetrics(
            episodes=jnp.zeros((), jnp.int32),
            total_reward=jnp.zeros((), jnp.float32),
            total_steps=jnp.zeros((), jnp.int32),
            obs_checksum=jnp.zeros((), jnp.int32),
            reset_overlaps=jnp.zeros((), jnp.int32),
        )
        (words_f, regs_f, tw_f, tr_f, rng_f, metrics, _), ys = lax.scan(
            chunk_body,
            (words0, regs0, carry.tmpl_words, carry.tmpl_regs, carry.rng,
             m0, slab0),
            actions,
        )
        # `rng_f` is the exact reset-chain position per lane (= the regen
        # autoreset's state.rng); `tmpl_*` stay valid for the next call
        # (invariant I1: tmpl == generate(rng_f) per lane).
        out_carry = PackedCarry(words_f, regs_f, tw_f, tr_f, rng_f)
        if collect:
            traj = jax.tree.map(
                lambda y: y.reshape((num_steps,) + y.shape[2:]), ys
            )
            return out_carry, metrics, traj
        return out_carry, metrics

    return step_carry
