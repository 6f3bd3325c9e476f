"""Fused forward+backward Pallas kernel for the actor-critic gradient
pass over spilled trajectories.

The XLA gradient pass (`parallel.train._trajectory_grads_packed`) sits at
~57% effective MXU: the (980, B) bf16 feature block materializes in HBM
between the feature build and each matmul, and fwd/bwd run as separate
fusions. This kernel runs the WHOLE per-step chain — word->one-hot
feature build, bf16 torso forward, f32 heads, the policy-gradient loss
cotangent, and all five backward matmuls — inside one `pallas_call`,
with the weight-gradient accumulators resident in VMEM f32 scratch
across the sequential (time) grid dimension. Nothing but the compact
12-bit obs words and the per-step scalars ever crosses HBM.

Math: identical term-for-term to `_trajectory_grads_packed`'s
`chunk_loss` under `jax.grad` (hand-derived log_softmax/entropy/value
cotangents); floating-point association differs, so gradients agree to
float tolerance (asserted vs the XLA pass in tests/test_policy_rollout.py).

STATUS — PRODUCTION: the default gradient pass of
`parallel.train.build_fused_train_step` on the pallas path
(`grad_backend="kernel"`, via `_trajectory_grads_kernel`). Verified
against autodiff in interpret mode (tests/test_policy_rollout.py
TestGradKernel) and against the XLA packed pass both on-chip
(tools/bench_grad_kernel.py: f32 heads ≤7e-3, bf16 torso ≤2.5% at
B=32k/T=256 — reduction-order noise at 8.4M samples) and through the
train.py dispatch (test_grad_backend_kernel_matches_xla). Measured
89.6 ms vs the XLA pass's ~246 ms at B=32,768/T=256 on v5e — at the
~97 ms pure-matmul floor — lifting the full fused train step from
26.4M to 50.8M env-steps/s (B=32k regen; 57.1M at B=131k).

MOSAIC CRASH POSTMORTEM (round 5, kept for the record): the kernel
originally crashed this environment's remote tpu_compile_helper (exit 1,
no diagnostic) under both dimension-semantics settings, while
forward-only and every backward dot compiled standalone. Bisection
(2026-08-21, tools/probe_mosaic.py): any accumulator dot consuming a
relu-masked cotangent crashed — select-mask, bitwise-and on the bf16
bit pattern, int16-select-then-bitcast, a VMEM scratch roundtrip,
f32-dtype where, and lax.optimization_barrier ALL crashed identically.
The trigger is specifically a **bf16-dtype comparison** (`h_pre > 0`
with `h_pre: bf16`) feeding that dataflow; comparing the EXACT f32
upcast (`h_pre.astype(f32) > 0` — bit-identical mask, since bf16->f32
is exact) compiles and runs. Both relu-backward masks below use the
upcast form.

Reference anchor: this is learner-side machinery the reference never had
(SURVEY.md §2.11) — the training loop it accelerates consumes
reference-semantics trajectories (fresh layout per reset,
minigrid.py:~722-748, via ops/chunked_regen.py).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from minigrid_tpu.core import constants as C

_WIDTHS = (C.NUM_OBJECTS, C.NUM_COLORS, C.NUM_STATES)


def _feats_bf16(wv):
    """(V², bt) obs words -> (V²·20, bt) bf16 value-major one-hot rows
    (the kernel recipe of `ops.policy_rollout.policy_logits`; occlusion is
    already folded into the words as zeros)."""
    t = wv & 15
    c = (wv >> 4) & 15
    s = (wv >> 8) & 15
    rows = []
    for chan, width in zip((t, c, s), _WIDTHS):
        for val in range(width):
            rows.append((chan == val).astype(jnp.bfloat16))
    return jnp.concatenate(rows, axis=0)


def _grad_kernel(
    obs_ref, act_ref, adv_ref, ret_ref,
    wt1_ref, b1_ref, wt2_ref, b2_ref, wta_ref, ba_ref,
    dwt1_ref, db1_ref, dwt2_ref, db2_ref, dwta_ref, dba_ref, sums_ref,
    a_w1, a_b1, a_w2, a_b2, a_wa, a_ba, a_sums,
    *,
    tc: int,
    num_actions: int,
    denom: float,
    value_coef: float,
    entropy_coef: float,
    n_chunks: int,
):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        a_w1[:] = jnp.zeros_like(a_w1)
        a_b1[:] = jnp.zeros_like(a_b1)
        a_w2[:] = jnp.zeros_like(a_w2)
        a_b2[:] = jnp.zeros_like(a_b2)
        a_wa[:] = jnp.zeros_like(a_wa)
        a_ba[:] = jnp.zeros_like(a_ba)
        a_sums[:] = jnp.zeros_like(a_sums)

    wt1 = wt1_ref[:]
    b1 = b1_ref[:]
    wt2 = wt2_ref[:]
    b2 = b2_ref[:]
    wta = wta_ref[:]
    ba = ba_ref[:]
    a_n = num_actions
    inv_denom = jnp.float32(1.0 / denom)

    def step(s_i, _):
        wv = obs_ref[s_i]  # (V², bt) int32
        act = act_ref[pl.ds(s_i, 1), :]  # (1, bt)
        adv = adv_ref[pl.ds(s_i, 1), :]  # (1, bt) f32
        ret = ret_ref[pl.ds(s_i, 1), :]

        # ---- forward (policy_logits math) -----------------------------
        feats = _feats_bf16(wv)  # (F, bt) bf16
        h1d = jnp.dot(wt1, feats, preferred_element_type=jnp.float32)
        h1p = h1d.astype(jnp.bfloat16) + b1
        h1 = jnp.maximum(h1p, 0)
        h2d = jnp.dot(wt2, h1, preferred_element_type=jnp.float32)
        h2p = h2d.astype(jnp.bfloat16) + b2
        h2 = jnp.maximum(h2p, 0)
        h2f = h2.astype(jnp.float32)
        head = jnp.dot(wta, h2f, preferred_element_type=jnp.float32) + ba

        # ---- loss cotangent on the head (8, bt) -----------------------
        # logits rows 0..A-1; value row 7. log_softmax over the A rows.
        m = head[0:1, :]
        for i in range(1, a_n):
            m = jnp.maximum(m, head[i : i + 1, :])
        exps = [jnp.exp(head[i : i + 1, :] - m) for i in range(a_n)]
        total = exps[0]
        for e in exps[1:]:
            total = total + e
        logz = jnp.log(total) + m
        rows_dlp = []  # dL/d logp_all rows (pre log_softmax backward)
        ent_sum_c = jnp.zeros_like(m)
        pg_sum_c = jnp.zeros_like(m)
        p_rows = []
        for i in range(a_n):
            lp = head[i : i + 1, :] - logz
            p = exps[i] / total
            p_rows.append(p)
            onehot = (act == i).astype(jnp.float32)
            # pg_sum = -sum(logp[a]·adv);  d/dlp_i = -adv·1[i==a]
            # ent = -sum p·lp (p = exp(lp)); d/dlp_i = -p(lp + 1)
            rows_dlp.append(
                (-adv) * onehot * inv_denom
                + (-entropy_coef) * (-(p * (lp + 1.0))) * inv_denom
            )
            ent_sum_c = ent_sum_c - p * lp
            pg_sum_c = pg_sum_c - lp * onehot * adv
        s_dlp = rows_dlp[0]
        for r in rows_dlp[1:]:
            s_dlp = s_dlp + r
        dhead_rows = []
        for i in range(8):
            if i < a_n:
                dhead_rows.append(rows_dlp[i] - p_rows[i] * s_dlp)
            elif i == 7:
                v = head[7:8, :]
                dhead_rows.append(
                    jnp.float32(2.0 * value_coef) * (v - ret) * inv_denom
                )
            else:
                dhead_rows.append(jnp.zeros_like(m))
        dhead = jnp.concatenate(dhead_rows, axis=0)  # (8, bt) f32
        v_sum_c = (head[7:8, :] - ret) ** 2

        # ---- backward ---------------------------------------------------
        # Bias/scalar reductions ride the MXU as dots with a ones matrix
        # (full-block accumulator stores — no narrow slice writes, which
        # Mosaic lowers poorly).
        ones_b = jnp.ones((wv.shape[1], 128), jnp.float32)
        # A @ B^T and A^T @ B ride dot_general dimension numbers (Mosaic
        # lowers contractions on either dim; explicit .T transposes of
        # non-lane-aligned VMEM values do not).
        mm_nt = lambda a_, b_: lax.dot_general(  # noqa: E731 — A @ B^T
            a_, b_, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        mm_tn = lambda a_, b_: lax.dot_general(  # noqa: E731 — A^T @ B
            a_, b_, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        # head = wta @ h2f + ba
        a_wa[:] += mm_nt(dhead, h2f)
        a_ba[:] += jnp.dot(dhead, ones_b, preferred_element_type=jnp.float32)
        dh2f = mm_tn(wta, dhead)
        # h2 = relu(bf16(h2d) + b2); grads flow in bf16 past the cast.
        # The relu mask compares the EXACT f32 upcast of the bf16
        # pre-activation, not the bf16 value itself: a bf16-dtype compare
        # feeding a dot-consumed cotangent crashes this environment's
        # Mosaic compiler (tools/probe_mosaic.py: base_where/bitand/
        # int-select/scratch/f32-dot/opt-barrier ALL crash; upcast_cmp
        # compiles). bf16->f32 upcast is exact, so the mask is
        # bit-identical to `h2p > 0`.
        dh2 = jnp.where(
            h2p.astype(jnp.float32) > 0, dh2f, 0.0
        ).astype(jnp.bfloat16)
        a_b2[:] += jnp.dot(
            dh2.astype(jnp.float32), ones_b,
            preferred_element_type=jnp.float32,
        )
        a_w2[:] += mm_nt(dh2, h1)
        dh1f = mm_tn(wt2, dh2)
        dh1 = jnp.where(
            h1p.astype(jnp.float32) > 0, dh1f, 0.0
        ).astype(jnp.bfloat16)
        a_b1[:] += jnp.dot(
            dh1.astype(jnp.float32), ones_b,
            preferred_element_type=jnp.float32,
        )
        a_w1[:] += mm_nt(dh1, feats)

        pad = jnp.zeros((5, wv.shape[1]), jnp.float32)
        srows = jnp.concatenate([pg_sum_c, v_sum_c, ent_sum_c, pad], axis=0)
        a_sums[:] += jnp.dot(srows, ones_b, preferred_element_type=jnp.float32)
        return 0

    lax.fori_loop(0, tc, step, 0)

    @pl.when(j == n_chunks - 1)
    def _emit():
        dwt1_ref[:] = a_w1[:][None]
        db1_ref[:] = a_b1[:][None]
        dwt2_ref[:] = a_w2[:][None]
        db2_ref[:] = a_b2[:][None]
        dwta_ref[:] = a_wa[:][None]
        dba_ref[:] = a_ba[:][None]
        sums_ref[:] = a_sums[:][None]


def build_grad_kernel(
    view: int,
    num_actions: int,
    t_total: int,
    b: int,
    denom: float,
    value_coef: float,
    entropy_coef: float,
    tc: int = 8,
    bt: int = 512,
    h1: int = 256,
    h2: int = 256,
    interpret: bool = False,
):
    """Returns `grads(w: EvalWeights, obs_w (T, V², B) i32, actions (T, B)
    i32, adv (T, B) f32, ret (T, B) f32) -> (gw: EvalWeights cotangents,
    sums (3,) f32 = [pg_sum, v_sum, ent_sum])`."""
    v2 = view * view
    f_total = v2 * sum(_WIDTHS)
    assert t_total % tc == 0 and b % bt == 0
    n_chunks = t_total // tc
    nb = b // bt
    kernel = functools.partial(
        _grad_kernel,
        tc=tc, num_actions=num_actions, denom=denom,
        value_coef=value_coef, entropy_coef=entropy_coef,
        n_chunks=n_chunks,
    )

    def grads(w, obs_w, actions, adv, ret) -> Tuple:
        lane = lambda r: pl.BlockSpec((r, bt), lambda i, j: (0, i))  # noqa: E731
        tlane = lambda r: pl.BlockSpec((r, bt), lambda i, j: (j, i))  # noqa: E731
        rep = lambda arr: pl.BlockSpec(arr.shape, lambda i, j: (0, 0))  # noqa: E731
        out_block = lambda shape: pl.BlockSpec(  # noqa: E731
            (1,) + shape, lambda i, j: (i,) + (0,) * len(shape)
        )
        outs = pl.pallas_call(
            kernel,
            grid=(nb, n_chunks),
            in_specs=[
                pl.BlockSpec((tc, v2, bt), lambda i, j: (j, 0, i)),
                tlane(tc), tlane(tc), tlane(tc),
                rep(w.wt1), rep(w.b1), rep(w.wt2), rep(w.b2),
                rep(w.wta), rep(w.ba),
            ],
            out_specs=[
                out_block((h1, f_total)), out_block((h1, 128)),
                out_block((h2, h1)), out_block((h2, 128)),
                out_block((8, h2)), out_block((8, 128)),
                out_block((8, 128)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((nb, h1, f_total), jnp.float32),
                jax.ShapeDtypeStruct((nb, h1, 128), jnp.float32),
                jax.ShapeDtypeStruct((nb, h2, h1), jnp.float32),
                jax.ShapeDtypeStruct((nb, h2, 128), jnp.float32),
                jax.ShapeDtypeStruct((nb, 8, h2), jnp.float32),
                jax.ShapeDtypeStruct((nb, 8, 128), jnp.float32),
                jax.ShapeDtypeStruct((nb, 8, 128), jnp.float32),
            ],
            scratch_shapes=[
                pltpu.VMEM((h1, f_total), jnp.float32),
                pltpu.VMEM((h1, 128), jnp.float32),
                pltpu.VMEM((h2, h1), jnp.float32),
                pltpu.VMEM((h2, 128), jnp.float32),
                pltpu.VMEM((8, h2), jnp.float32),
                pltpu.VMEM((8, 128), jnp.float32),
                pltpu.VMEM((8, 128), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary"),
            ),
            interpret=interpret,
        )(
            obs_w, actions,
            adv.astype(jnp.float32), ret.astype(jnp.float32),
            w.wt1, w.b1, w.wt2, w.b2, w.wta, w.ba,
        )
        dwt1, db1, dwt2, db2, dwta, dba, sums = outs
        gw = type(w)(
            wt1=jnp.sum(dwt1, axis=0).astype(w.wt1.dtype),
            b1=jnp.sum(db1, axis=0)[:, 0:1].astype(w.b1.dtype),
            wt2=jnp.sum(dwt2, axis=0).astype(w.wt2.dtype),
            b2=jnp.sum(db2, axis=0)[:, 0:1].astype(w.b2.dtype),
            wta=jnp.sum(dwta, axis=0),
            ba=jnp.sum(dba, axis=0)[:, 0:1],
        )
        s = jnp.sum(sums, axis=0)  # (8, 128)
        return gw, jnp.stack([s[0, 0], s[1, 0], s[2, 0]])

    return grads
