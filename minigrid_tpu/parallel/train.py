"""Sharded on-device rollout + policy-gradient training step.

One jitted program does everything: T env steps (vmap'd auto-resetting
transition + obs encode), advantage estimation, actor-critic loss, and the
optimizer update. The env batch is sharded over the mesh's 'env' axis;
parameters are replicated over 'env' and (optionally) sharded over 'model'.
Gradients are averaged across shards by XLA-inserted collectives — the
GSPMD equivalent of the NCCL all-reduce the reference never had.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from minigrid_tpu.core.autoreset import make_autoreset_step
from minigrid_tpu.core.obs import gen_obs_image
from minigrid_tpu.core.state import EnvState
from minigrid_tpu.envs.base import Env
from minigrid_tpu.models.policy import ActorCritic
from minigrid_tpu.parallel.sharding import ENV_AXIS, env_sharding, replicated


class TrainState(NamedTuple):
    params: Any
    opt_state: Any


def make_model(env: Env) -> ActorCritic:
    return ActorCritic(num_actions=env.num_actions)


def make_optimizer(lr: float = 3e-4) -> optax.GradientTransformation:
    # optax.flatten: run the update math on ONE concatenated vector
    # instead of per-leaf ops — the 8-leaf tree update measured 25 ms/step
    # on the tunneled TPU (pure small-op dispatch; the arithmetic is
    # microseconds), ~8% of the whole fused train step.
    return optax.flatten(
        optax.chain(optax.clip_by_global_norm(0.5), optax.adam(lr))
    )


def init_train_state(key: jax.Array, env: Env, mesh: Mesh) -> TrainState:
    model = make_model(env)
    v = env.config.agent_view_size
    dummy = jnp.zeros((1, v, v, 3), dtype=jnp.uint8)
    params = model.init(key, dummy)
    opt_state = make_optimizer().init(params)
    rep = replicated(mesh)
    return TrainState(
        params=jax.tree.map(lambda x: jax.device_put(x, rep), params),
        opt_state=jax.tree.map(
            lambda x: jax.device_put(x, rep) if hasattr(x, "shape") else x, opt_state
        ),
    )


def _trajectory_returns(reward, done, gamma):
    """Discounted returns computed backward over the scan axis (T, B)."""
    not_done = 1.0 - done.astype(jnp.float32)

    def disc(carry, xs):
        r, nd = xs
        ret = r + gamma * nd * carry
        return ret, ret

    _, returns = lax.scan(
        disc, jnp.zeros_like(reward[0]), (reward, not_done), reverse=True
    )
    return returns


def _fit_time_chunk(num_steps: int, target: int) -> int:
    tc = min(target, num_steps)
    while num_steps % tc:
        tc -= 1
    return tc


def _trajectory_grads(
    model, params, traj, gamma, value_coef, entropy_coef, time_chunk=4
):
    """Parameter gradients + metrics of the actor-critic loss over a
    `(obs, actions, logp, value, reward, done)` trajectory with (T, B)
    leading axes. Shared verbatim by the vmap and packed train steps so
    their updates are identical given identical trajectories.

    The gradient is ACCUMULATED over `time_chunk`-step slices under a
    `lax.scan` instead of one `model.apply` over the full `(T·B, ...)`
    trajectory: the loss is a mean of independent per-(t, b) terms, so
    chunked grads are the same sum in a different association order, while
    peak memory drops from O(T·B·features) activations (the round-3 train
    step's ceiling — the full-trajectory re-apply materialized the whole
    one-hot feature block plus both hidden layers for the backward pass)
    to O(time_chunk·B·features). `time_chunk` only affects speed/memory,
    not semantics.
    """
    obs, actions, logp_b, value, reward, done = traj
    t_total, b = reward.shape
    tc = _fit_time_chunk(t_total, time_chunk)
    returns = _trajectory_returns(reward, done, gamma)
    adv = lax.stop_gradient(returns - value)
    ret_sg = lax.stop_gradient(returns)
    denom = float(t_total * b)

    def reshape_c(x):
        return x.reshape((t_total // tc, tc) + x.shape[1:])

    chunks = (reshape_c(obs), reshape_c(actions), reshape_c(adv),
              reshape_c(ret_sg))

    def chunk_loss(params, chunk):
        obs_c, act_c, adv_c, ret_c = chunk
        logits, value_now = model.apply(params, obs_c)
        logp_all = jax.nn.log_softmax(logits)
        logp = jnp.take_along_axis(logp_all, act_c[..., None], axis=-1)[..., 0]
        entropy = -jnp.sum(jnp.exp(logp_all) * logp_all, axis=-1)
        pg_sum = -jnp.sum(logp * adv_c)
        v_sum = jnp.sum((value_now - ret_c) ** 2)
        ent_sum = jnp.sum(entropy)
        loss = (pg_sum + value_coef * v_sum - entropy_coef * ent_sum) / denom
        return loss, jnp.stack([pg_sum, v_sum, ent_sum])

    def body(acc, chunk):
        grads, sums = acc
        g, s = jax.grad(chunk_loss, has_aux=True)(params, chunk)
        return (jax.tree.map(jnp.add, grads, g), sums + s), None

    zero_g = jax.tree.map(jnp.zeros_like, params)
    (grads, sums), _ = lax.scan(
        body, (zero_g, jnp.zeros((3,), jnp.float32)), chunks
    )
    pg_loss = sums[0] / denom
    v_loss = sums[1] / denom
    ent = sums[2] / denom
    metrics = {
        "loss": pg_loss + value_coef * v_loss - entropy_coef * ent,
        "pg_loss": pg_loss,
        "v_loss": v_loss,
        "entropy": ent,
        "reward_per_step": jnp.mean(reward),
        "episodes": jnp.sum(done.astype(jnp.float32)),
    }
    return grads, metrics


def _trajectory_grads_packed(
    params, traj, view, num_actions, gamma, value_coef, entropy_coef,
    time_chunk=4,
):
    """`_trajectory_grads` in the KERNEL's feature layout: consumes the
    spilled compact obs words `(T, V², B)` directly and runs the forward
    with `ops.policy_rollout.policy_logits` on the transposed, permuted
    `EvalWeights` — differentiating THROUGH `train_weights_from_params`,
    so gradients land on the ordinary flax param tree exactly (the
    permutation/transpose/cast/pad chain is linear; JAX transposes it).

    Motivation (BASELINE.md train profile): the flax-layout gradient pass
    re-materialized the trajectory as `(T, B, V, V, 3)` uint8 images
    (1.2 GB at B=32k, T=256) and re-encoded `(chunk·B, 980)` one-hots
    from them every chunk, holding the grad pass at ~36% MXU. Here the
    features build from the 12-bit obs words with ~20 vectorized compares
    (the kernel's own recipe) straight into the `(980, chunk·B)` matmul
    operand. Loss math is identical term-for-term (reduction order
    differs, so grads agree to float tolerance — asserted in
    tests/test_policy_rollout.py)."""
    from minigrid_tpu.ops.policy_rollout import (
        policy_logits,
        train_weights_from_params,
    )

    obs_w, actions, logp_b, value, reward, done = traj  # obs_w (T, V², B)
    t_total, b = reward.shape
    tc = _fit_time_chunk(t_total, time_chunk)
    returns = _trajectory_returns(reward, done, gamma)
    adv = lax.stop_gradient(returns - value)
    ret_sg = lax.stop_gradient(returns)
    denom = float(t_total * b)
    a = num_actions

    def reshape_c(x):
        return x.reshape((t_total // tc, tc) + x.shape[1:])

    chunks = (reshape_c(obs_w), reshape_c(actions), reshape_c(adv),
              reshape_c(ret_sg))

    def chunk_loss(w, chunk):
        obs_c, act_c, adv_c, ret_c = chunk  # (tc, V², B), (tc, B), ...
        # One (980, B) matmul chain per step, UNROLLED over the chunk:
        # obs_c[s] is already lane-major contiguous, so no time-major ->
        # lane-major transpose ever materializes (round 4's lane-major
        # grad attempt lost 17% to exactly that relayout, BASELINE.md).
        pg_sum = jnp.float32(0)
        v_sum = jnp.float32(0)
        ent_sum = jnp.float32(0)
        for s_i in range(tc):
            wv = obs_c[s_i]  # (V², B)
            # Occlusion is folded into the words (zeros), so vis == 1.
            head = policy_logits(wv, jnp.ones_like(wv), w, view)  # (8, B)
            logits = head[:a]
            logp_all = jax.nn.log_softmax(logits, axis=0)
            logp = jnp.take_along_axis(logp_all, act_c[s_i][None], axis=0)[0]
            entropy = -jnp.sum(jnp.exp(logp_all) * logp_all, axis=0)
            pg_sum -= jnp.sum(logp * adv_c[s_i])
            v_sum += jnp.sum((head[7] - ret_c[s_i]) ** 2)
            ent_sum += jnp.sum(entropy)
        loss = (pg_sum + value_coef * v_sum - entropy_coef * ent_sum) / denom
        return loss, jnp.stack([pg_sum, v_sum, ent_sum])

    # The flax->kernel weight transform (permute/transpose/cast/pad) is
    # LINEAR, so accumulating cotangents in the kernel layout and pulling
    # them back ONCE equals per-chunk pullbacks exactly — and drops a
    # (980, 256) gather + scatter-add pair from every scan iteration.
    w0, pullback = jax.vjp(
        lambda p: train_weights_from_params(p, view), params
    )

    def body(acc, chunk):
        gw, sums = acc
        g, s_ = jax.grad(chunk_loss, has_aux=True)(w0, chunk)
        return (jax.tree.map(jnp.add, gw, g), sums + s_), None

    zero_gw = jax.tree.map(jnp.zeros_like, w0)
    (gw, sums), _ = lax.scan(
        body, (zero_gw, jnp.zeros((3,), jnp.float32)), chunks
    )
    grads = pullback(gw)[0]
    pg_loss = sums[0] / denom
    v_loss = sums[1] / denom
    ent = sums[2] / denom
    metrics = {
        "loss": pg_loss + value_coef * v_loss - entropy_coef * ent,
        "pg_loss": pg_loss,
        "v_loss": v_loss,
        "entropy": ent,
        "reward_per_step": jnp.mean(reward),
        "episodes": jnp.sum(done.astype(jnp.float32)),
    }
    return grads, metrics


def _grad_tile(n: int, pref: int) -> int:
    """Largest power-of-two divisor of `n` that is ≤ `pref`."""
    t = pref
    while t > 1 and n % t:
        t //= 2
    return t


def _trajectory_grads_kernel(
    params, traj, view, num_actions, gamma, value_coef, entropy_coef,
    interpret=None,
):
    """`_trajectory_grads_packed` with the whole per-step chain — feature
    build, bf16 torso fwd, f32 heads, hand-derived loss cotangents, all
    five backward matmuls — fused into ONE Pallas kernel
    (`ops.grad_kernel`), weight-grad accumulators resident in VMEM f32
    scratch across the time grid. Measured 89.6 ms vs the XLA pass's
    ~246 ms at B=32,768/T=256 on v5e (tools/bench_grad_kernel.py) — at
    the ~97 ms pure-matmul floor the XLA pass couldn't reach because the
    (980, B) bf16 feature block round-tripped HBM between build and
    matmul. Same loss term-for-term; reduction order differs, so grads
    agree to float tolerance (tests/test_policy_rollout.py)."""
    from minigrid_tpu.ops.grad_kernel import build_grad_kernel
    from minigrid_tpu.ops.policy_rollout import train_weights_from_params
    from minigrid_tpu.utils.platform import mosaic_available

    obs_w, actions, _logp, value, reward, done = traj
    t_total, b = reward.shape
    tc = _grad_tile(t_total, 8)
    bt = _grad_tile(b, 1024)
    if interpret is None:
        interpret = not mosaic_available()
    returns = _trajectory_returns(reward, done, gamma)
    adv = returns - value
    denom = float(t_total * b)
    gk = build_grad_kernel(
        view, num_actions, t_total, b, denom, value_coef, entropy_coef,
        tc=tc, bt=bt, interpret=interpret,
    )
    # The flax->kernel weight transform is linear; pull the kernel-layout
    # cotangents back through it once (same trick as the packed pass).
    w0, pullback = jax.vjp(
        lambda p: train_weights_from_params(p, view), params
    )
    gw, sums = gk(w0, obs_w, actions, adv, returns)
    grads = pullback(gw)[0]
    pg_loss = sums[0] / denom
    v_loss = sums[1] / denom
    ent = sums[2] / denom
    metrics = {
        "loss": pg_loss + value_coef * v_loss - entropy_coef * ent,
        "pg_loss": pg_loss,
        "v_loss": v_loss,
        "entropy": ent,
        "reward_per_step": jnp.mean(reward),
        "episodes": jnp.sum(done.astype(jnp.float32)),
    }
    return grads, metrics


def build_train_step(
    env: Env,
    mesh: Mesh,
    num_steps: int,
    gamma: float = 0.99,
    entropy_coef: float = 0.01,
    value_coef: float = 0.5,
    mode: str = "regen",
    time_chunk: int = 4,
):
    """Returns jitted `train_step(train_state, states, key) ->
    (train_state, states, metrics)` with mesh-aware shardings. `mode` is
    the auto-reset mode ("regen"/"cached", core/autoreset.py)."""
    model = make_model(env)
    optimizer = make_optimizer()
    auto_step = jax.vmap(make_autoreset_step(env, mode=mode))
    batched_obs = jax.vmap(lambda s: gen_obs_image(s, env.config))

    def rollout(params, states: EnvState, key: jax.Array):
        def body(carry, key_t):
            # Pre-action obs rides the carry from the previous auto-reset
            # step, so the encoder runs once per step (not twice).
            states, obs = carry
            logits, value = model.apply(params, obs)
            actions = jax.random.categorical(key_t, logits)
            logp = jax.nn.log_softmax(logits)[
                jnp.arange(actions.shape[0]), actions
            ]
            states, next_obs, reward, term, trunc = auto_step(
                states, actions.astype(jnp.int32)
            )
            done = term | trunc
            return (states, next_obs["image"]), (
                obs,
                actions,
                logp,
                value,
                reward,
                done,
            )

        keys = jax.random.split(key, num_steps)
        (states, _), traj = lax.scan(body, (states, batched_obs(states)), keys)
        return states, traj

    def train_step(train_state: TrainState, states: EnvState, key: jax.Array):
        # The rollout is inference-only (the loss consumes the trajectory
        # as data), so it runs OUTSIDE jax.grad entirely; gradients come
        # from the time-chunked accumulation in `_trajectory_grads`.
        states, traj = rollout(train_state.params, states, key)
        grads, metrics = _trajectory_grads(
            model, train_state.params, traj, gamma, value_coef, entropy_coef,
            time_chunk=time_chunk,
        )
        updates, opt_state = optimizer.update(
            grads, train_state.opt_state, train_state.params
        )
        params = optax.apply_updates(train_state.params, updates)
        return TrainState(params, opt_state), states, metrics

    shard_env = env_sharding(mesh)
    rep = replicated(mesh)
    return jax.jit(
        train_step,
        in_shardings=(rep, shard_env, rep),
        out_shardings=(rep, shard_env, rep),
    )


def build_packed_train_step(
    env: Env,
    mesh: Mesh,
    num_steps: int,
    mode: str = "regen",
    gamma: float = 0.99,
    entropy_coef: float = 0.01,
    value_coef: float = 0.5,
    as_carry: bool = False,
    time_chunk: int = 4,
):
    """Policy-in-the-loop training on the packed-lane engine.

    Same contract and update math as `build_train_step` (they share
    `_trajectory_grads`, and on supported envs produce IDENTICAL updates —
    asserted in tests/test_parallel.py) but the environment runs in the
    packed `(H·W, B)` / `(NUM_REGS, B)` layout of `ops/fused_rollout.py`:
    per step the packed transition produces the egocentric view directly,
    `packed_obs_image` lifts it to the `(B, V, V, 3)` policy input, the
    actor-critic samples the next actions, and everything — simulation,
    inference, loss, optimizer — stays in ONE jitted program with the env
    dimension on the TPU vector lanes. Supported on the same families as
    `fused_rollout_supported(env, mode=mode)`.

    With `as_carry=True` the step signature becomes
    `(TrainState, PackedCarry, key) -> (TrainState, PackedCarry, metrics)`
    — the steady-state surface of `ops/fused_rollout.packed_init`/
    `packed_finish`, skipping the per-call template-generation/pack/unpack
    the `EnvState` surface pays (for procedural families like MultiRoom
    the template `vmap(generate)` dwarfs the rollout at small
    `num_steps`).
    """
    import functools

    from minigrid_tpu.ops.fused_rollout import (
        R_RNG,
        PackedCarry,
        _fit_chunk,
        _masked_template_refresh,
        _matmul_rows,
        _obs_core,
        _packed_hook,
        _refresh_block_size,
        _regen_is_static,
        _replay_rng_chain,
        _replay_rng_chain_fn,
        _step_core,
        fused_rollout_supported,
        packed_finish,
        packed_init,
        packed_obs_image,
        rows_key,
    )

    if not fused_rollout_supported(env, mode=mode):
        raise ValueError(
            f"packed train step (mode={mode!r}) does not support "
            f"{env.env_id!r}; use build_train_step"
        )
    model = make_model(env)
    optimizer = make_optimizer()
    cfg = env.config
    v = cfg.agent_view_size
    hook, remap_action, pre_hook = _packed_hook(env)
    geom = dict(
        width=cfg.width,
        height=cfg.height,
        view=v,
        see_through_walls=cfg.see_through_walls,
        row_reader=_matmul_rows,
    )
    step_math = functools.partial(
        _step_core,
        max_steps=cfg.max_steps,
        hook=hook,
        remap_action=remap_action,
        pre_hook=pre_hook,
        with_obs=True,
        **geom,
    )
    obs_math = functools.partial(_obs_core, **geom)

    # Regen on random-layout families: refresh each lane's reset template
    # every `tc` steps (the train-loop instance of the chunked scheme in
    # ops/fused_rollout._build_chunked_regen, WITHOUT its freeze/re-entry
    # commit protocol: the policy samples actions online from a per-STEP
    # shared key, so a per-lane resume would change the key stream —
    # in-chunk repeat resets therefore reuse the chunk template here, the
    # documented approximation of this surface). Templates ride the carry
    # and only consumed lanes regenerate (`_masked_template_refresh`).
    refresh = mode == "regen" and not _regen_is_static(env)
    tc = _fit_chunk(num_steps, 32) if refresh else num_steps
    n_chunks = num_steps // tc
    chain_step = jax.vmap(lambda k: env.generate(k, cfg).rng)

    def rollout_packed(params, pc: "PackedCarry", key: jax.Array):
        words0, regs0 = pc.words, pc.regs
        img0 = packed_obs_image(*obs_math(words0, regs0), v)
        b = img0.shape[0]
        csum0 = jnp.zeros((1, b), jnp.int32)

        def make_body(tmpl_words, tmpl_regs):
            def body(carry, key_t):
                words, regs, img, csum = carry
                logits, value = model.apply(params, img)
                actions = jax.random.categorical(key_t, logits)
                logp = jax.nn.log_softmax(logits)[jnp.arange(b), actions]
                words2, regs2, reward, done, obs_sum, vw, vis = step_math(
                    words, regs, actions[None, :].astype(jnp.int32),
                    tmpl_words, tmpl_regs,
                )
                img2 = packed_obs_image(vw, vis, v)
                return (words2, regs2, img2, csum + obs_sum), (
                    img, actions, logp, value, reward[0], done[0],
                )

            return body

        keys = jax.random.split(key, num_steps)
        if refresh:
            keys = keys.reshape(n_chunks, tc, -1)
            block = _refresh_block_size(b)

            def chunk(carry, keys_c):
                words, regs, tw, tr, img, csum, cur_rng = carry
                (words, regs, img, csum), traj_c = lax.scan(
                    make_body(tw, tr), (words, regs, img, csum), keys_c
                )
                epi_c = jnp.sum(traj_c[5].astype(jnp.int32), axis=0)  # (B,)
                consumed = epi_c >= 1
                rng1 = jnp.where(
                    consumed[:, None],
                    rows_key(tr[R_RNG : R_RNG + 2]),
                    cur_rng,
                )
                new_rng = _replay_rng_chain_fn(
                    chain_step, rng1, jnp.maximum(epi_c - 1, 0)
                )
                tw, tr = _masked_template_refresh(
                    env, tw, tr, new_rng, consumed, block
                )
                return (words, regs, tw, tr, img, csum, new_rng), traj_c

            (words_f, regs_f, tw_f, tr_f, _, csum, rng_f), traj = lax.scan(
                chunk,
                (words0, regs0, pc.tmpl_words, pc.tmpl_regs, img0, csum0,
                 pc.rng),
                keys,
            )
            traj = jax.tree.map(
                lambda x: x.reshape((num_steps,) + x.shape[2:]), traj
            )
            pc_f = PackedCarry(words_f, regs_f, tw_f, tr_f, rng_f)
        else:
            (words_f, regs_f, _, csum), traj = lax.scan(
                make_body(pc.tmpl_words, pc.tmpl_regs),
                (words0, regs0, img0, csum0),
                keys,
            )
            rng_f = pc.rng
            if mode == "regen":
                # Static-template regen (deterministic layouts): replay the
                # per-lane reset chain for exact rng continuity.
                episodes = jnp.sum(traj[5].astype(jnp.int32), axis=0)
                rng_f = _replay_rng_chain(env, pc.rng, episodes)
            pc_f = PackedCarry(
                words_f, regs_f, pc.tmpl_words, pc.tmpl_regs, rng_f
            )
        return pc_f, traj

    def rollout(params, states: EnvState, key: jax.Array):
        pc, traj = rollout_packed(params, packed_init(env, states, mode), key)
        return packed_finish(env, pc), traj

    rollout_fn = rollout_packed if as_carry else rollout

    def train_step(train_state: TrainState, states: EnvState, key: jax.Array):
        # Rollout outside jax.grad (inference-only); gradients via the
        # time-chunked accumulation shared with the vmap train step.
        states, traj = rollout_fn(train_state.params, states, key)
        grads, metrics = _trajectory_grads(
            model, train_state.params, traj, gamma, value_coef, entropy_coef,
            time_chunk=time_chunk,
        )
        updates, opt_state = optimizer.update(
            grads, train_state.opt_state, train_state.params
        )
        params = optax.apply_updates(train_state.params, updates)
        return TrainState(params, opt_state), states, metrics

    rep = replicated(mesh)
    if as_carry:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from minigrid_tpu.parallel.sharding import ENV_AXIS  # noqa: F811

        # Packed layouts carry the batch in the LANE (last) axis.
        lane = NamedSharding(mesh, P(None, ENV_AXIS))
        shard_state = PackedCarry(
            words=lane,
            regs=lane,
            tmpl_words=lane,
            tmpl_regs=lane,
            rng=env_sharding(mesh),
        )
    else:
        shard_state = env_sharding(mesh)
    return jax.jit(
        train_step,
        in_shardings=(rep, shard_state, rep),
        out_shardings=(rep, shard_state, rep),
    )


def build_fused_train_step(
    env: Env,
    mesh: Mesh,
    num_steps: int,
    mode: str = "cached",
    gamma: float = 0.99,
    entropy_coef: float = 0.01,
    value_coef: float = 0.5,
    time_chunk: int = 4,
    backend: str = "auto",
    grad_backend: str = "auto",
):
    """The fully fused training fast path: the ACTOR runs inside the
    Pallas rollout kernel (ops/policy_rollout.py), which spills the
    trajectory (compact obs words, action, logp, value, reward, done) to
    HBM; the time-chunked gradient pass and Adam update run in the same
    jitted program. `grad_backend` picks the gradient pass: "kernel"
    (the fused fwd+bwd Pallas kernel, `_trajectory_grads_kernel` —
    2.7x the XLA pass at B=32k), "xla" (`_trajectory_grads_packed`), or
    "auto" (kernel whenever the rollout backend is pallas).

    Surface: `train_step(train_state, carry, key) -> (train_state, carry,
    metrics)` over a steady `ops.fused_rollout.PackedCarry` (build once
    with `packed_init(env, states, mode)`, unpack with `packed_finish`) —
    the rollout never re-packs between optimizer steps.

    Differences vs `build_packed_train_step` (documented, tested):
    actions sample via the kernel's inverse-CDF Threefry recipe (a
    different — equally categorical — stream than
    `jax.random.categorical`), and the advantage baseline `value` comes
    from the in-kernel bf16 forward (agrees with the flax forward to bf16
    tolerance). Updates are therefore numerically equivalent but not
    byte-identical to the XLA train steps; the kernel and its XLA twin
    (`backend="xla"`) ARE byte-identical to each other. Supported on
    cached mode and static-layout regen (`policy_rollout_supported`).
    """
    from minigrid_tpu.ops.fused_rollout import PackedCarry
    from minigrid_tpu.ops.policy_rollout import build_fused_train_rollout

    if backend == "auto":
        from minigrid_tpu.utils.platform import mosaic_available

        backend = "pallas" if mosaic_available() else "xla"
    optimizer = make_optimizer()
    roll = build_fused_train_rollout(
        env, num_steps, mode=mode, backend=backend, raw_obs=True
    )
    view = env.config.agent_view_size

    if grad_backend == "auto":
        grad_backend = "kernel" if backend == "pallas" else "xla"

    def grad_pass(params, traj):
        if grad_backend == "kernel":
            return _trajectory_grads_kernel(
                params, traj, view, env.num_actions, gamma,
                value_coef, entropy_coef,
            )
        return _trajectory_grads_packed(
            params, traj, view, env.num_actions, gamma,
            value_coef, entropy_coef, time_chunk=time_chunk,
        )

    def train_step(train_state: TrainState, carry, key: jax.Array):
        carry, traj, roll_metrics = roll(train_state.params, key, carry)
        grads, metrics = grad_pass(train_state.params, traj)
        updates, opt_state = optimizer.update(
            grads, train_state.opt_state, train_state.params
        )
        params = optax.apply_updates(train_state.params, updates)
        metrics = dict(metrics, env_steps=roll_metrics.total_steps)
        return TrainState(params, opt_state), carry, metrics

    rep = replicated(mesh)
    lane = NamedSharding(mesh, P(None, ENV_AXIS))
    shard_carry = PackedCarry(
        words=lane, regs=lane, tmpl_words=lane, tmpl_regs=lane,
        rng=env_sharding(mesh),
    )
    return jax.jit(
        train_step,
        in_shardings=(rep, shard_carry, rep),
        out_shardings=(rep, shard_carry, rep),
    )
