"""Policy-in-kernel evaluation rollout (ops/policy_rollout.py).

Three contracts: (1) the kernel's transposed/permuted policy math agrees
with the flax `ActorCritic` forward to bf16 matmul-order tolerance;
(2) the Pallas kernel (interpret mode) and the XLA twin are step-for-step
identical under the same sampling seeds; (3) sampling is a valid
categorical draw (inverse-CDF, bounded actions, matches a host replay).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import minigrid_tpu
from minigrid_tpu.core.obs import gen_obs_image
from minigrid_tpu.models.policy import ActorCritic
from minigrid_tpu.ops.fused_rollout import (
    _agent_base,
    _obs_core,
    _roll_to_base,
    pack_states,
)
from minigrid_tpu.ops.policy_rollout import (
    build_policy_eval_rollout,
    eval_weights_from_params,
    policy_logits,
    policy_rollout_supported,
    sample_categorical,
)

B = 128


def _model_and_params(env, seed=0):
    model = ActorCritic(num_actions=env.num_actions)
    v = env.config.agent_view_size
    params = model.init(
        jax.random.PRNGKey(seed), jnp.zeros((1, v, v, 3), jnp.uint8)
    )
    return model, params


def _packed_view(env, states):
    cfg = env.config
    words, regs = pack_states(states)
    words = _roll_to_base(words, _agent_base(regs, cfg.width))
    return _obs_core(
        words, regs,
        width=cfg.width, height=cfg.height, view=cfg.agent_view_size,
        see_through_walls=cfg.see_through_walls,
    )


class TestPolicyLogits:
    @pytest.mark.parametrize(
        "env_id", ["MiniGrid-Empty-8x8-v0", "MiniGrid-DoorKey-5x5-v0"]
    )
    def test_matches_flax_forward(self, env_id):
        env = minigrid_tpu.make(env_id)
        cfg = env.config
        model, params = _model_and_params(env)
        states, _ = jax.jit(env.reset_batch, static_argnums=1)(
            jax.random.PRNGKey(1), 64
        )
        # Walk a few steps so doors/carrying vary.
        key = jax.random.PRNGKey(2)
        for _ in range(6):
            key, k = jax.random.split(key)
            a = jax.random.randint(k, (64,), 0, cfg.num_actions)
            states, *_ = jax.jit(env.step_batch)(states, a)

        vw, vis = _packed_view(env, states)
        w = eval_weights_from_params(params, cfg.agent_view_size)
        got = policy_logits(vw, vis, w, cfg.agent_view_size)  # (8, B)

        obs = jax.vmap(lambda s: gen_obs_image(s, cfg))(states)
        want, _ = model.apply(params, obs)  # (B, A)

        a = want.shape[1]
        np.testing.assert_allclose(
            np.asarray(got[:a].T), np.asarray(want), rtol=0.05, atol=0.05
        )
        # Pad logits can never win the sampling.
        assert float(jnp.max(got[a:])) < -1e8

    def test_sample_categorical_valid_and_replayable(self):
        logits = jnp.asarray(
            np.random.default_rng(0).normal(size=(8, 256)), jnp.float32
        ).at[7:].set(-1e9)
        seeds = jnp.asarray(
            np.random.default_rng(1).integers(-(2**31), 2**31, size=(1, 256)),
            jnp.int32,
        )
        a = sample_categorical(logits, seeds, 7)
        assert int(jnp.min(a)) >= 0 and int(jnp.max(a)) < 7
        # Deterministic in (logits, seed).
        np.testing.assert_array_equal(
            np.asarray(a), np.asarray(sample_categorical(logits, seeds, 7))
        )
        # Host replay of the inverse-CDF recipe.
        from minigrid_tpu.core.prng import hash_u31

        u31 = hash_u31(seeds, jnp.full_like(seeds, 0x243F6A88), 0)
        u01 = np.asarray(u31, np.float32) * 2.0 ** -31
        p = np.exp(np.asarray(logits[:7]) - np.asarray(logits[:7]).max(0))
        cum = np.cumsum(p, axis=0)
        want = (cum > u01 * p.sum(0)).argmax(0)
        np.testing.assert_array_equal(np.asarray(a)[0], want)


class TestPolicyEvalRollout:
    CASES = [
        ("MiniGrid-Empty-8x8-v0", "cached", 48),
        ("MiniGrid-Empty-5x5-v0", "regen", 128),  # truncation resets
        ("MiniGrid-DoorKey-5x5-v0", "cached", 48),
        ("MiniGrid-LavaGapS5-v0", "cached", 48),  # terminations
        ("MiniGrid-Fetch-5x5-N2-v0", "cached", 48),  # post-hook family
        # Pre-hook stochastic walk + Discrete(3) action space: exercises
        # the in-kernel Threefry obstacle stream AND the 8-row head
        # padding with num_actions=3.
        ("MiniGrid-Dynamic-Obstacles-5x5-v0", "cached", 48),
    ]

    @pytest.mark.parametrize("env_id,mode,steps", CASES)
    def test_kernel_matches_xla_twin(self, env_id, mode, steps):
        env = minigrid_tpu.make(env_id)
        assert policy_rollout_supported(env, mode)
        _, params = _model_and_params(env)
        key = jax.random.PRNGKey(3)
        key, k_reset = jax.random.split(key)
        states, _ = jax.jit(env.reset_batch, static_argnums=1)(k_reset, B)

        xla = jax.jit(
            build_policy_eval_rollout(
                env, params, steps, mode=mode, backend="xla"
            )
        )
        pal = jax.jit(
            build_policy_eval_rollout(
                env, params, steps, mode=mode, backend="pallas",
                interpret=True, step_chunk=16,
            )
        )
        sx, mx = xla(key, states)
        sp, mp = pal(key, states)
        assert int(mx.episodes) == int(mp.episodes)
        assert int(mx.obs_checksum) == int(mp.obs_checksum)
        assert int(mx.total_steps) == int(mp.total_steps) == B * steps
        np.testing.assert_allclose(
            float(mx.total_reward), float(mp.total_reward), rtol=1e-5,
            atol=1e-5,
        )
        for la, lb in zip(jax.tree.leaves(sx), jax.tree.leaves(sp)):
            np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))

    def test_resets_fire_under_policy(self):
        env = minigrid_tpu.make("MiniGrid-Empty-5x5-v0")
        _, params = _model_and_params(env)
        states, _ = jax.jit(env.reset_batch, static_argnums=1)(
            jax.random.PRNGKey(4), B
        )
        rollout = jax.jit(
            build_policy_eval_rollout(
                env, params, 128, mode="regen", backend="xla"
            )
        )
        _, m = rollout(jax.random.PRNGKey(5), states)
        assert int(m.episodes) >= B  # max_steps=100 forces truncations

    @pytest.mark.parametrize("env_id", [
        "MiniGrid-DoorKey-5x5-v0",
        "MiniGrid-LavaGapS5-v0",  # fast deaths: deferred resets fire
    ])
    def test_chunked_regen_backends_agree(self, env_id):
        """Random-layout regen policy eval: fresh layout per reset via the
        exact chunked refresh; kernel and XLA twin byte-identical even
        when the freeze/re-entry protocol defers resets."""
        env = minigrid_tpu.make(env_id)
        assert policy_rollout_supported(env, "regen")
        _, params = _model_and_params(env)
        key = jax.random.PRNGKey(13)
        key, k_reset = jax.random.split(key)
        states, _ = jax.jit(env.reset_batch, static_argnums=1)(k_reset, B)
        xla = jax.jit(
            build_policy_eval_rollout(
                env, params, 48, mode="regen", backend="xla", regen_chunk=8
            )
        )
        pal = jax.jit(
            build_policy_eval_rollout(
                env, params, 48, mode="regen", backend="pallas",
                interpret=True, regen_chunk=8,
            )
        )
        sx, mx = xla(key, states)
        sp, mp = pal(key, states)
        assert int(mx.episodes) == int(mp.episodes)
        assert int(mx.obs_checksum) == int(mp.obs_checksum)
        assert int(mx.reset_overlaps) == int(mp.reset_overlaps)
        for la, lb in zip(jax.tree.leaves(sx), jax.tree.leaves(sp)):
            np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))
        if env_id == "MiniGrid-LavaGapS5-v0":
            # Lava sits steps from spawn: episodes end fast and some lanes
            # defer resets — the protocol is genuinely exercised.
            assert int(mx.episodes) > 0
            assert int(mx.reset_overlaps) > 0

    def test_collect_supports_chunked_regen(self):
        # Random-layout regen + trajectory collection composes since the
        # pass-local-spill merge (ops/chunked_regen.py invariant I6);
        # exactness is asserted in TestCollectChunkedRegen below.
        env = minigrid_tpu.make("MiniGrid-DoorKey-5x5-v0")
        assert policy_rollout_supported(env, "regen", collect=True)


class TestCollectChunkedRegen:
    """Trajectory collection under random-layout regen: the kernel spills
    at pass-local rows; `ops.chunked_regen` merges them to each lane's
    commit cursor (invariant I6). Oracle: with `regen_chunk=1` a lane can
    never need a second in-chunk reset, so the freeze/re-entry protocol
    never fires — that run is protocol-free ground truth, and any other
    chunk length must reproduce it byte-for-byte."""

    def _carry(self, env, b=B, seed=21):
        from minigrid_tpu.ops.fused_rollout import packed_init

        states, _ = jax.jit(env.reset_batch, static_argnums=1)(
            jax.random.PRNGKey(seed), b
        )
        return jax.jit(lambda s: packed_init(env, s, "regen"))(states)

    # (env_id, resets_fire): fast-death families genuinely exercise the
    # freeze/re-entry protocol in 48 random-policy steps; DoorKey rarely
    # resolves that fast, so it only pins the no-reset path's exactness.
    CASES = [
        ("MiniGrid-DoorKey-5x5-v0", False),
        ("MiniGrid-LavaGapS5-v0", True),  # fast lava deaths
        # Stochastic pre-hook (in-kernel obstacle walk) + collisions:
        # replay determinism of a frozen lane's discarded step must hold
        # through the pre-step randomness too (invariant I4).
        ("MiniGrid-Dynamic-Obstacles-5x5-v0", True),
    ]

    @pytest.mark.parametrize("env_id,resets_fire", CASES)
    def test_traj_exact_any_chunk(self, env_id, resets_fire):
        from minigrid_tpu.ops.policy_rollout import build_fused_train_rollout

        env = minigrid_tpu.make(env_id)
        _, params = _model_and_params(env)
        key = jax.random.PRNGKey(22)
        carry = self._carry(env)
        steps = 48

        outs = {}
        for rc in (1, 8, 48):
            roll = jax.jit(
                build_fused_train_rollout(
                    env, steps, mode="regen", backend="xla", regen_chunk=rc
                )
            )
            outs[rc] = roll(params, key, carry)

        c1, t1, m1 = outs[1]
        assert int(m1.reset_overlaps) == 0  # chunk=1 cannot defer
        if resets_fire:
            assert int(m1.episodes) > 0
        for rc in (8, 48):
            c2, t2, m2 = outs[rc]
            assert int(m2.episodes) == int(m1.episodes)
            assert int(m2.obs_checksum) == int(m1.obs_checksum)
            for a, b_ in zip(
                jax.tree.leaves((c1, t1)), jax.tree.leaves((c2, t2))
            ):
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))
        if resets_fire:
            # The protocol must genuinely fire for the equality above to
            # mean anything.
            assert int(outs[48][2].reset_overlaps) > 0

    def test_kernel_matches_xla_twin(self):
        from minigrid_tpu.ops.policy_rollout import build_fused_train_rollout

        env = minigrid_tpu.make("MiniGrid-LavaGapS5-v0")
        _, params = _model_and_params(env)
        key = jax.random.PRNGKey(23)
        carry = self._carry(env)
        xla = jax.jit(
            build_fused_train_rollout(
                env, 32, mode="regen", backend="xla", regen_chunk=8
            )
        )
        pal = jax.jit(
            build_fused_train_rollout(
                env, 32, mode="regen", backend="pallas", interpret=True,
                regen_chunk=8,
            )
        )
        cx, tx, mx = xla(params, key, carry)
        cp, tp, mp = pal(params, key, carry)
        assert int(mx.episodes) == int(mp.episodes)
        assert int(mx.reset_overlaps) == int(mp.reset_overlaps)
        for a, b_ in zip(jax.tree.leaves((cx, tx)), jax.tree.leaves((cp, tp))):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))

    def test_fused_train_step_random_layout_regen(self):
        """The flagship train step runs end-to-end with reference regen
        semantics (fresh layout per reset) on a random-layout family."""
        from minigrid_tpu.ops.fused_rollout import packed_init
        from minigrid_tpu.parallel.sharding import make_env_mesh
        from minigrid_tpu.parallel.train import (
            build_fused_train_step,
            init_train_state,
        )

        env = minigrid_tpu.make("MiniGrid-DoorKey-5x5-v0")
        mesh = make_env_mesh()
        ts = init_train_state(jax.random.PRNGKey(0), env, mesh)
        carry = self._carry(env)
        step = build_fused_train_step(
            env, mesh, num_steps=16, mode="regen", backend="xla"
        )
        p0 = jax.tree.leaves(ts.params)[0]
        ts2, carry2, metrics = step(ts, carry, jax.random.PRNGKey(1))
        assert np.isfinite(float(metrics["loss"]))
        assert int(metrics["env_steps"]) == B * 16
        assert not np.array_equal(
            np.asarray(p0), np.asarray(jax.tree.leaves(ts2.params)[0])
        )
        _, _, m2 = step(ts2, carry2, jax.random.PRNGKey(2))
        assert np.isfinite(float(m2["loss"]))


class TestFusedTrainRollout:
    """Trajectory-collecting policy-in-kernel rollout + the fused train
    step (ops/policy_rollout.build_fused_train_rollout,
    parallel/train.build_fused_train_step)."""

    def _carry(self, env, b=B, seed=6, mode="cached"):
        from minigrid_tpu.ops.fused_rollout import packed_init

        states, _ = jax.jit(env.reset_batch, static_argnums=1)(
            jax.random.PRNGKey(seed), b
        )
        return states, jax.jit(lambda s: packed_init(env, s, mode))(states)

    @pytest.mark.parametrize(
        "env_id,mode",
        [
            ("MiniGrid-Empty-5x5-v0", "regen"),  # truncation resets
            ("MiniGrid-LavaGapS5-v0", "cached"),  # terminations
        ],
    )
    def test_kernel_traj_matches_xla_twin(self, env_id, mode):
        from minigrid_tpu.ops.policy_rollout import build_fused_train_rollout

        env = minigrid_tpu.make(env_id)
        _, params = _model_and_params(env)
        steps = 48
        _, carry = self._carry(env, mode=mode)
        key = jax.random.PRNGKey(7)
        xla = jax.jit(
            build_fused_train_rollout(env, steps, mode=mode, backend="xla")
        )
        pal = jax.jit(
            build_fused_train_rollout(
                env, steps, mode=mode, backend="pallas", interpret=True,
                step_chunk=16,
            )
        )
        cx, tx, mx = xla(params, key, carry)
        cp, tp, mp = pal(params, key, carry)
        assert int(mx.episodes) == int(mp.episodes) > 0
        assert int(mx.obs_checksum) == int(mp.obs_checksum)
        for a, b_ in zip(jax.tree.leaves((cx, tx)), jax.tree.leaves((cp, tp))):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))

    def test_traj_contents_match_model_and_obs(self):
        """Spilled obs images equal the vmap encoder on the initial states;
        spilled value/logp agree with the flax forward on those obs."""
        from minigrid_tpu.core.obs import gen_obs_image
        from minigrid_tpu.ops.policy_rollout import build_fused_train_rollout

        env = minigrid_tpu.make("MiniGrid-DoorKey-5x5-v0")
        cfg = env.config
        model, params = _model_and_params(env)
        states, carry = self._carry(env)
        rollout = jax.jit(
            build_fused_train_rollout(env, 8, mode="cached", backend="xla")
        )
        _, traj, _ = rollout(params, jax.random.PRNGKey(8), carry)
        obs, actions, logp, value, reward, done = traj
        want0 = jax.vmap(lambda s: gen_obs_image(s, cfg))(states)
        np.testing.assert_array_equal(np.asarray(obs[0]), np.asarray(want0))
        logits, val = model.apply(params, obs[0])
        np.testing.assert_allclose(
            np.asarray(value[0]), np.asarray(val), rtol=0.05, atol=0.05
        )
        lp = jax.nn.log_softmax(logits)[
            jnp.arange(B), np.asarray(actions[0])
        ]
        np.testing.assert_allclose(
            np.asarray(logp[0]), np.asarray(lp), rtol=0.05, atol=0.05
        )
        assert actions.dtype == jnp.int32 and done.dtype == bool

    def test_fused_train_step_learns_shape(self):
        """The fused train step runs end to end: finite loss, params move,
        carry advances, env_steps metric correct."""
        from minigrid_tpu.parallel.sharding import make_env_mesh
        from minigrid_tpu.parallel.train import (
            build_fused_train_step,
            init_train_state,
        )

        env = minigrid_tpu.make("MiniGrid-Empty-5x5-v0")
        mesh = make_env_mesh()
        ts = init_train_state(jax.random.PRNGKey(0), env, mesh)
        _, carry = self._carry(env, mode="regen")
        step = build_fused_train_step(
            env, mesh, num_steps=16, mode="regen", backend="xla"
        )
        p0 = jax.tree.leaves(ts.params)[0]
        ts2, carry2, metrics = step(ts, carry, jax.random.PRNGKey(1))
        assert np.isfinite(float(metrics["loss"]))
        assert int(metrics["env_steps"]) == B * 16
        assert not np.array_equal(
            np.asarray(p0), np.asarray(jax.tree.leaves(ts2.params)[0])
        )
        # Steady chaining: a second call consumes the advanced carry.
        _, _, m2 = step(ts2, carry2, jax.random.PRNGKey(2))
        assert np.isfinite(float(m2["loss"]))

    def test_grad_backend_kernel_matches_xla(self):
        """The fused fwd+bwd Pallas gradient pass (`grad_backend=
        "kernel"`, interpret mode here) produces the same flax grads and
        loss metrics as the XLA packed pass on an identical collected
        trajectory — the production wiring of TestGradKernel, through
        `parallel.train`'s grad-pass dispatch."""
        from minigrid_tpu.ops.fused_rollout import packed_init
        from minigrid_tpu.parallel import train as T
        from minigrid_tpu.parallel.sharding import make_env_mesh
        from minigrid_tpu.ops.policy_rollout import build_fused_train_rollout

        env = minigrid_tpu.make("MiniGrid-Empty-5x5-v0")
        ts = T.init_train_state(jax.random.PRNGKey(0), env, make_env_mesh())
        states, _ = jax.jit(env.reset_batch, static_argnums=1)(
            jax.random.PRNGKey(3), B
        )
        carry = jax.jit(lambda s: packed_init(env, s, "cached"))(states)
        roll = jax.jit(build_fused_train_rollout(
            env, 8, mode="cached", backend="xla", raw_obs=True
        ))
        _, traj, _ = roll(ts.params, jax.random.PRNGKey(4), carry)
        v = env.config.agent_view_size
        g_x, m_x = jax.jit(lambda p, tr: T._trajectory_grads_packed(
            p, tr, v, env.num_actions, 0.99, 0.5, 0.01
        ))(ts.params, traj)
        g_k, m_k = jax.jit(lambda p, tr: T._trajectory_grads_kernel(
            p, tr, v, env.num_actions, 0.99, 0.5, 0.01, interpret=True
        ))(ts.params, traj)
        for name in ("loss", "pg_loss", "v_loss", "entropy",
                     "reward_per_step", "episodes"):
            np.testing.assert_allclose(
                float(m_x[name]), float(m_k[name]), rtol=2e-3, atol=1e-5
            )
        flat_x = jax.tree_util.tree_flatten_with_path(g_x)[0]
        flat_k = jax.tree_util.tree_flatten_with_path(g_k)[0]
        for (kp, a), (_, b_) in zip(flat_x, flat_k):
            a = np.asarray(a, np.float32)
            b_ = np.asarray(b_, np.float32)
            rel = np.abs(a - b_).max() / (np.abs(a).max() + 1e-9)
            tol = 1e-3 if "actor" in str(kp) or "critic" in str(kp) else 0.05
            assert rel < tol, (jax.tree_util.keystr(kp), rel)

    def test_fused_train_step_kernel_grad_backend_runs(self):
        """End-to-end fused train step with the Pallas gradient kernel
        selected (interpret mode off-TPU): finite loss, params move."""
        from minigrid_tpu.parallel.sharding import make_env_mesh
        from minigrid_tpu.parallel.train import (
            build_fused_train_step,
            init_train_state,
        )

        env = minigrid_tpu.make("MiniGrid-Empty-5x5-v0")
        mesh = make_env_mesh()
        ts = init_train_state(jax.random.PRNGKey(0), env, mesh)
        _, carry = self._carry(env, mode="cached")
        step = build_fused_train_step(
            env, mesh, num_steps=8, mode="cached", backend="xla",
            grad_backend="kernel",
        )
        p0 = jax.tree.leaves(ts.params)[0]
        ts2, _, metrics = step(ts, carry, jax.random.PRNGKey(1))
        assert np.isfinite(float(metrics["loss"]))
        assert not np.array_equal(
            np.asarray(p0), np.asarray(jax.tree.leaves(ts2.params)[0])
        )


class TestShardedPolicyEval:
    def test_sharded_matches_per_shard_replay(self):
        """8-device mesh: each shard must equal the single-chip policy
        rollout replayed under its folded key (the build_sharded_rollout
        determinism contract, extended to the policy surface)."""
        from minigrid_tpu.parallel.packed import build_sharded_policy_eval
        from minigrid_tpu.parallel.sharding import make_env_mesh, shard_states

        env = minigrid_tpu.make("MiniGrid-Empty-8x8-v0")
        _, params = _model_and_params(env)
        mesh = make_env_mesh()
        n = mesh.devices.size
        b = 128 * n
        key = jax.random.PRNGKey(9)
        key, k_reset = jax.random.split(key)
        states, _ = jax.jit(env.reset_batch, static_argnums=1)(k_reset, b)
        states = shard_states(states, mesh)

        rollout = build_sharded_policy_eval(
            env, params, 32, mesh, mode="cached", backend="xla"
        )
        final, m = rollout(key, states)
        assert int(m.total_steps) == b * 32

        # Replay shard 0 through the single-chip builder.
        single = jax.jit(
            build_policy_eval_rollout(
                env, params, 32, mode="cached", backend="xla"
            )
        )
        shard0 = jax.tree.map(lambda x: x[: b // n], states)
        k0 = jax.random.fold_in(key, 0)
        s0, m0 = single(k0, shard0)
        np.testing.assert_array_equal(
            np.asarray(final.grid[: b // n]), np.asarray(s0.grid)
        )
        np.testing.assert_array_equal(
            np.asarray(final.agent_pos[: b // n]), np.asarray(s0.agent_pos)
        )


class TestPackedGradPass:
    """The packed-layout gradient pass (parallel/train.py
    _trajectory_grads_packed) consumes spilled obs words directly and
    differentiates through the kernel's weight layout; it must agree with
    the flax-layout pass on the same trajectory to float tolerance (bf16
    matmul order differs), with the f32 heads agreeing tightly."""

    def test_grads_match_flax_pass(self):
        from minigrid_tpu.ops.fused_rollout import packed_init
        from minigrid_tpu.ops.policy_rollout import (
            build_fused_train_rollout,
            obs_words_to_images,
        )
        from minigrid_tpu.parallel import train as T
        from minigrid_tpu.parallel.sharding import make_env_mesh

        env = minigrid_tpu.make("MiniGrid-Empty-5x5-v0")
        mesh = make_env_mesh()
        ts = T.init_train_state(jax.random.PRNGKey(0), env, mesh)
        states, _ = jax.jit(env.reset_batch, static_argnums=1)(
            jax.random.PRNGKey(1), B
        )
        carry = jax.jit(lambda s: packed_init(env, s, "regen"))(states)
        roll = jax.jit(
            build_fused_train_rollout(
                env, 16, mode="regen", backend="xla", raw_obs=True
            )
        )
        _, traj_w, _ = roll(ts.params, jax.random.PRNGKey(2), carry)
        v = env.config.agent_view_size
        traj_img = (obs_words_to_images(traj_w[0], v),) + traj_w[1:]
        model = T.make_model(env)
        g1, m1 = jax.jit(
            lambda p: T._trajectory_grads(
                model, p, traj_img, 0.99, 0.5, 0.01, 4
            )
        )(ts.params)
        g2, m2 = jax.jit(
            lambda p: T._trajectory_grads_packed(
                p, traj_w, v, env.num_actions, 0.99, 0.5, 0.01, 4
            )
        )(ts.params)
        np.testing.assert_allclose(
            float(m1["loss"]), float(m2["loss"]), rtol=1e-4
        )
        p1, p2 = g1["params"], g2["params"]
        for head in ("actor", "critic"):  # f32 paths: tight
            for leaf in ("kernel", "bias"):
                np.testing.assert_allclose(
                    np.asarray(p1[head][leaf]), np.asarray(p2[head][leaf]),
                    rtol=1e-4, atol=1e-6,
                )
        for torso in ("torso_0", "torso_1"):  # bf16 paths: loose
            for leaf in ("kernel", "bias"):
                a_, b_ = np.asarray(p1[torso][leaf]), np.asarray(p2[torso][leaf])
                scale = np.abs(a_).max() + 1e-9
                assert np.abs(a_ - b_).max() / scale < 0.05, (torso, leaf)


class TestGradKernel:
    """ops/grad_kernel.py (experimental fused fwd+bwd Pallas gradient
    kernel, interpret mode): hand-derived cotangents must match autodiff
    of the identical loss — f32 head grads tightly, bf16 torso grads to
    rounding tolerance, loss-term sums near-exactly."""

    def test_matches_autodiff(self):
        from minigrid_tpu.ops.fused_rollout import packed_init
        from minigrid_tpu.ops.grad_kernel import build_grad_kernel
        from minigrid_tpu.ops.policy_rollout import (
            build_fused_train_rollout,
            policy_logits,
            train_weights_from_params,
        )
        from minigrid_tpu.parallel import train as T
        from minigrid_tpu.parallel.sharding import make_env_mesh

        env = minigrid_tpu.make("MiniGrid-Empty-5x5-v0")
        ts = T.init_train_state(
            jax.random.PRNGKey(0), env, make_env_mesh()
        )
        Bk, Tk = 128, 8
        states, _ = jax.jit(env.reset_batch, static_argnums=1)(
            jax.random.PRNGKey(1), Bk
        )
        carry = jax.jit(lambda s: packed_init(env, s, "regen"))(states)
        roll = jax.jit(
            build_fused_train_rollout(
                env, Tk, mode="regen", backend="xla", raw_obs=True
            )
        )
        _, traj, _ = roll(ts.params, jax.random.PRNGKey(2), carry)
        obs_w, actions, _, value, reward, done = traj
        v = env.config.agent_view_size
        returns = T._trajectory_returns(reward, done, 0.99)
        adv = returns - value
        denom = float(Tk * Bk)
        w = train_weights_from_params(ts.params, v)

        def loss_w(w):
            tot = 0.0
            for s in range(Tk):
                head = policy_logits(
                    obs_w[s], jnp.ones_like(obs_w[s]), w, v
                )
                logits = head[: env.num_actions]
                logp_all = jax.nn.log_softmax(logits, axis=0)
                lp = jnp.take_along_axis(
                    logp_all, actions[s][None], axis=0
                )[0]
                ent = -jnp.sum(jnp.exp(logp_all) * logp_all, axis=0)
                tot = tot + (
                    -jnp.sum(lp * adv[s])
                    + 0.5 * jnp.sum((head[7] - returns[s]) ** 2)
                    - 0.01 * jnp.sum(ent)
                ) / denom
            return tot

        gw_ref = jax.jit(jax.grad(loss_w))(w)
        gk = build_grad_kernel(
            v, env.num_actions, Tk, Bk, denom, 0.5, 0.01, tc=4, bt=128,
            interpret=True,
        )
        gw_k, sums = jax.jit(gk)(w, obs_w, actions, adv, returns)
        for name, a, b in zip(gw_ref._fields, gw_ref, gw_k):
            a = np.asarray(a, np.float32)
            b = np.asarray(b, np.float32)
            rel = np.abs(a - b).max() / (np.abs(a).max() + 1e-9)
            tol = 1e-4 if name in ("wta", "ba") else 0.05
            assert rel < tol, (name, rel)
        assert np.all(np.isfinite(np.asarray(sums)))
