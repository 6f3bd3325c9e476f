"""Heterogeneous mixed-batch tests (BASELINE config #5 shape)."""

import jax
import jax.numpy as jnp
import numpy as np

from minigrid_tpu.core import constants as C
from minigrid_tpu.parallel.mixed import FAMILY_SLOT, MixedEnv
from minigrid_tpu.parallel.sharding import make_env_mesh, shard_states


def make_mixed():
    return MixedEnv.create(
        ["MiniGrid-LavaCrossingS9N1-v0", "MiniGrid-FourRooms-v0"]
    )


class TestMixed:
    def test_padded_dims_and_reset(self):
        menv = make_mixed()
        assert (menv.height, menv.width) == (19, 19)
        state, obs = menv.reset(jax.random.PRNGKey(0), jnp.int32(0))
        g = np.asarray(state.grid)
        assert g.shape == (19, 19, 5)
        # Crossing member: real 9×9 grid top-left, wall padding elsewhere.
        assert (g[10:, :, 0] == C.WALL).all()
        assert (g[:9, :9, 0] != C.WALL).any()
        assert int(state.aux[FAMILY_SLOT]) == 0
        assert obs["image"].shape == (7, 7, 3)

    def test_members_match_homogeneous(self):
        """Stepping a member inside the mixed program matches the plain env."""
        import minigrid_tpu

        menv = make_mixed()
        plain = minigrid_tpu.make("MiniGrid-LavaCrossingS9N1-v0")
        key = jax.random.PRNGKey(3)
        ms, mo = menv.reset(key, jnp.int32(0))
        ps, po = plain.reset(key)
        np.testing.assert_array_equal(
            np.asarray(ms.grid)[:9, :9], np.asarray(ps.grid)
        )
        np.testing.assert_array_equal(np.asarray(mo["image"]), np.asarray(po["image"]))
        for a in [2, 1, 2, 2, 0, 2]:
            ms, mo, mr, mt, mtr = menv.step(ms, jnp.int32(a))
            ps, po, pr, pt, ptr = plain.step(ps, jnp.int32(a))
            np.testing.assert_array_equal(
                np.asarray(mo["image"]), np.asarray(po["image"])
            )
            assert float(mr) == float(pr) and bool(mt) == bool(pt)

    def test_batched_mixed_sharded_rollout(self):
        menv = make_mixed()
        B = 16
        member_ids = jnp.asarray([i % 2 for i in range(B)], jnp.int32)
        states, obs = jax.jit(menv.reset_batch)(jax.random.PRNGKey(0), member_ids)
        assert obs["image"].shape == (B, 7, 7, 3)

        mesh = make_env_mesh()
        states = shard_states(states, mesh)
        step = jax.jit(jax.vmap(menv.autoreset_step()))
        rng = np.random.default_rng(0)
        for _ in range(12):
            actions = jnp.asarray(rng.integers(0, 7, B), jnp.int32)
            states, obs, r, te, tr = step(states, actions)
        # Family ids preserved through stepping and auto-reset.
        np.testing.assert_array_equal(
            np.asarray(states.aux[:, FAMILY_SLOT]), np.asarray(member_ids)
        )


class TestMixedRollouts:
    """BASELINE config #5 engines: the lax.switch vmap rollout and the
    per-family packed lane blocks, both sharded over the 8-device mesh."""

    IDS = ["MiniGrid-LavaCrossingS9N1-v0", "MiniGrid-FourRooms-v0"]

    def test_vmap_mixed_sharded_rollout_metrics(self):
        from minigrid_tpu.parallel.mixed import build_mixed_rollout

        menv = make_mixed()
        mesh = make_env_mesh()
        B = 16
        member_ids = jnp.asarray([i % 2 for i in range(B)], jnp.int32)
        states, _ = jax.jit(menv.reset_batch)(jax.random.PRNGKey(0), member_ids)
        states = shard_states(states, mesh)
        rollout = build_mixed_rollout(menv, 12, mesh)
        states, m = rollout(jax.random.PRNGKey(1), states)
        assert int(m.total_steps) == B * 12
        assert int(m.obs_checksum) > 0
        # Family ids preserved through stepping and auto-reset.
        np.testing.assert_array_equal(
            np.asarray(states.aux[:, FAMILY_SLOT]), np.asarray(member_ids)
        )

    def test_packed_mixed_blocks_match_per_family_rollouts(self):
        import minigrid_tpu
        from minigrid_tpu.ops.fused_rollout import build_packed_xla_rollout
        from minigrid_tpu.parallel.mixed import build_packed_mixed_rollout

        B = 128
        key = jax.random.PRNGKey(2)
        envs = [minigrid_tpu.make(e) for e in self.IDS]
        states = tuple(
            jax.jit(e.reset_batch, static_argnums=1)(
                jax.random.fold_in(key, 10 + i), B
            )[0]
            for i, e in enumerate(envs)
        )
        mixed = build_packed_mixed_rollout(
            self.IDS, 16, mode="cached", backend="packed"
        )
        finals, m = mixed(key, states)
        # The mixed program must equal running each family's own packed
        # rollout under the same folded keys.
        tot_epi = tot_csum = 0
        for i, e in enumerate(envs):
            ro = jax.jit(build_packed_xla_rollout(e, 16, mode="cached"))
            f, mi = ro(jax.random.fold_in(key, i), states[i])
            tot_epi += int(mi.episodes)
            tot_csum += int(mi.obs_checksum)
            np.testing.assert_array_equal(
                np.asarray(finals[i].grid), np.asarray(f.grid)
            )
        assert int(m.episodes) == tot_epi
        assert int(m.obs_checksum) == tot_csum
        assert int(m.total_steps) == 2 * B * 16

    def test_packed_mixed_sharded_over_mesh(self):
        import minigrid_tpu
        from minigrid_tpu.parallel.mixed import build_packed_mixed_rollout

        mesh = make_env_mesh()
        B = 128 * mesh.devices.size
        key = jax.random.PRNGKey(3)
        states = tuple(
            shard_states(
                jax.jit(minigrid_tpu.make(e).reset_batch, static_argnums=1)(
                    jax.random.fold_in(key, i), B
                )[0],
                mesh,
            )
            for i, e in enumerate(self.IDS)
        )
        mixed = build_packed_mixed_rollout(
            self.IDS, 8, mesh=mesh, mode="cached", backend="packed"
        )
        _, m = mixed(key, states)
        assert int(m.total_steps) == 2 * B * 8


class TestMixedRegen:
    """Regen-mode mixed batches (VERDICT r4 #6): each member block runs
    its own chunked template refresh; the mixed program must byte-match
    per-family vmap regen rollouts under the same folded keys, and the
    policy-eval mixed variant must match its per-family inners."""

    IDS = ["MiniGrid-LavaCrossingS9N1-v0", "MiniGrid-FourRooms-v0"]

    def test_packed_mixed_regen_matches_per_family_vmap(self):
        import minigrid_tpu
        from minigrid_tpu.core.rollout import build_rollout
        from minigrid_tpu.parallel.mixed import build_packed_mixed_rollout

        B = 128
        steps = 48
        key = jax.random.PRNGKey(5)
        envs = [minigrid_tpu.make(e) for e in self.IDS]
        states = tuple(
            jax.jit(e.reset_batch, static_argnums=1)(
                jax.random.fold_in(key, 10 + i), B
            )[0]
            for i, e in enumerate(envs)
        )
        mixed = build_packed_mixed_rollout(
            self.IDS, steps, mode="regen", backend="packed"
        )
        finals, m = mixed(key, states)

        tot_epi = tot_csum = 0
        tot_rew = 0.0
        for i, e in enumerate(envs):
            ro = jax.jit(build_rollout(e, steps, autoreset_mode="regen"))
            f, mi = ro(jax.random.fold_in(key, i), states[i])
            tot_epi += int(mi.episodes)
            tot_csum += int(mi.obs_checksum)
            tot_rew += float(mi.total_reward)
            for la, lb in zip(jax.tree.leaves(finals[i]), jax.tree.leaves(f)):
                np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))
            assert int(mi.episodes) > 0, e.env_id  # resets genuinely fire
        assert int(m.episodes) == tot_epi
        assert int(m.obs_checksum) == tot_csum
        np.testing.assert_allclose(
            float(m.total_reward), tot_rew, rtol=1e-5, atol=1e-5
        )
        assert int(m.total_steps) == 2 * B * steps

    def test_packed_mixed_regen_sharded_over_mesh(self):
        import minigrid_tpu
        from minigrid_tpu.parallel.mixed import build_packed_mixed_rollout

        mesh = make_env_mesh()
        B = 128 * mesh.devices.size
        key = jax.random.PRNGKey(6)
        states = tuple(
            shard_states(
                jax.jit(minigrid_tpu.make(e).reset_batch, static_argnums=1)(
                    jax.random.fold_in(key, i), B
                )[0],
                mesh,
            )
            for i, e in enumerate(self.IDS)
        )
        mixed = build_packed_mixed_rollout(
            self.IDS, 16, mesh=mesh, mode="regen", backend="packed"
        )
        _, m = mixed(key, states)
        assert int(m.total_steps) == 2 * B * 16
        assert int(m.episodes) > 0

    def test_mixed_policy_eval_matches_per_family(self):
        import minigrid_tpu
        from minigrid_tpu.models.policy import ActorCritic
        from minigrid_tpu.ops.fused_rollout import packed_init
        from minigrid_tpu.ops.policy_rollout import build_policy_eval_rollout
        from minigrid_tpu.parallel.mixed import build_mixed_policy_eval

        B = 128
        steps = 16
        key = jax.random.PRNGKey(7)
        envs = [minigrid_tpu.make(e) for e in self.IDS]
        params = []
        for i, e in enumerate(envs):
            model = ActorCritic(num_actions=e.num_actions)
            v = e.config.agent_view_size
            params.append(
                model.init(
                    jax.random.PRNGKey(40 + i),
                    jnp.zeros((1, v, v, 3), jnp.uint8),
                )
            )
        carries = tuple(
            jax.jit(lambda s, e=e: packed_init(e, s, "regen"))(
                jax.jit(e.reset_batch, static_argnums=1)(
                    jax.random.fold_in(key, 10 + i), B
                )[0]
            )
            for i, e in enumerate(envs)
        )
        step = build_mixed_policy_eval(
            self.IDS, params, steps, mode="regen", backend="xla"
        )
        finals, m = step(key, carries)

        tot_epi = tot_csum = 0
        for i, e in enumerate(envs):
            inner = jax.jit(
                build_policy_eval_rollout(
                    e, params[i], steps, mode="regen", backend="xla",
                    as_carry=True,
                )
            )
            c, mi = inner(jax.random.fold_in(key, i), carries[i])
            tot_epi += int(mi.episodes)
            tot_csum += int(mi.obs_checksum)
            for la, lb in zip(jax.tree.leaves(finals[i]), jax.tree.leaves(c)):
                np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))
        assert int(m.episodes) == tot_epi
        assert int(m.obs_checksum) == tot_csum
        assert int(m.total_steps) == 2 * B * steps
