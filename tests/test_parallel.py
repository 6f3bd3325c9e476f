"""Sharded execution tests on the virtual 8-device CPU mesh."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

import minigrid_tpu
from minigrid_tpu.parallel.sharding import (
    ENV_AXIS,
    env_sharding,
    make_env_mesh,
    shard_states,
)


@functools.lru_cache(maxsize=None)
def env8():
    return minigrid_tpu.make("MiniGrid-Empty-8x8-v0")


class TestMesh:
    def test_mesh_shapes(self):
        assert jax.device_count() == 8, "conftest should provide 8 CPU devices"
        mesh = make_env_mesh()
        assert mesh.devices.shape == (8, 1)
        mesh = make_env_mesh(model_parallel=2)
        assert mesh.devices.shape == (4, 2)

    def test_sharded_rollout_matches_single_device(self):
        from minigrid_tpu.core.rollout import build_rollout

        env = env8()
        mesh = make_env_mesh()
        B = 16
        rollout = jax.jit(build_rollout(env, num_steps=32))
        states, _ = jax.jit(env.reset_batch, static_argnums=1)(
            jax.random.PRNGKey(0), B
        )

        # Single-device run.
        s1, m1 = rollout(jax.random.PRNGKey(1), states)

        # Sharded run: same program, batch split over the env axis.
        sharded = shard_states(states, mesh)
        s2, m2 = rollout(jax.random.PRNGKey(1), sharded)

        assert int(m1.episodes) == int(m2.episodes)
        assert float(m1.total_reward) == pytest.approx(float(m2.total_reward), rel=1e-5)
        np.testing.assert_array_equal(
            np.asarray(s1.step_count), np.asarray(s2.step_count)
        )
        np.testing.assert_array_equal(np.asarray(s1.grid), np.asarray(s2.grid))

    def test_train_step_runs_sharded(self):
        from minigrid_tpu.parallel.train import build_train_step, init_train_state

        env = env8()
        mesh = make_env_mesh()
        key = jax.random.PRNGKey(0)
        ts = init_train_state(key, env, mesh)
        states, _ = jax.jit(env.reset_batch, static_argnums=1)(key, 16)
        states = shard_states(states, mesh)
        train_step = build_train_step(env, mesh, num_steps=4)
        ts2, states2, metrics = train_step(ts, states, key)
        assert np.isfinite(float(metrics["loss"]))
        # Params changed (an update actually happened).
        p0 = jax.tree.leaves(ts.params)[0]
        p1 = jax.tree.leaves(ts2.params)[0]
        assert not np.allclose(np.asarray(p0), np.asarray(p1))

    def test_global_batch_helper(self):
        from minigrid_tpu.parallel.distributed import make_global_batch, process_info

        env = env8()
        mesh = make_env_mesh()
        states, keys = make_global_batch(env, jax.random.PRNGKey(0), 16, mesh)
        # Batch is addressable and matches unsharded generation.
        ref, _ = jax.vmap(env.reset)(keys)
        np.testing.assert_array_equal(np.asarray(states.grid), np.asarray(ref.grid))
        info = process_info()
        assert info["global_device_count"] == 8


class TestShardedPackedRollout:
    """parallel/packed.py: the packed-lane engines under shard_map."""

    def _setup(self, env_id, batch, seed=0):
        env = minigrid_tpu.make(env_id)
        mesh = make_env_mesh()
        key = jax.random.PRNGKey(seed)
        key, kr = jax.random.split(key)
        states, _ = jax.jit(env.reset_batch, static_argnums=1)(kr, batch)
        return env, mesh, key, shard_states(states, mesh)

    def test_matches_per_shard_replay(self):
        """Each shard runs the unmodified single-chip program under
        fold_in(key, shard_index): replaying those keys shard-by-shard
        through the single-chip builder must reproduce the sharded run
        exactly (states bit-for-bit, integer metrics equal)."""
        from minigrid_tpu.ops.fused_rollout import build_packed_xla_rollout
        from minigrid_tpu.parallel.packed import build_sharded_rollout

        B, T, n = 8 * 256, 16, 8
        env, mesh, key, states = self._setup("MiniGrid-Empty-8x8-v0", B)
        final, m = build_sharded_rollout(env, T, mesh, backend="packed")(
            key, states
        )

        inner = jax.jit(build_packed_xla_rollout(env, T))
        bs = B // n
        eps = steps = csum = 0
        rew = 0.0
        finals = []
        for i in range(n):
            sub = jax.tree.map(lambda x: x[i * bs : (i + 1) * bs], states)
            f, mi = inner(jax.random.fold_in(key, i), sub)
            eps += int(mi.episodes)
            rew += float(mi.total_reward)
            steps += int(mi.total_steps)
            csum += int(mi.obs_checksum)
            finals.append(f)

        assert int(m.episodes) == eps
        assert int(m.total_steps) == steps
        assert int(m.obs_checksum) == csum
        np.testing.assert_allclose(float(m.total_reward), rew, rtol=1e-5, atol=1e-6)
        cat = jax.tree.map(lambda *xs: jnp.concatenate(xs), *finals)
        for a, b in zip(jax.tree.leaves(final), jax.tree.leaves(cat)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_pallas_backend_matches_packed(self):
        from minigrid_tpu.parallel.packed import build_sharded_rollout

        B, T = 8 * 128, 8
        env, mesh, key, states = self._setup("MiniGrid-Empty-8x8-v0", B, seed=1)
        mp = build_sharded_rollout(env, T, mesh, backend="packed")(key, states)[1]
        fp = build_sharded_rollout(env, T, mesh, backend="pallas")(key, states)[1]
        assert int(mp.obs_checksum) == int(fp.obs_checksum)
        assert int(mp.episodes) == int(fp.episodes)

    @pytest.mark.parametrize(
        "env_id,mode",
        [
            ("MiniGrid-Empty-8x8-v0", "regen"),
            ("MiniGrid-DoorKey-5x5-v0", "cached"),
            ("MiniGrid-DoorKey-5x5-v0", "regen"),  # chunked (no template)
        ],
    )
    def test_carry_surface_matches_chained_legacy(self, env_id, mode):
        """The sharded steady-state carry surface must equal chaining the
        sharded legacy surface (same per-shard fold_in keys)."""
        from minigrid_tpu.ops.fused_rollout import packed_finish, packed_init
        from minigrid_tpu.parallel.packed import build_sharded_rollout

        B, T = 8 * 128, 8
        env, mesh, key, states = self._setup(env_id, B, seed=2)
        legacy = build_sharded_rollout(env, T, mesh, mode=mode, backend="packed")
        step = build_sharded_rollout(
            env, T, mesh, mode=mode, backend="packed", as_carry=True
        )

        keys = jax.random.split(key, 2)
        st = states
        for k in keys:
            st, ml = legacy(k, st)

        carry = jax.jit(lambda s: packed_init(env, s, mode))(states)
        for k in keys:
            carry, mc = step(k, carry)
        sf = jax.jit(lambda c: packed_finish(env, c))(carry)

        assert int(mc.episodes) == int(ml.episodes)
        assert int(mc.obs_checksum) == int(ml.obs_checksum)
        for a, b in zip(jax.tree.leaves(st), jax.tree.leaves(sf)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_auto_falls_back_to_vmap_engine(self):
        """Families the packed layout doesn't support (custom step
        overrides) still shard: backend='auto' routes to the vmap engine."""
        from minigrid_tpu.parallel.packed import build_sharded_rollout

        B, T = 8 * 16, 8
        env, mesh, key, states = self._setup(
            "MiniGrid-Dynamic-Obstacles-5x5-v0", B
        )
        _, m = build_sharded_rollout(env, T, mesh, backend="auto")(key, states)
        assert int(m.total_steps) == B * T


class TestPackedTrainStep:
    """parallel/train.py build_packed_train_step: policy-in-the-loop
    training on the packed engine vs the vmap train step."""

    def test_matches_vmap_train_step(self):
        """Identical obs (byte-proven) → identical logits → identical
        sampled actions under the same keys → identical trajectories →
        identical loss/grads/updated params, to float32 determinism."""
        from minigrid_tpu.parallel.train import (
            build_packed_train_step,
            build_train_step,
            init_train_state,
        )

        env = env8()
        mesh = make_env_mesh()
        B, T = 64, 8
        key = jax.random.PRNGKey(0)
        key, k_env, k_model = jax.random.split(key, 3)
        ts0 = init_train_state(k_model, env, mesh)
        states, _ = jax.jit(env.reset_batch, static_argnums=1)(k_env, B)
        states = shard_states(states, mesh)

        vmap_step = build_train_step(env, mesh, num_steps=T)
        packed_step = build_packed_train_step(env, mesh, num_steps=T)

        ts_v, states_v, m_v = vmap_step(ts0, states, key)
        ts_p, states_p, m_p = packed_step(ts0, states, key)

        for k in m_v:
            np.testing.assert_allclose(
                float(m_p[k]), float(m_v[k]), rtol=1e-5, atol=1e-6, err_msg=k
            )
        for a, b in zip(jax.tree.leaves(ts_p.params), jax.tree.leaves(ts_v.params)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6
            )
        # Env states after the rollout match exactly (integer arrays).
        for a, b in zip(jax.tree.leaves(states_p), jax.tree.leaves(states_v)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    @pytest.mark.parametrize(
        "env_id,mode",
        [
            ("MiniGrid-Empty-8x8-v0", "regen"),
            ("MiniGrid-DoorKey-5x5-v0", "regen"),  # chunked refresh
        ],
    )
    def test_carry_surface_matches_legacy(self, env_id, mode):
        """as_carry=True train steps chained over a PackedCarry must equal
        the EnvState-surface steps chained over states (identical params,
        metrics, and final env states)."""
        from minigrid_tpu.ops.fused_rollout import packed_finish, packed_init
        from minigrid_tpu.parallel.train import (
            build_packed_train_step,
            init_train_state,
        )

        env = minigrid_tpu.make(env_id)
        mesh = make_env_mesh()
        B, T = 64, 8
        key = jax.random.PRNGKey(4)
        key, k_env, k_model = jax.random.split(key, 3)
        ts0 = init_train_state(k_model, env, mesh)
        states, _ = jax.jit(env.reset_batch, static_argnums=1)(k_env, B)
        states = shard_states(states, mesh)

        legacy = build_packed_train_step(env, mesh, num_steps=T, mode=mode)
        stepc = build_packed_train_step(
            env, mesh, num_steps=T, mode=mode, as_carry=True
        )

        keys = jax.random.split(key, 2)
        ts_l, st = ts0, states
        for k in keys:
            ts_l, st, m_l = legacy(ts_l, st, k)

        ts_c = ts0
        from minigrid_tpu.parallel.packed import shard_carry

        carry = shard_carry(
            jax.jit(lambda s: packed_init(env, s, mode))(states), mesh
        )
        for k in keys:
            ts_c, carry, m_c = stepc(ts_c, carry, k)
        sf = jax.jit(lambda c: packed_finish(env, c))(carry)

        for k in m_l:
            np.testing.assert_allclose(
                float(m_c[k]), float(m_l[k]), rtol=1e-5, atol=1e-6, err_msg=k
            )
        for a, b in zip(
            jax.tree.leaves(ts_c.params), jax.tree.leaves(ts_l.params)
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6
            )
        for a, b in zip(jax.tree.leaves(st), jax.tree.leaves(sf)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_unknown_mode_raises(self):
        from minigrid_tpu.parallel.train import build_packed_train_step

        env = minigrid_tpu.make("MiniGrid-Empty-8x8-v0")
        mesh = make_env_mesh()
        with pytest.raises(ValueError):
            build_packed_train_step(env, mesh, num_steps=4, mode="bogus")

    def test_dynamicobstacles_packed_train_compiles(self):
        # Since round 3 every family (incl. the stochastic-transition one)
        # runs on the packed engines — the packed train step included.
        from minigrid_tpu.parallel.train import (
            build_packed_train_step,
            init_train_state,
        )

        env = minigrid_tpu.make("MiniGrid-Dynamic-Obstacles-5x5-v0")
        mesh = make_env_mesh()
        step = build_packed_train_step(env, mesh, num_steps=4, mode="cached")
        key = jax.random.PRNGKey(0)
        key, k_env, k_model = jax.random.split(key, 3)
        ts = init_train_state(k_model, env, mesh)
        states, _ = jax.jit(env.reset_batch, static_argnums=1)(k_env, 16)
        from minigrid_tpu.parallel.sharding import shard_states

        states = shard_states(states, mesh)
        ts, states, metrics = step(ts, states, key)
        assert np.isfinite(float(metrics["loss"]))
