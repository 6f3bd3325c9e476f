"""Checkpoint / resume roundtrips (utils/checkpoint.py).

The reference has no save/restore at all (SURVEY.md §5); here every state
is a PyTree of arrays, so exact save/restore must actually be exact:
byte-identical leaves, validated treedef, and — for the orbax path —
shardings preserved across a restore on the 8-device mesh.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import minigrid_tpu
from minigrid_tpu.utils.checkpoint import (
    load_orbax,
    load_pytree,
    save_orbax,
    save_pytree,
)


@functools.lru_cache(maxsize=None)
def env8():
    return minigrid_tpu.make("MiniGrid-Empty-8x8-v0")


def _assert_trees_equal(a, b):
    la, ta = jax.tree.flatten(a)
    lb, tb = jax.tree.flatten(b)
    assert ta == tb
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


class TestNpzRoundtrip:
    def test_env_state_batch(self, tmp_path):
        env = env8()
        states, _ = jax.jit(env.reset_batch, static_argnums=1)(
            jax.random.PRNGKey(0), 16
        )
        # Step a few times so the state is not all-reset-trivial.
        from minigrid_tpu.core.rollout import build_rollout

        rollout = jax.jit(build_rollout(env, num_steps=7))
        states, _ = rollout(jax.random.PRNGKey(1), states)

        path = str(tmp_path / "env_state.npz")
        save_pytree(path, states)
        restored = load_pytree(path, states)
        _assert_trees_equal(states, restored)

        # The restored state must be usable: resume the rollout and match
        # a run that never left device.
        s_resumed, m1 = rollout(jax.random.PRNGKey(2), restored)
        s_direct, m2 = rollout(jax.random.PRNGKey(2), states)
        _assert_trees_equal(s_resumed, s_direct)
        assert float(m1.total_reward) == float(m2.total_reward)

    def test_restored_state_steps_eagerly(self, tmp_path):
        # Restored leaves must be device arrays: un-jitted env.step uses
        # `.at[]` updates, which numpy leaves don't have.
        env = env8()
        state, _ = env.reset(jax.random.PRNGKey(8))
        path = str(tmp_path / "single.npz")
        save_pytree(path, state)
        restored = load_pytree(path, state)
        sa, *_ = env.step(state, jnp.int32(2))
        sb, *_ = env.step(restored, jnp.int32(2))
        _assert_trees_equal(sa, sb)

    def test_train_state(self, tmp_path):
        from minigrid_tpu.parallel.sharding import make_env_mesh
        from minigrid_tpu.parallel.train import init_train_state

        env = env8()
        ts = init_train_state(jax.random.PRNGKey(3), env, make_env_mesh())
        path = str(tmp_path / "train_state.npz")
        save_pytree(path, ts)
        restored = load_pytree(path, ts)
        _assert_trees_equal(ts, restored)

    def test_treedef_mismatch_raises(self, tmp_path):
        path = str(tmp_path / "tree.npz")
        save_pytree(path, {"a": jnp.arange(3), "b": jnp.arange(4)})
        with pytest.raises(ValueError, match="treedef mismatch"):
            load_pytree(path, {"a": jnp.arange(3), "c": jnp.arange(4)})
        with pytest.raises(ValueError, match="treedef mismatch"):
            load_pytree(path, [jnp.arange(3), jnp.arange(4)])
        # Same structure loads fine even with different leaf values.
        out = load_pytree(path, {"a": jnp.zeros(3), "b": jnp.zeros(4)})
        np.testing.assert_array_equal(np.asarray(out["a"]), np.arange(3))


class TestOrbaxSharded:
    def test_packed_carry_roundtrip_preserves_sharding(self, tmp_path):
        from minigrid_tpu.ops.fused_rollout import packed_init
        from minigrid_tpu.parallel.packed import shard_carry
        from minigrid_tpu.parallel.sharding import make_env_mesh

        env = env8()
        mesh = make_env_mesh()
        states, _ = jax.jit(env.reset_batch, static_argnums=1)(
            jax.random.PRNGKey(4), 1024
        )
        carry = jax.jit(lambda s: packed_init(env, s, "cached"))(states)
        carry = shard_carry(carry, mesh)

        path = str(tmp_path / "carry_ckpt")
        save_orbax(path, carry)
        restored = load_orbax(path, carry)

        _assert_trees_equal(carry, restored)
        for ref, out in zip(jax.tree.leaves(carry), jax.tree.leaves(restored)):
            assert out.sharding.is_equivalent_to(ref.sharding, ref.ndim), (
                f"sharding lost in restore: {ref.sharding} -> {out.sharding}"
            )

    def test_restored_carry_steps_identically(self, tmp_path):
        from minigrid_tpu.ops.fused_rollout import (
            build_packed_xla_rollout,
            packed_init,
        )
        from minigrid_tpu.parallel.packed import shard_carry
        from minigrid_tpu.parallel.sharding import make_env_mesh

        env = env8()
        mesh = make_env_mesh()
        states, _ = jax.jit(env.reset_batch, static_argnums=1)(
            jax.random.PRNGKey(5), 1024
        )
        carry = jax.jit(lambda s: packed_init(env, s, "cached"))(states)
        carry = shard_carry(carry, mesh)

        step = jax.jit(
            build_packed_xla_rollout(
                env, num_steps=16, mode="cached", as_carry=True
            )
        )
        carry, _ = step(jax.random.PRNGKey(6), carry)

        path = str(tmp_path / "carry_mid")
        save_orbax(path, carry)
        restored = load_orbax(path, carry)

        c1, m1 = step(jax.random.PRNGKey(7), carry)
        c2, m2 = step(jax.random.PRNGKey(7), restored)
        _assert_trees_equal(c1, c2)
        assert float(m1.total_reward) == float(m2.total_reward)
