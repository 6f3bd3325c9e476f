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
