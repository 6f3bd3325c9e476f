"""ops/gen_kernel.py — the in-kernel (Pallas) connect_plan loop must be
bit-identical to `vmap(envs.roomgrid.connect_plan)`, which is itself the
sanctioned device port of the reference's `RoomGrid.connect_all`
(roomgrid.py:~332-375). Also pins the jax.random bit-stream
reconstructions the kernel builds on (split / scalar random_bits /
randint under jax_threefry_partitionable), so a jax upgrade that changes
them fails HERE with a precise message rather than as a layout diff."""

import jax
import jax.numpy as jnp
import numpy as np

import minigrid_tpu
from minigrid_tpu.core.prng import threefry2x32
from minigrid_tpu.ops.gen_kernel import _u_mod, connect_plan_batched


def _cfg():
    return minigrid_tpu.make("MiniGrid-KeyCorridorS6R3-v0").config


class TestRngReconstruction:
    def test_split_formula(self):
        key = jax.random.PRNGKey(42)
        kd = jax.random.key_data(key)
        ref = np.asarray(jax.random.split(key, 5), np.uint32)
        for c in range(5):
            a, b = threefry2x32(
                jnp.int32(kd[0]), jnp.int32(kd[1]), jnp.int32(0), jnp.int32(c)
            )
            got = (np.uint32(np.asarray(a)), np.uint32(np.asarray(b)))
            assert got == tuple(ref[c]), (c, got, ref[c])

    def test_randint_formula(self):
        key = jax.random.PRNGKey(11)
        for n in (3, 4, 6, 18):
            for seed in range(10):
                k = jax.random.fold_in(key, seed)
                kd = jax.random.key_data(k)
                k0, k1 = jnp.int32(kd[0]), jnp.int32(kd[1])
                c1a, c1b = threefry2x32(k0, k1, jnp.int32(0), jnp.int32(0))
                c2a, c2b = threefry2x32(k0, k1, jnp.int32(0), jnp.int32(1))
                ha, hb = threefry2x32(c1a, c1b, jnp.int32(0), jnp.int32(0))
                la, lb = threefry2x32(c2a, c2b, jnp.int32(0), jnp.int32(0))
                m = jnp.int32(((1 << 16) % n) ** 2 % n)
                mine = int(
                    (_u_mod(ha ^ hb, n) * m + _u_mod(la ^ lb, n))
                    % jnp.int32(n)
                )
                ref = int(jax.random.randint(k, (), 0, n))
                assert mine == ref, (n, seed, mine, ref)


class TestConnectPlanKernel:
    def _inputs(self, b, seed=3):
        cfg = _cfg()
        rows, cols = cfg.num_rows, cfg.num_cols
        keys = jnp.asarray(
            np.asarray(jax.random.split(jax.random.PRNGKey(7 + seed), b)),
            jnp.uint32,
        )
        rng = np.random.RandomState(seed)
        si = jnp.asarray(rng.randint(0, cols, b), jnp.int32)
        sj = jnp.asarray(rng.randint(0, rows, b), jnp.int32)
        l2 = jnp.asarray(rng.rand(b, rows, cols) < 0.1)
        hd0 = jnp.asarray(rng.rand(b, rows, cols, 4) < 0.15)
        return cfg, keys, si, sj, l2, hd0

    def test_kernel_matches_vmap(self):
        cfg, keys, si, sj, l2, hd0 = self._inputs(64)
        ref_hd, ref_c = connect_plan_batched(
            keys, cfg, si, sj, l2, hd0, backend="xla"
        )
        k_hd, k_c = connect_plan_batched(
            keys, cfg, si, sj, l2, hd0, backend="kernel"
        )
        np.testing.assert_array_equal(np.asarray(ref_hd), np.asarray(k_hd))
        np.testing.assert_array_equal(np.asarray(ref_c), np.asarray(k_c))

    def test_kernel_matches_vmap_under_jit_odd_batch(self):
        cfg, keys, si, sj, l2, hd0 = self._inputs(96, seed=5)  # bt=96
        f = jax.jit(
            lambda k, a, b_, c, d: connect_plan_batched(
                k, cfg, a, b_, c, d, backend="kernel"
            )
        )
        k_hd, k_c = f(keys, si, sj, l2, hd0)
        ref_hd, ref_c = connect_plan_batched(
            keys, cfg, si, sj, l2, hd0, backend="xla"
        )
        np.testing.assert_array_equal(np.asarray(ref_hd), np.asarray(k_hd))
        np.testing.assert_array_equal(np.asarray(ref_c), np.asarray(k_c))

    def test_multiroom_chain_kernel_matches_vmap(self):
        """The Pallas MultiRoom chain loop is bit-identical to
        `vmap(_plan)` — kept as a measured NEGATIVE result (the XLA loop
        is faster on v5e; see `_plan_batched`'s docstring), so the
        equivalence must keep holding for the kernel to stay honest."""
        from minigrid_tpu.envs.multiroom import _plan, _plan_batched

        env = minigrid_tpu.make("MiniGrid-MultiRoom-N4-S5-v0")
        b = 64
        keys = jnp.asarray(
            np.asarray(jax.random.split(jax.random.PRNGKey(9), b)),
            jnp.uint32,
        )
        ref = jax.vmap(lambda k: _plan(k, env.config))(keys)
        got = _plan_batched(keys, env.config, backend="kernel")
        for name, a, b_ in zip(ref._fields, ref, got):
            assert jax.tree.all(
                jax.tree.map(lambda x, y: jnp.array_equal(x, y), a, b_)
            ), name

    def test_generate_packed_still_byte_exact(self):
        """End-to-end: KeyCorridor's packed generator (now routing
        connect_plan through the kernel) stays byte-exact vs the vmap
        PyTree path."""
        from minigrid_tpu.ops.fused_rollout import _pack_rolled
        from minigrid_tpu.ops.packed_gen import get_packed_generator

        env = minigrid_tpu.make("MiniGrid-KeyCorridorS6R3-v0")
        b = 32
        keys = jnp.asarray(
            np.asarray(jax.random.split(jax.random.PRNGKey(21), b)),
            jnp.uint32,
        )
        gp = get_packed_generator(env)
        w_k, r_k = gp(keys, env.config)
        states = jax.vmap(lambda k: env.generate(k, env.config))(keys)
        w_ref, r_ref = _pack_rolled(env.config, states)
        np.testing.assert_array_equal(np.asarray(w_ref), np.asarray(w_k))
        np.testing.assert_array_equal(np.asarray(r_ref), np.asarray(r_k))
