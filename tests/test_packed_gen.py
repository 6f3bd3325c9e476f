"""Lane-major packed generation (ops/packed_gen.py).

The contract: for every family providing `generate_packed`, its output is
BYTE-EXACT vs `_pack_rolled(cfg, vmap(generate)(keys))` — same words
(agent-center-rolled), same regs — because the scalar plan reuses the
family's exact RNG call tree and the packed paint mirrors the PyTree
paint op for op. The regen engines then transparently pick it up
(`masked_template_refresh` / `packed_init`), covered by the existing
regen equivalence suites; here we additionally pin one end-to-end regen
rollout per packed family against the vmap path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import minigrid_tpu
from minigrid_tpu.ops.fused_rollout import _pack_rolled
from minigrid_tpu.ops.packed_gen import get_packed_generator

# Families with a packed generator; every listed id is asserted to HAVE
# one (so a silently-lost hook fails loudly).
PACKED_IDS = [
    "MiniGrid-MultiRoom-N2-S4-v0",
    "MiniGrid-MultiRoom-N4-S5-v0",
    "MiniGrid-MultiRoom-N6-v0",
]


class TestPackedGenerators:
    @pytest.mark.parametrize("env_id", PACKED_IDS)
    def test_byte_exact_vs_vmap_generate(self, env_id):
        env = minigrid_tpu.make(env_id)
        gp = get_packed_generator(env)
        assert gp is not None, f"{env_id} lost its packed generator"
        keys = jax.random.split(jax.random.PRNGKey(17), 96)
        ref = jax.jit(jax.vmap(lambda k: env.generate(k, env.config)))(keys)
        rw, rr = jax.jit(lambda s: _pack_rolled(env.config, s))(ref)
        pw, pr = jax.jit(lambda k: gp(k, env.config))(keys)
        np.testing.assert_array_equal(np.asarray(rw), np.asarray(pw))
        np.testing.assert_array_equal(np.asarray(rr), np.asarray(pr))

    def test_regen_rollout_end_to_end(self):
        """The packed engine with the packed generator in the refresh loop
        stays byte-exact vs the vmap regen path."""
        from minigrid_tpu.core.rollout import build_rollout
        from minigrid_tpu.ops.fused_rollout import build_packed_xla_rollout

        env = minigrid_tpu.make("MiniGrid-MultiRoom-N2-S4-v0")
        B = 128
        key = jax.random.PRNGKey(1)
        key, kr = jax.random.split(key)
        states, _ = jax.jit(env.reset_batch, static_argnums=1)(kr, B)
        sx, mx = jax.jit(build_rollout(env, 48, autoreset_mode="regen"))(
            key, states
        )
        sp, mp = jax.jit(
            build_packed_xla_rollout(env, 48, mode="regen", regen_chunk=8)
        )(key, states)
        assert int(mx.episodes) == int(mp.episodes) > 0
        assert int(mx.obs_checksum) == int(mp.obs_checksum)
        for la, lb in zip(jax.tree.leaves(sx), jax.tree.leaves(sp)):
            np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))
