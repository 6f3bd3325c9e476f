"""Executable test sweep — parity with the reference's `run_tests.py`
(~170 LoC): construct every registered env, fuzz random rollouts, check
determinism, render, invariants, and wrapper construction — all via bare
asserts, runnable as `python run_tests.py`.

(The pytest suite under `tests/` is the richer test surface; this script
exists for workflow parity with the reference. It runs on whatever
backend JAX picks — set `JAX_PLATFORMS=cpu` for a quick host-only sweep;
on the tunneled TPU the per-env compiles dominate wall-clock.)
"""

from __future__ import annotations

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    import minigrid_tpu
    from minigrid_tpu import wrappers
    from minigrid_tpu.compat import FlatObsWrapper, ReseedWrapper, gym_make
    from minigrid_tpu.envs.registry import env_list

    rng = np.random.default_rng(0)

    for env_id in env_list:
        print(env_id)
        env = minigrid_tpu.make(env_id)

        # Construction + reset well-formedness.
        state, obs = env.reset(jax.random.PRNGKey(0))
        v = env.config.agent_view_size
        assert obs["image"].shape == (v, v, 3)
        assert obs["image"].dtype == jnp.uint8

        # Random-action rollout fuzz.
        s = state
        for t in range(100):
            a = jnp.int32(rng.integers(env.num_actions))
            s, obs, reward, terminated, truncated = env.step(s, a)
            assert np.isfinite(float(reward))
            if bool(terminated) or bool(truncated):
                s, obs = env.reset(jax.random.PRNGKey(t + 1))

        # Determinism under equal keys.
        s1, o1 = env.reset(jax.random.PRNGKey(42))
        s2, o2 = env.reset(jax.random.PRNGKey(42))
        assert np.array_equal(np.asarray(o1["image"]), np.asarray(o2["image"]))

        # Render smoke.
        from minigrid_tpu.render.render import render_state

        img = np.asarray(render_state(state, env.config, tile_size=8))
        assert img.ndim == 3 and img.shape[2] == 3 and img.dtype == np.uint8

    # Wrapper checks (reference run_tests.py tail).
    base = minigrid_tpu.make("MiniGrid-Empty-8x8-v0")
    for wrap in (
        wrappers.img_obs,
        wrappers.full_obs,
        wrappers.one_hot_partial_obs,
        lambda e: wrappers.rgb_img_obs(e, 8),
        lambda e: wrappers.rgb_img_partial_obs(e, 8),
        lambda e: wrappers.view_size(e, 5),
    ):
        wenv = wrap(base)
        st, ob = wenv.reset(jax.random.PRNGKey(0))
        wenv.step(st, jnp.int32(2))

    genv = ReseedWrapper(gym_make("MiniGrid-Empty-8x8-v0"), seeds=[7, 8])
    o1, _ = genv.reset()
    o2, _ = genv.reset()
    o3, _ = genv.reset()
    assert np.array_equal(o1["image"], o3["image"])

    fenv = FlatObsWrapper(gym_make("MiniGrid-Empty-8x8-v0"))
    flat, _ = fenv.reset(seed=0)
    assert flat.ndim == 1

    print("all tests passed")


if __name__ == "__main__":
    main()
