"""Golden-trajectory replay: exact-layout + device-step traces are pinned.

Fixtures produced by `make_golden.py`: the layout comes from the bit-exact
MT19937 replayer, the trajectory from the device step kernel under a fixed
action script. Any semantic drift in generators, step, or obs encoding
fails here byte-for-byte.
"""

import glob
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import minigrid_tpu
from minigrid_tpu.compat.exact import CompatEnv, dynobst_step, state_to_device

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")
FIXTURES = sorted(
    f
    for f in glob.glob(os.path.join(GOLDEN_DIR, "*.npz"))
    if not os.path.basename(f).startswith("wrappers_")
)
WRAPPER_FIXTURES = sorted(
    glob.glob(os.path.join(GOLDEN_DIR, "wrappers_*.npz"))
)


def _parse(fname):
    base = os.path.basename(fname)[: -len(".npz")]
    env_id, seed = base.rsplit("_s", 1)
    return env_id, int(seed)


@pytest.mark.parametrize("fixture", FIXTURES, ids=[os.path.basename(f) for f in FIXTURES])
def test_golden_trajectory(fixture):
    env_id, seed = _parse(fixture)
    data = np.load(fixture)
    env = minigrid_tpu.make(env_id)

    # 1. The exact replayer still reproduces the recorded layout.
    ce = CompatEnv(env_id, seed=seed)
    layout = ce.reset()
    np.testing.assert_array_equal(layout["grid"], data["grid"])
    np.testing.assert_array_equal(layout["agent_pos"], data["agent_pos"])
    assert int(layout["agent_dir"]) == int(data["agent_dir"])

    # 2. The device kernel still produces the recorded trace. The one
    # stochastic-transition family replays the reference's MT19937
    # obstacle walk host-side (compat.exact.dynobst_step), continuing the
    # same stream the layout came from.
    is_dynobst = env.config.family == "dynamicobstacles"
    state = state_to_device(layout, env.config)
    step = jax.jit(env.step)
    obs = env.observe(state, env.config)
    np.testing.assert_array_equal(np.asarray(obs["image"]), data["images"][0])
    for t, a in enumerate(data["actions"]):
        if is_dynobst:
            state, obs, r, te, tr = dynobst_step(ce, env, state, int(a))
        else:
            state, obs, r, te, tr = step(state, jnp.int32(int(a)))
        np.testing.assert_array_equal(
            np.asarray(obs["image"]), data["images"][t + 1],
            err_msg=f"{env_id} step {t}",
        )
        assert float(r) == pytest.approx(float(data["rewards"][t]), abs=1e-6)
        assert bool(te) == bool(data["terminated"][t])
        assert bool(tr) == bool(data["truncated"][t])


def test_fixtures_exist():
    # ≥3 fixtures per family × 21 families (VERDICT r2 #4).
    assert len(FIXTURES) >= 63, "golden fixtures missing — run tests/make_golden.py"
    families = set()
    for f in FIXTURES:
        env_id, _ = _parse(f)
        families.add(minigrid_tpu.make(env_id).config.family)
    assert len(families) == 21, sorted(families)


@pytest.mark.parametrize(
    "fixture", WRAPPER_FIXTURES, ids=[os.path.basename(f) for f in WRAPPER_FIXTURES]
)
def test_wrapper_goldens(fixture):
    """FullyObs / OneHot / FlatObs / RGB render outputs are pinned
    byte-for-byte (wrapper-output parity fixtures, VERDICT r2 #4)."""
    from minigrid_tpu.compat.gym_env import gym_make
    from minigrid_tpu.compat.host_wrappers import FlatObsWrapper
    from minigrid_tpu.render.render import render_obs_image, render_state
    from minigrid_tpu.wrappers.wrappers import full_obs, one_hot_partial_obs

    base = os.path.basename(fixture)[len("wrappers_") : -len(".npz")]
    env_id, seed = base.rsplit("_s", 1)
    seed = int(seed)
    data = np.load(fixture)

    env = minigrid_tpu.make(env_id)
    state = state_to_device(CompatEnv(env_id, seed=seed).reset(), env.config)
    step = jax.jit(env.step)
    for a in data["actions"]:
        state, obs, r, te, tr = step(state, jnp.int32(int(a)))

    np.testing.assert_array_equal(
        np.asarray(full_obs(env).observe(state, env.config)["image"]),
        data["fullobs_image"],
    )
    np.testing.assert_array_equal(
        np.asarray(one_hot_partial_obs(env).observe(state, env.config)["image"]),
        data["onehot_image"],
    )
    np.testing.assert_array_equal(
        np.asarray(render_state(state, env.config, tile_size=8, highlight=False)),
        data["rgb_full"],
    )
    np.testing.assert_array_equal(
        np.asarray(render_obs_image(jnp.asarray(obs["image"]), tile_size=8)),
        data["rgb_partial"],
    )

    genv = FlatObsWrapper(gym_make(env_id))
    fobs, _ = genv.reset(seed=seed)
    for a in data["actions"]:
        fobs, *_ = genv.step(int(a))
    np.testing.assert_array_equal(np.asarray(fobs, np.float32), data["flat_vec"])


def test_wrapper_fixtures_exist():
    assert len(WRAPPER_FIXTURES) >= 3, "run tests/make_golden.py"
