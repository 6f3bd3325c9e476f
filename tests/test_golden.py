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
from minigrid_tpu.compat.exact import CompatEnv, state_to_device

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")
FIXTURES = sorted(glob.glob(os.path.join(GOLDEN_DIR, "*.npz")))


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
    layout = CompatEnv(env_id, seed=seed).reset()
    np.testing.assert_array_equal(layout["grid"], data["grid"])
    np.testing.assert_array_equal(layout["agent_pos"], data["agent_pos"])
    assert int(layout["agent_dir"]) == int(data["agent_dir"])

    # 2. The device kernel still produces the recorded trace.
    state = state_to_device(layout, env.config)
    step = jax.jit(env.step)
    obs = env.observe(state, env.config)
    np.testing.assert_array_equal(np.asarray(obs["image"]), data["images"][0])
    for t, a in enumerate(data["actions"]):
        state, obs, r, te, tr = step(state, jnp.int32(int(a)))
        np.testing.assert_array_equal(
            np.asarray(obs["image"]), data["images"][t + 1],
            err_msg=f"{env_id} step {t}",
        )
        assert float(r) == pytest.approx(float(data["rewards"][t]), abs=1e-6)
        assert bool(te) == bool(data["terminated"][t])
        assert bool(tr) == bool(data["truncated"][t])


def test_fixtures_exist():
    assert len(FIXTURES) >= 10, "golden fixtures missing — run tests/make_golden.py"
