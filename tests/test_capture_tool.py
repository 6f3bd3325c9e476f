"""The reference-capture tool's old-gym shim is known-good BEFORE a
populated reference mount ever appears (tools/capture_reference.py): a toy
env written against the old-gym surface gym_minigrid uses must construct,
register, seed, and draw from the SHA-512/MT19937 RNG identically to
`minigrid_tpu.compat.seeding`.
"""

import subprocess
import sys

import numpy as np


def _fresh_shim():
    # Import in-process but guard sys.modules hygiene: the shim installs
    # `gym` et al.; remove them afterwards so other tests never see a fake
    # gym package.
    sys.path.insert(0, "tools")
    import capture_reference

    return capture_reference


def test_shim_surface_and_seeding():
    cap = _fresh_shim()
    saved = {k: sys.modules.get(k) for k in list(sys.modules) if k.startswith("gym")}
    try:
        gym = cap.install_gym_shim()

        # A toy env exercising exactly the reference's import surface.
        class ToyEnv(gym.Env):
            def __init__(self, size=4):
                self.observation_space = gym.spaces.Dict(
                    {
                        "image": gym.spaces.Box(
                            0, 255, (size, size, 3), dtype=np.uint8
                        )
                    }
                )
                self.action_space = gym.spaces.Discrete(7)
                self.seed(1337)

            def seed(self, seed=None):
                self.np_random, _ = gym.utils.seeding.np_random(seed)
                return [seed]

            def draws(self, n):
                return [int(self.np_random.randint(0, 100)) for _ in range(n)]

        # Registration round-trip (entry-point resolution path).
        gym.envs.registration.register(
            id="Toy-v0",
            entry_point="tests.test_capture_tool:_ToyTarget",
            kwargs={"kwargs": {"size": 5}},
        )
        assert "Toy-v0" in gym.registry

        env = ToyEnv()
        env.seed(42)
        a = env.draws(5)
        env.seed(42)
        assert env.draws(5) == a  # deterministic reseed

        # The shim's np_random IS the compat SHA-512/MT19937 path — the one
        # the bit-exact replayer uses, so reference draws will line up.
        from minigrid_tpu.compat.seeding import np_random

        rs, _ = np_random(42)
        assert [int(rs.randint(0, 100)) for _ in range(5)] == a
        assert env.action_space.contains(3)
        assert not env.action_space.contains(9)
    finally:
        for k in list(sys.modules):
            if k.startswith("gym") and not k.startswith("gymnasium"):
                if k in saved and saved[k] is not None:
                    sys.modules[k] = saved[k]
                else:
                    sys.modules.pop(k, None)


class _ToyTarget:
    def __init__(self, size=5):
        self.size = size


def test_tool_reports_empty_mount():
    # With the mount empty the tool must exit 2 (not crash) — the state
    # every round has seen so far.
    res = subprocess.run(
        [sys.executable, "tools/capture_reference.py", "--reference",
         "/nonexistent-reference-path"],
        capture_output=True,
        text=True,
        timeout=120,
    )
    assert res.returncode == 2, res.stderr[-2000:]
    assert "no gym_minigrid package" in res.stdout
