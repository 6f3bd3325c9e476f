"""Capture ground truth from a populated `/root/reference` checkout.

THE FIRST ACTION when the reference mount stops being empty (it has been
empty every round so far — SURVEY.md provenance caveat): this tool runs the
REAL `gym_minigrid` package's `_gen_grid`/`step` under the exact seeds of
every golden fixture in `tests/golden/` and diffs layouts + trajectories
against what `minigrid_tpu.compat.exact.CompatEnv` (the from-memory MT19937
call-order replayer) produced. Any divergence pinpoints where the replayer's
reconstruction of the reference RNG call order is wrong.

    python tools/capture_reference.py [--reference /root/reference]
                                      [--out REFCAPTURE.json]

Exit status: 0 = every comparable fixture matches byte-for-byte; 1 =
divergence (details in the report); 2 = reference not found / not importable.

The reference depends on the OLD `gym` package (≤0.21 API), which is not
installed here — only gymnasium is. `install_gym_shim()` injects a minimal
`gym` module tree (Env/Wrapper classes, spaces, `utils.seeding.np_random`
via `minigrid_tpu.compat.seeding` — the SHA-512 `hash_seed` MT19937 path —
and a registration registry) sufficient for `gym_minigrid` to import and
run. The shim is also unit-tested in tests/test_capture_tool.py so the
capture path is known-good before a mount ever appears.

Comparison semantics per fixture:
  * layout: reference `grid.encode()` is `(width, height, 3)` `[x, y]`-
    indexed; ours is `(H, W, 5)` `[row, col]` — compare the transpose
    against channels 0:3, plus agent_pos/agent_dir.
  * trajectory: replay the fixture's action script through the reference
    env; compare obs images (both `[x, y]`-indexed uint8), rewards, and
    `done` vs our `terminated|truncated`. This includes dynamicobstacles:
    its fixtures are produced by the MT19937 host walk replayer
    (`compat.exact.dynobst_step`), which continues the exact stream the
    reference's own `step` would draw from, so the stochastic obstacle
    trajectories diff byte-for-byte too.
"""

from __future__ import annotations

import argparse
import glob
import importlib
import json
import os
import sys
import types

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


# --------------------------------------------------------------------------
# Old-gym API shim
# --------------------------------------------------------------------------


def install_gym_shim() -> types.ModuleType:
    """Install a minimal old-gym (`gym` ≤0.21) module tree into sys.modules.

    Covers exactly the surface gym_minigrid imports (SURVEY.md §1 L0):
    `gym.Env`, `gym.core.Wrapper/ObservationWrapper`, `gym.spaces.{Discrete,
    Box,Dict}`, `gym.utils.seeding.np_random`, and
    `gym.envs.registration.register` (+ a working `gym.make`).
    """
    from minigrid_tpu.compat import seeding as compat_seeding

    gym = types.ModuleType("gym")

    class Env:
        metadata = {"render.modes": []}
        reward_range = (-float("inf"), float("inf"))
        spec = None

        def seed(self, seed=None):
            return []

        def close(self):
            pass

        def __str__(self):
            return f"<{type(self).__name__}>"

    class Wrapper(Env):
        def __init__(self, env):
            self.env = env

        def __getattr__(self, name):
            return getattr(self.env, name)

        def reset(self, **kw):
            return self.env.reset(**kw)

        def step(self, action):
            return self.env.step(action)

    class ObservationWrapper(Wrapper):
        def reset(self, **kw):
            return self.observation(self.env.reset(**kw))

        def step(self, action):
            obs, reward, done, info = self.env.step(action)
            return self.observation(obs), reward, done, info

    class RewardWrapper(Wrapper):
        pass

    class Space:
        def __init__(self, shape=None, dtype=None):
            self.shape = shape
            self.dtype = dtype

        def contains(self, x):
            return True

    class Discrete(Space):
        def __init__(self, n):
            super().__init__(shape=(), dtype=np.int64)
            self.n = n

        def contains(self, x):
            return 0 <= int(x) < self.n

    class Box(Space):
        def __init__(self, low, high, shape=None, dtype=np.float32):
            super().__init__(shape=shape, dtype=dtype)
            self.low = low
            self.high = high

    class SpaceDict(Space):
        def __init__(self, spaces_dict):
            super().__init__()
            self.spaces = dict(spaces_dict)

        def __getitem__(self, k):
            return self.spaces[k]

    # Registration: enough for `register(id=..., entry_point=...)` +
    # `gym.make(id)` resolving "pkg.module:Class" entry points.
    registry: dict = {}

    def register(id=None, entry_point=None, reward_threshold=None,
                 max_episode_steps=None, **kwargs):
        registry[id] = {
            "entry_point": entry_point,
            "reward_threshold": reward_threshold,
            "max_episode_steps": max_episode_steps,
            "kwargs": kwargs.get("kwargs", {}),
        }

    def make(env_id, **kw):
        spec = registry[env_id]
        mod_name, cls_name = spec["entry_point"].split(":")
        cls = getattr(importlib.import_module(mod_name), cls_name)
        return cls(**{**spec["kwargs"], **kw})

    def np_random(seed=None):
        return compat_seeding.np_random(seed)

    # Assemble the module tree.
    gym.Env = Env
    gym.Wrapper = Wrapper
    gym.ObservationWrapper = ObservationWrapper
    gym.RewardWrapper = RewardWrapper
    gym.make = make
    gym.registry = registry

    core = types.ModuleType("gym.core")
    core.Env = Env
    core.Wrapper = Wrapper
    core.ObservationWrapper = ObservationWrapper
    core.RewardWrapper = RewardWrapper

    spaces = types.ModuleType("gym.spaces")
    spaces.Space = Space
    spaces.Discrete = Discrete
    spaces.Box = Box
    spaces.Dict = SpaceDict

    error = types.ModuleType("gym.error")
    error.Error = type("Error", (Exception,), {})
    error.DependencyNotInstalled = type(
        "DependencyNotInstalled", (error.Error,), {}
    )

    utils = types.ModuleType("gym.utils")
    seeding_mod = types.ModuleType("gym.utils.seeding")
    seeding_mod.np_random = np_random
    seeding_mod.hash_seed = compat_seeding.hash_seed
    seeding_mod.create_seed = compat_seeding.create_seed
    utils.seeding = seeding_mod

    envs_mod = types.ModuleType("gym.envs")
    registration = types.ModuleType("gym.envs.registration")
    registration.register = register
    registration.registry = registry
    envs_mod.registration = registration

    gym.core = core
    gym.spaces = spaces
    gym.error = error
    gym.utils = utils
    gym.envs = envs_mod

    for name, mod in [
        ("gym", gym),
        ("gym.core", core),
        ("gym.spaces", spaces),
        ("gym.error", error),
        ("gym.utils", utils),
        ("gym.utils.seeding", seeding_mod),
        ("gym.envs", envs_mod),
        ("gym.envs.registration", registration),
    ]:
        sys.modules[name] = mod
    return gym


# --------------------------------------------------------------------------
# Capture + diff
# --------------------------------------------------------------------------


def find_reference_package(root: str):
    """Locate the gym_minigrid package dir under the mount (any depth ≤3)."""
    for pattern in (
        "gym_minigrid",
        "*/gym_minigrid",
        "*/*/gym_minigrid",
    ):
        for cand in sorted(glob.glob(os.path.join(root, pattern))):
            if os.path.isfile(os.path.join(cand, "minigrid.py")):
                return os.path.dirname(cand)
    return None


def compare_fixture(gym, fixture_path: str, report: list) -> bool:
    base = os.path.basename(fixture_path)[: -len(".npz")]
    env_id, seed = base.rsplit("_s", 1)
    seed = int(seed)
    data = np.load(fixture_path)

    env = gym.make(env_id)
    env.seed(seed)
    obs = env.reset()

    entry = {"env_id": env_id, "seed": seed, "ok": True, "diffs": []}

    # --- layout ---
    ref_grid = env.grid.encode()  # (W, H, 3), [x, y]
    ours = data["grid"]  # (H, W, 5), [row=y, col=x]
    if not np.array_equal(ref_grid.transpose(1, 0, 2), ours[..., :3]):
        entry["ok"] = False
        entry["diffs"].append("grid")
    if not np.array_equal(np.asarray(env.agent_pos), data["agent_pos"]):
        entry["ok"] = False
        entry["diffs"].append(
            f"agent_pos ref={tuple(env.agent_pos)} ours={tuple(data['agent_pos'])}"
        )
    if int(env.agent_dir) != int(data["agent_dir"]):
        entry["ok"] = False
        entry["diffs"].append(
            f"agent_dir ref={env.agent_dir} ours={int(data['agent_dir'])}"
        )

    # --- trajectory (incl. dynamicobstacles: the fixture's obstacle walk
    # replays the reference's own MT19937 stream, see module docstring) ---
    if entry["ok"]:
        if not np.array_equal(np.asarray(obs["image"]), data["images"][0]):
            entry["ok"] = False
            entry["diffs"].append("obs[0]")
        for t, a in enumerate(data["actions"]):
            obs, reward, done, _ = env.step(int(a))
            if not np.array_equal(np.asarray(obs["image"]), data["images"][t + 1]):
                entry["ok"] = False
                entry["diffs"].append(f"obs[{t + 1}]")
                break
            if abs(float(reward) - float(data["rewards"][t])) > 1e-6:
                entry["ok"] = False
                entry["diffs"].append(
                    f"reward[{t}] ref={reward} ours={float(data['rewards'][t])}"
                )
                break
            ours_done = bool(data["terminated"][t]) or bool(data["truncated"][t])
            if bool(done) != ours_done:
                entry["ok"] = False
                entry["diffs"].append(f"done[{t}] ref={done} ours={ours_done}")
                break

    report.append(entry)
    return entry["ok"]


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--reference", default="/root/reference")
    p.add_argument("--out", default=os.path.join(REPO, "REFCAPTURE.json"))
    args = p.parse_args()

    pkg_root = find_reference_package(args.reference)
    if pkg_root is None:
        print(
            f"no gym_minigrid package under {args.reference!r} — mount still "
            "empty? (this has been the case every round; see SURVEY.md)"
        )
        return 2

    try:
        import gym  # noqa: F401 — real old gym, if somehow installed

        gym_mod = gym
        print("using installed gym")
    except ImportError:
        gym_mod = install_gym_shim()
        print("installed old-gym shim (gym not installed)")

    sys.path.insert(0, pkg_root)
    import gym_minigrid.envs  # noqa: F401 — fires register() calls

    fixtures = sorted(
        f
        for f in glob.glob(os.path.join(REPO, "tests", "golden", "*.npz"))
        if not os.path.basename(f).startswith("wrappers_")
    )
    report: list = []
    ok = True
    for f in fixtures:
        try:
            ok &= compare_fixture(gym_mod, f, report)
        except Exception as e:  # keep capturing the rest
            report.append(
                {"env_id": os.path.basename(f), "ok": False, "diffs": [repr(e)]}
            )
            ok = False

    n_ok = sum(1 for e in report if e["ok"])
    summary = {
        "reference_root": pkg_root,
        "fixtures": len(report),
        "matching": n_ok,
        "results": report,
    }
    with open(args.out, "w") as fh:
        json.dump(summary, fh, indent=2)
    print(f"{n_ok}/{len(report)} fixtures match; report -> {args.out}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
