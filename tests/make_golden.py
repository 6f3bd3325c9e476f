"""Generate golden-trajectory fixtures.

For each (env_id, seed): build the exact-replay layout (bit-exact with the
reference under old-gym seeding), roll a fixed pseudo-random action script
through the device step kernel, and record the full observable trace
(obs images, rewards, terminated/truncated). `test_golden.py` replays these
to pin behavior across refactors; when a populated reference checkout
becomes available the same fixtures verify trajectory equivalence directly.

Run: python tests/make_golden.py  (writes tests/golden/*.npz)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

import minigrid_tpu
from minigrid_tpu.compat.exact import CompatEnv, state_to_device

CASES = [
    ("MiniGrid-Empty-8x8-v0", 1337, 64),
    ("MiniGrid-Empty-Random-6x6-v0", 7, 64),
    ("MiniGrid-DoorKey-8x8-v0", 1337, 64),
    ("MiniGrid-LavaGapS7-v0", 3, 48),
    ("MiniGrid-LavaCrossingS9N2-v0", 11, 48),
    ("MiniGrid-FourRooms-v0", 21, 48),
    ("MiniGrid-MemoryS13-v0", 5, 48),
    ("MiniGrid-MultiRoom-N4-S5-v0", 9, 48),
    ("MiniGrid-Fetch-8x8-N3-v0", 13, 48),
    ("MiniGrid-Unlock-v0", 17, 48),
    ("MiniGrid-KeyCorridorS3R3-v0", 19, 48),
    ("MiniGrid-ObstructedMaze-1Dlhb-v0", 23, 48),
    ("MiniGrid-DistShift1-v0", 29, 48),
    ("MiniGrid-SimpleCrossingS9N1-v0", 31, 48),
    ("MiniGrid-RedBlueDoors-6x6-v0", 37, 48),
    ("MiniGrid-GoToDoor-5x5-v0", 41, 48),
    ("MiniGrid-GoToObject-6x6-N2-v0", 43, 48),
    ("MiniGrid-PutNear-6x6-N2-v0", 47, 48),
    ("MiniGrid-LockedRoom-v0", 53, 48),
    ("MiniGrid-UnlockPickup-v0", 59, 48),
    ("MiniGrid-BlockedUnlockPickup-v0", 61, 48),
    ("MiniGrid-Playground-v0", 67, 48),
    ("MiniGrid-ObstructedMaze-Full-v0", 71, 48),
    ("MiniGrid-MemoryS7-v0", 73, 48),
]


def main():
    out_dir = os.path.join(os.path.dirname(__file__), "golden")
    os.makedirs(out_dir, exist_ok=True)
    for env_id, seed, steps in CASES:
        env = minigrid_tpu.make(env_id)
        ce = CompatEnv(env_id, seed=seed)
        layout = ce.reset()
        state = state_to_device(layout, env.config)
        step = jax.jit(env.step)

        rng = np.random.default_rng(seed)
        actions, images, rewards, terms, truncs = [], [], [], [], []
        obs = env.observe(state, env.config)
        images.append(np.asarray(obs["image"]))
        for t in range(steps):
            a = int(rng.integers(env.num_actions))
            state, obs, r, te, tr = step(state, jnp.int32(a))
            actions.append(a)
            images.append(np.asarray(obs["image"]))
            rewards.append(float(r))
            terms.append(bool(te))
            truncs.append(bool(tr))
            if te or tr:
                break

        fname = os.path.join(out_dir, f"{env_id}_s{seed}.npz")
        np.savez_compressed(
            fname,
            grid=layout["grid"],
            agent_pos=layout["agent_pos"],
            agent_dir=layout["agent_dir"],
            actions=np.asarray(actions, np.int32),
            images=np.asarray(images, np.uint8),
            rewards=np.asarray(rewards, np.float32),
            terminated=np.asarray(terms),
            truncated=np.asarray(truncs),
        )
        print(f"{env_id} seed={seed}: {len(actions)} steps -> {fname}")


if __name__ == "__main__":
    main()
