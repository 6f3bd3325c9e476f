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
from minigrid_tpu.compat.exact import CompatEnv, dynobst_step, state_to_device

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
    # Round-3 widening: every one of the 21 families carries ≥3 fixtures
    # (VERDICT r2 #4). Ids vary within a family where size variants exist.
    ("MiniGrid-Empty-5x5-v0", 101, 48),
    ("MiniGrid-DistShift2-v0", 102, 48),
    ("MiniGrid-DistShift1-v0", 103, 48),
    ("MiniGrid-LavaGapS5-v0", 104, 48),
    ("MiniGrid-LavaGapS6-v0", 105, 48),
    ("MiniGrid-FourRooms-v0", 106, 48),
    ("MiniGrid-FourRooms-v0", 107, 48),
    ("MiniGrid-DoorKey-5x5-v0", 108, 48),
    ("MiniGrid-DoorKey-16x16-v0", 109, 48),
    ("MiniGrid-MultiRoom-N2-S4-v0", 110, 48),
    ("MiniGrid-MultiRoom-N6-v0", 111, 48),
    ("MiniGrid-Fetch-5x5-N2-v0", 112, 48),
    ("MiniGrid-Fetch-6x6-N2-v0", 113, 48),
    ("MiniGrid-GoToDoor-6x6-v0", 114, 48),
    ("MiniGrid-GoToDoor-8x8-v0", 115, 48),
    ("MiniGrid-GoToObject-8x8-N2-v0", 116, 48),
    ("MiniGrid-GoToObject-6x6-N2-v0", 117, 48),
    ("MiniGrid-PutNear-8x8-N3-v0", 118, 48),
    ("MiniGrid-PutNear-6x6-N2-v0", 119, 48),
    ("MiniGrid-LockedRoom-v0", 120, 48),
    ("MiniGrid-LockedRoom-v0", 121, 48),
    ("MiniGrid-KeyCorridorS3R1-v0", 122, 48),
    ("MiniGrid-KeyCorridorS4R3-v0", 123, 48),
    ("MiniGrid-Unlock-v0", 124, 48),
    ("MiniGrid-Unlock-v0", 125, 48),
    ("MiniGrid-UnlockPickup-v0", 126, 48),
    ("MiniGrid-UnlockPickup-v0", 127, 48),
    ("MiniGrid-BlockedUnlockPickup-v0", 128, 48),
    ("MiniGrid-BlockedUnlockPickup-v0", 129, 48),
    ("MiniGrid-ObstructedMaze-1Dl-v0", 130, 48),
    ("MiniGrid-MemoryS9-v0", 131, 48),
    ("MiniGrid-LavaCrossingS9N1-v0", 132, 48),
    ("MiniGrid-Dynamic-Obstacles-8x8-v0", 133, 48),
    ("MiniGrid-Dynamic-Obstacles-5x5-v0", 134, 48),
    ("MiniGrid-Dynamic-Obstacles-Random-6x6-v0", 135, 48),
    ("MiniGrid-Playground-v0", 136, 48),
    ("MiniGrid-Playground-v0", 137, 48),
    ("MiniGrid-RedBlueDoors-8x8-v0", 138, 48),
    ("MiniGrid-RedBlueDoors-6x6-v0", 139, 48),
]

# Wrapper-output goldens: FullyObs / OneHot (functional encoders), FlatObs
# (host wrapper: flattened image ⊕ 96×27 mission one-hot), and the RGB
# renders (full grid + egocentric partial) — pinned at reset and after an
# 8-action script.
WRAPPER_CASES = [
    ("MiniGrid-Empty-8x8-v0", 1337),
    ("MiniGrid-DoorKey-8x8-v0", 1337),
    ("MiniGrid-Fetch-5x5-N2-v0", 5),
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

        # DynamicObstacles trajectories replay the reference's MT19937
        # obstacle walk host-side (compat.exact.dynobst_step) so the trace
        # is reference-exact end to end, not just the layout.
        is_dynobst = env.config.family == "dynamicobstacles"

        rng = np.random.default_rng(seed)
        actions, images, rewards, terms, truncs = [], [], [], [], []
        obs = env.observe(state, env.config)
        images.append(np.asarray(obs["image"]))
        for t in range(steps):
            a = int(rng.integers(env.num_actions))
            if is_dynobst:
                state, obs, r, te, tr = dynobst_step(ce, env, state, a)
            else:
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

    make_wrapper_goldens(out_dir)


def make_wrapper_goldens(out_dir):
    from minigrid_tpu.render.render import render_obs_image, render_state
    from minigrid_tpu.wrappers.wrappers import full_obs, one_hot_partial_obs

    for env_id, seed in WRAPPER_CASES:
        env = minigrid_tpu.make(env_id)
        ce = CompatEnv(env_id, seed=seed)
        state = state_to_device(ce.reset(), env.config)
        step = jax.jit(env.step)
        rng = np.random.default_rng(seed + 1)
        actions = [int(rng.integers(env.num_actions)) for _ in range(8)]
        for a in actions:
            state, obs, r, te, tr = step(state, jnp.int32(a))

        fo = full_obs(env).observe(state, env.config)["image"]
        oh = one_hot_partial_obs(env).observe(state, env.config)["image"]
        rgb_full = render_state(state, env.config, tile_size=8, highlight=False)
        rgb_partial = render_obs_image(jnp.asarray(obs["image"]), tile_size=8)

        # FlatObs runs host-side on the gym adapter (image ⊕ mission
        # one-hot); seeded through the adapter's own reset path.
        from minigrid_tpu.compat.gym_env import gym_make
        from minigrid_tpu.compat.host_wrappers import FlatObsWrapper

        genv = FlatObsWrapper(gym_make(env_id))
        fobs, _ = genv.reset(seed=seed)
        for a in actions:
            fobs, *_ = genv.step(a)

        fname = os.path.join(out_dir, f"wrappers_{env_id}_s{seed}.npz")
        np.savez_compressed(
            fname,
            actions=np.asarray(actions, np.int32),
            fullobs_image=np.asarray(fo),
            onehot_image=np.asarray(oh),
            rgb_full=np.asarray(rgb_full),
            rgb_partial=np.asarray(rgb_partial),
            flat_vec=np.asarray(fobs, np.float32),
        )
        print(f"wrappers {env_id} seed={seed} -> {fname}")


if __name__ == "__main__":
    main()
