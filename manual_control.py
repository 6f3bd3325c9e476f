"""Interactive manual control — parity with the reference's
`manual_control.py` (~120 LoC): drive an environment with the keyboard in a
matplotlib window.

Keys: ←/→ turn, ↑ forward, space toggle, pageup/'p' pickup,
pagedown/'d' drop, enter done, backspace reset, escape quit.

Usage: python manual_control.py --env-name MiniGrid-MultiRoom-N6-v0
"""

from __future__ import annotations

import argparse


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--env-name", default="MiniGrid-MultiRoom-N6-v0")
    parser.add_argument("--seed", type=int, default=-1)
    parser.add_argument("--tile_size", type=int, default=32)
    parser.add_argument(
        "--agent_view",
        action="store_true",
        help="draw what the agent sees (partially observable view)",
    )
    args = parser.parse_args()

    from minigrid_tpu.compat import gym_make
    from minigrid_tpu.tools.window import Window

    env = gym_make(args.env_name)
    window = Window("minigrid_tpu - " + args.env_name)

    def redraw():
        if args.agent_view:
            import numpy as np

            from minigrid_tpu.core.obs import gen_obs_image
            from minigrid_tpu.render.render import render_obs_image

            obs_img = gen_obs_image(env.state, env.fenv.config)
            img = np.asarray(render_obs_image(obs_img, tile_size=args.tile_size))
        else:
            img = env.render(tile_size=args.tile_size)
        window.set_caption(env.mission)
        window.show_img(img)

    def reset():
        if args.seed != -1:
            env.reset(seed=args.seed)
        else:
            env.reset()
        redraw()

    def step(action):
        obs, reward, terminated, truncated, _ = env.step(action)
        print(f"step={env.step_count}, reward={reward:.2f}")
        if terminated or truncated:
            print("done!")
            reset()
        else:
            redraw()

    def key_handler(event):
        key = event.key
        if key == "escape":
            window.close()
        elif key == "backspace":
            reset()
        elif key == "left":
            step(0)
        elif key == "right":
            step(1)
        elif key == "up":
            step(2)
        elif key in ("pageup", "p"):
            step(3)
        elif key in ("pagedown", "d"):
            step(4)
        elif key == " ":
            step(5)
        elif key == "enter":
            step(6)

    window.reg_key_handler(key_handler)
    reset()
    window.show(block=True)


if __name__ == "__main__":
    main()
