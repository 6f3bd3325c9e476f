"""All env-id registrations, grouped by family.

The reference scatters `register()` calls across env files
(envs/*.py); centralizing them here keeps each family module a pure
collection of kernels and makes the full id inventory auditable in one
place. Ids, grid dims, and max_steps match the reference registrations.
"""

from __future__ import annotations

from minigrid_tpu.core.state import EnvConfig
from minigrid_tpu.envs.registry import register

# --------------------------------------------------------------------- Empty
# Reference envs/empty.py: max_steps = 4*size*size, see_through_walls=True.
from minigrid_tpu.envs import empty as _empty

for _size in (5, 6, 8, 16):
    register(
        f"MiniGrid-Empty-{_size}x{_size}-v0",
        EnvConfig(
            family="empty",
            width=_size,
            height=_size,
            max_steps=4 * _size * _size,
            see_through_walls=True,
            agent_start_pos=(1, 1),
            agent_start_dir=0,
        ),
        _empty.generate,
        _empty.step,
    )

for _size in (5, 6):
    register(
        f"MiniGrid-Empty-Random-{_size}x{_size}-v0",
        EnvConfig(
            family="empty",
            width=_size,
            height=_size,
            max_steps=4 * _size * _size,
            see_through_walls=True,
            agent_start_pos=None,
        ),
        _empty.generate,
        _empty.step,
    )
