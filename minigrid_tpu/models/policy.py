"""Actor-critic network over symbolic MiniGrid observations.

The reference ships no model zoo (SURVEY.md §2.11) — this is the learner
half our engine feeds. TPU-shaped choices: the `(V, V, 3)` integer
observation is embedded via one-hot to a dense feature block and pushed
through matmuls in bfloat16 so the FLOPs land on the MXU; all shapes are
static; the module is a plain flax `nn.Module` whose parameters shard over
a `('env', 'model')` mesh (see `minigrid_tpu.parallel`).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from minigrid_tpu.core import constants as C

# One-hot widths per observation channel: object type, color, door state.
_CHANNEL_WIDTHS = (C.NUM_OBJECTS, C.NUM_COLORS, C.NUM_STATES)


def encode_obs(obs_image: jnp.ndarray, dtype=jnp.bfloat16) -> jnp.ndarray:
    """(..., V, V, 3) uint8 → (..., V*V*20) flat one-hot features."""
    import jax

    feats = [
        jax.nn.one_hot(jnp.asarray(obs_image[..., i], jnp.int32), w, dtype=dtype)
        for i, w in enumerate(_CHANNEL_WIDTHS)
    ]
    x = jnp.concatenate(feats, axis=-1)
    return x.reshape(x.shape[:-3] + (-1,))


class ActorCritic(nn.Module):
    """MLP torso + policy/value heads; compute in bfloat16, params fp32."""

    num_actions: int
    hidden: Sequence[int] = (256, 256)
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, obs_image: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        x = encode_obs(obs_image, self.dtype)
        for i, h in enumerate(self.hidden):
            x = nn.Dense(h, dtype=self.dtype, name=f"torso_{i}")(x)
            x = nn.relu(x)
        logits = nn.Dense(self.num_actions, dtype=jnp.float32, name="actor")(x)
        value = nn.Dense(1, dtype=jnp.float32, name="critic")(x)
        return logits, jnp.squeeze(value, axis=-1)
