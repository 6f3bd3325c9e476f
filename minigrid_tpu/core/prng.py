"""Counter-based PRNG primitives expressible inside Pallas TPU kernels.

The stochastic-transition family (DynamicObstacles — the reference's only
env with randomness in `step`, dynamicobstacles.py:~60-95) needs random
bits EVERY step. `jax.random.split` chains are unavailable inside a Pallas
kernel and would also make the per-lane key trajectory-dependent (so a
packed engine could never reproduce the vmap engine bit-for-bit across
resets). Instead, randomness is drawn counter-based:

    bits(t, i) = threefry2x32(episode_key, step_count * n + i)

keyed on the EnvState's rng leaf (constant within an episode — auto-reset
installs a fresh subkey, so every episode gets an independent stream) and
counted by in-episode step index and draw index. Both the vmap transition
(`envs/dynamicobstacles.py`) and the packed pre-hook
(`ops/packed_hooks.py`) call THIS implementation, so the two engines
consume bit-identical streams.

The implementation is the standard 20-round Threefry-2x32 (Salmon et al.,
"Parallel random numbers: as easy as 1, 2, 3", SC'11) — the same generator
underlying `jax.random` — written in pure int32 `lax` ops (adds wrap mod
2^32; rotation = shift-left | logical-shift-right), which lower on every
backend including Mosaic.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

_ROT_A = (13, 15, 26, 6)
_ROT_B = (17, 29, 16, 24)
_PARITY = 0x1BD11BDA  # Threefry key-schedule parity constant


def _rotl32(x: jnp.ndarray, r: int) -> jnp.ndarray:
    return (x << r) | lax.shift_right_logical(x, 32 - r)


def threefry2x32(k0, k1, x0, x1):
    """Threefry-2x32 block cipher: (key, counter) -> 2 uint32 words.

    All arguments and results are int32 arrays (bit patterns of the uint32
    math; int32 add/xor/shift are exact mod-2^32 equivalents).
    """
    k0 = jnp.asarray(k0, jnp.int32)
    k1 = jnp.asarray(k1, jnp.int32)
    x0 = jnp.asarray(x0, jnp.int32)
    x1 = jnp.asarray(x1, jnp.int32)
    ks = (k0, k1, k0 ^ k1 ^ jnp.int32(_PARITY))
    x0 = x0 + ks[0]
    x1 = x1 + ks[1]
    for i in range(5):
        for r in (_ROT_A, _ROT_B)[i % 2]:
            x0 = x0 + x1
            x1 = _rotl32(x1, r)
            x1 = x1 ^ x0
        x0 = x0 + ks[(i + 1) % 3]
        x1 = x1 + ks[(i + 2) % 3] + jnp.int32(i + 1)
    return x0, x1


def hash_u31(k0, k1, counter) -> jnp.ndarray:
    """One non-negative int32 (31 uniform bits) per (key, counter) pair."""
    h0, _ = threefry2x32(k0, k1, counter, jnp.zeros_like(counter))
    return h0 & jnp.int32(0x7FFFFFFF)


def key_words(rng: jnp.ndarray):
    """`(2,) uint32` jax PRNG key -> two scalar int32 key words."""
    k = lax.bitcast_convert_type(rng, jnp.int32)
    return k[0], k[1]
