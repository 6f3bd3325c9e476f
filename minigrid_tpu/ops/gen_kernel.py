"""In-kernel (Pallas) layout-generation plan loops.

Regen-mode throughput on procedural families is bound by GENERATION, and
within generation by the randomized scalar *plan* loops — measured at
B=32k on v5e, `vmap(connect_plan)` (KeyCorridorS6R3's `connect_all`
draw loop, envs/roomgrid.py) costs 240 ms-1.4 s per call even after the
round-4 bit-packing and 16-draw unrolling, because an XLA `while_loop`
body of tiny `(B,)` ops runs as hundreds of un-fusable kernel launches
per iteration and the batched loop iterates to the slowest lane of the
WHOLE batch. The step kernel escaped exactly this regime by moving the
loop inside one `pallas_call`; this module does the same for the plan
loops: per-lane loop state lives in registers/VMEM, one draw is ~600
fused VPU ops on `(rows, bt)` tiles, there is ZERO per-iteration
dispatch, and each `bt`-lane grid block only runs to ITS OWN slowest
lane.

BYTE-EXACTNESS. The kernel reproduces `jax.random`'s exact bit streams
(jax_threefry_partitionable=True semantics, the default here, verified
against `jax.random.split` / `jax.random.randint` in
tests/test_gen_kernel.py):

  * `split(key, n)[c] = threefry2x32(k0, k1, 0, c)` — both output words
    form child `c`'s key (`_threefry_split_foldlike`: the count is the
    two-word 64-bit iota, whose high word is 0 for n < 2^32);
  * scalar `random_bits(key) = a ^ b` of `threefry2x32(k0, k1, 0, 0)`
    (`_threefry_random_bits_partitionable` with shape ());
  * `randint(key, (), 0, n)`: `k1, k2 = split(key)`; `higher/lower =
    random_bits(k1/k2)`; `offset = ((higher mod n)·((2^16 mod n)^2 mod
    n) + lower mod n) mod n` — the double-width modular reduction of
    `jax._src.random._randint`, with the unsigned mods computed from
    int32 bit patterns as `hi_bit·(2^31 mod n) + (low31 mod n)`.

All Threefry blocks ride `core.prng.threefry2x32` (elementwise, so the
five per-draw cipher calls batch the 4-5 independent keys of one draw
into single `(4-5, bt)` tiles). The loop itself mirrors
`envs.roomgrid.connect_plan` draw-for-draw: the chain key advances
unconditionally each draw and every state update is gated on the lane's
own convergence, which is exactly the masking `vmap`'s while-batching
applies — so the kernel result is bit-identical to
`vmap(connect_plan)` (asserted in tests/test_gen_kernel.py).

Reference anchor: `RoomGrid.connect_all`, roomgrid.py:~332-375 (random
unlocked doors until all rooms are reachable); fresh layout per reset
per minigrid.py:~722-748.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl

from minigrid_tpu.core.prng import threefry2x32
from minigrid_tpu.envs.base import EnvConfig

_COLOR_ORDER = (2, 1, 5, 3, 0, 4)  # roomgrid.COLOR_ORDER (sorted names)


def _u_mod(x: jnp.ndarray, n: int) -> jnp.ndarray:
    """`uint32(x) mod n` on int32 bit patterns (n small, static)."""
    hi = lax.shift_right_logical(x, 31)
    lo = x & jnp.int32(0x7FFFFFFF)
    return (hi * jnp.int32((1 << 31) % n) + lo % jnp.int32(n)) % jnp.int32(n)


def _connect_kernel(
    key_ref, si_ref, sj_ref, locked_ref, hd0_ref,
    hd_out, colors_out,
    *,
    rows: int, cols: int, max_itrs: int,
):
    rc = rows * cols
    full = (1 << rc) - 1
    right_edge = sum(1 << (j * cols + cols - 1) for j in range(rows))
    left_edge = sum(1 << (j * cols) for j in range(rows))
    bt = key_ref.shape[1]

    k0 = key_ref[0:1, :]
    k1 = key_ref[1:2, :]
    si = si_ref[:]
    sj = sj_ref[:]
    locked = locked_ref[:]
    start_bit = jnp.int32(1) << (sj * cols + si)  # (1, bt)

    def connected(hd):
        hdr, hdd = hd[0:1, :], hd[1:2, :]
        hdl, hdu = hd[2:3, :], hd[3:4, :]
        reach = start_bit
        for _ in range(rc):
            r = reach
            reach = (
                r
                | ((r & hdr & jnp.int32(~right_edge)) << 1)
                | (lax.shift_right_logical(r & hdl & jnp.int32(~left_edge), 1))
                | ((r & hdd) << cols)
                | (lax.shift_right_logical(r & hdu, cols))
            ) & jnp.int32(full)
        return reach == jnp.int32(full)

    def cond(carry):
        k0, k1, hd, colors, itrs = carry
        done = connected(hd) | (itrs >= max_itrs)
        return jnp.sum(jnp.where(done, 0, 1)) > 0

    # randint spans for the four per-draw draws: i in [0, cols), j in
    # [0, rows), k in [0, 4), color index in [0, 6).
    spans = (cols, rows, 4, 6)
    zeros5 = jnp.zeros((5, bt), jnp.int32)
    cnt5 = lax.broadcasted_iota(jnp.int32, (5, bt), 0)
    idx72 = lax.broadcasted_iota(jnp.int32, (rc * 4, bt), 0)

    def body(carry):
        k0, k1, hd, colors, itrs = carry
        done = connected(hd) | (itrs >= max_itrs)
        # split(key, 5) — one cipher call for all five children.
        a5, b5 = threefry2x32(
            jnp.broadcast_to(k0, (5, bt)), jnp.broadcast_to(k1, (5, bt)),
            zeros5, cnt5,
        )
        nk0, nk1 = a5[0:1, :], b5[0:1, :]  # chain advances unconditionally
        ka, kb = a5[1:5, :], b5[1:5, :]  # (4, bt): k_i, k_j, k_k, k_c
        # randint(k, (), 0, span) per row — batched double-draw reduction.
        z4 = jnp.zeros((4, bt), jnp.int32)
        c1a, c1b = threefry2x32(ka, kb, z4, z4)
        c2a, c2b = threefry2x32(ka, kb, z4, jnp.ones((4, bt), jnp.int32))
        ha, hb = threefry2x32(c1a, c1b, z4, z4)
        la, lb = threefry2x32(c2a, c2b, z4, z4)
        higher = ha ^ hb
        lower = la ^ lb
        # Per-row double-draw modular reduction (spans are static Python
        # ints — scalar constants, which Mosaic folds; a (4, 1) constant
        # column would be a captured array, which pallas_call rejects).
        draws = []
        for ridx, n in enumerate(spans):
            m = jnp.int32(((1 << 16) % n) ** 2 % n)
            draws.append(
                (_u_mod(higher[ridx : ridx + 1, :], n) * m
                 + _u_mod(lower[ridx : ridx + 1, :], n)) % jnp.int32(n)
            )
        i, j, k, cidx = draws
        color = jnp.full_like(cidx, _COLOR_ORDER[0])
        for v in range(1, 6):
            color = jnp.where(cidx == v, jnp.int32(_COLOR_ORDER[v]), color)
        # neighbor_exists + _neighbor_idx (DIR_TO_VEC order R, D, L, U).
        nexist = (
            ((k == 0) & (i < cols - 1)) | ((k == 1) & (j < rows - 1))
            | ((k == 2) & (i > 0)) | ((k == 3) & (j > 0))
        )
        ni = i + jnp.where(k == 0, 1, 0) - jnp.where(k == 2, 1, 0)
        nj = j + jnp.where(k == 1, 1, 0) - jnp.where(k == 3, 1, 0)
        nim = (ni + cols) % cols
        njm = (nj + rows) % rows
        bit = jnp.int32(1) << (j * cols + i)
        nbit = jnp.int32(1) << (njm * cols + nim)
        hd_at_k = (
            jnp.where(k == 0, hd[0:1, :], 0) | jnp.where(k == 1, hd[1:2, :], 0)
            | jnp.where(k == 2, hd[2:3, :], 0)
            | jnp.where(k == 3, hd[3:4, :], 0)
        )
        ok = (
            ~done & nexist
            & ((hd_at_k & bit) == 0)
            & ((locked & bit) == 0)
            & ((locked & nbit) == 0)
        )
        ksym = (k + 2) % 4
        new_rows = []
        for d in range(4):
            add = jnp.where(ok & (k == d), bit, 0) | jnp.where(
                ok & (ksym == d), nbit, 0
            )
            new_rows.append(hd[d : d + 1, :] | add)
        hd = jnp.concatenate(new_rows, axis=0)
        slot = (j * cols + i) * 4 + k
        nslot = (njm * cols + nim) * 4 + ksym
        colors = jnp.where(
            ok & ((idx72 == slot) | (idx72 == nslot)), color, colors
        )
        itrs = itrs + jnp.where(done, 0, 1)
        return nk0, nk1, hd, colors, itrs

    carry0 = (
        k0, k1, hd0_ref[:],
        jnp.zeros((rc * 4, bt), jnp.int32),
        jnp.zeros((1, bt), jnp.int32),
    )
    _, _, hd_f, colors_f, _ = lax.while_loop(cond, body, carry0)
    hd_out[:] = hd_f
    colors_out[:] = colors_f


def _pick_bt(b: int, pref: int = 512) -> int:
    t = min(pref, b)
    while t > 1 and b % t:
        t //= 2
    return t


def connect_plan_batched(
    keys: jnp.ndarray,  # (B, 2) uint32/int32 jax key data
    config: EnvConfig,
    start_i: jnp.ndarray,  # (B,) int32
    start_j: jnp.ndarray,
    locked_2d: jnp.ndarray,  # (B, R, Cc) bool
    has_door0: jnp.ndarray,  # (B, R, Cc, 4) bool
    max_itrs: int = 5000,
    backend: str = "auto",
    bt: Optional[int] = None,
    interpret: Optional[bool] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batched `connect_plan`: `(has_door_f (B, R, Cc, 4) bool, colors_f
    (B, R, Cc, 4) uint8)` — bit-identical to `vmap(connect_plan)` on
    every backend. `backend="kernel"` forces the Pallas loop (interpret
    mode off-TPU), `"xla"` the vmap fallback; `"auto"` uses the kernel
    (it is the measured win on TPU and equally exact elsewhere)."""
    from minigrid_tpu.envs.roomgrid import connect_plan
    from minigrid_tpu.utils.platform import mosaic_available

    b = keys.shape[0]
    rows, cols = config.num_rows, config.num_cols
    rc = rows * cols
    if backend == "xla" or rc > 30:
        return jax.vmap(
            lambda k, si, sj, l2, hd: connect_plan(
                k, config, si, sj, l2, hd, max_itrs=max_itrs
            )
        )(keys, start_i, start_j, locked_2d, has_door0)
    if interpret is None:
        interpret = not mosaic_available()
    if bt is None:
        bt = _pick_bt(b)

    room_bits = 1 << jnp.arange(rc, dtype=jnp.int32)

    def pack_bits(mask):  # (B, R*Cc) bool -> (B,) int32
        return jnp.sum(jnp.where(mask, room_bits[None, :], 0), axis=1)

    locked_bits = pack_bits(locked_2d.reshape(b, rc))
    hd0 = jnp.stack(
        [pack_bits(has_door0[:, :, :, d].reshape(b, rc)) for d in range(4)]
    )  # (4, B)

    kernel = functools.partial(
        _connect_kernel, rows=rows, cols=cols, max_itrs=max_itrs,
    )
    lane = lambda r: pl.BlockSpec((r, bt), lambda i: (0, i))  # noqa: E731
    hd_f, colors_f = pl.pallas_call(
        kernel,
        grid=(b // bt,),
        in_specs=[lane(2), lane(1), lane(1), lane(1), lane(4)],
        out_specs=[lane(4), lane(rc * 4)],
        out_shape=[
            jax.ShapeDtypeStruct((4, b), jnp.int32),
            jax.ShapeDtypeStruct((rc * 4, b), jnp.int32),
        ],
        interpret=interpret,
    )(
        lax.bitcast_convert_type(
            jnp.asarray(keys).reshape(b, 2), jnp.int32
        ).T,
        start_i[None, :].astype(jnp.int32),
        start_j[None, :].astype(jnp.int32),
        locked_bits[None, :],
        hd0,
    )
    has_door = (
        (hd_f.T[:, :, None] >> jnp.arange(rc, dtype=jnp.int32)[None, None, :])
        & 1
    ).astype(bool)  # (B, 4, RC)
    has_door = jnp.moveaxis(has_door, 1, 2).reshape(b, rows, cols, 4)
    colors = colors_f.T.reshape(b, rows, cols, 4).astype(jnp.uint8)
    return has_door, colors
