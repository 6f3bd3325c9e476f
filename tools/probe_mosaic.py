"""Minimal repros / workaround probes for the grad-kernel Mosaic crash.

Round-5 bisection (`ops/grad_kernel.py` docstring) found: the fused
fwd+bwd kernel's forward chain compiles, every backward dot compiles
standalone, but forward + any accumulator dot consuming a RELU-MASKED
cotangent crashes this environment's remote tpu_compile_helper (exit 1,
no diagnostic). select-mask, f32-multiply-then-cast and
cast-then-bf16-multiply all crash identically.

This script reproduces the minimal crashing pattern and probes
formulations that route the mask through different lowering paths
(bitwise-and on the bf16 bit pattern, int-select then bitcast, a VMEM
scratch roundtrip, f32 dots, optimization_barrier). Each probe runs in a
SUBPROCESS so a compiler crash doesn't kill the sweep.

Usage:
  python tools/probe_mosaic.py            # run all variants, print table
  python tools/probe_mosaic.py <variant>  # run one in-process (worker)
"""

from __future__ import annotations

import subprocess
import sys

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

F = 980  # feature rows (V²·20 at V=7)
H = 256
BT = 512
V2 = 49

VARIANTS = [
    "control_unmasked",   # expected: compiles (bisection's control)
    "base_where",         # expected: crashes (recorded formulation)
    "bitand_mask",        # mask via int16 bitwise-and on the bf16 bits
    "int_select_bitcast", # select in int16 domain, bitcast back
    "scratch_roundtrip",  # write dh to VMEM scratch, read back, dot
    "f32_dot",            # masked cotangent stays f32, dot in f32
    "opt_barrier",        # lax.optimization_barrier between mask and dot
    "mask_from_f32",      # mask computed on the pre-cast f32 dot output
    "upcast_cmp",         # mask = h2p.astype(f32) > 0 (exact upcast)
]


def _feats(wv):
    t = wv & 15
    c = (wv >> 4) & 15
    s = (wv >> 8) & 15
    rows = []
    for chan, width in zip((t, c, s), (11, 6, 3)):
        for val in range(width):
            rows.append((chan == val).astype(jnp.bfloat16))
    return jnp.concatenate(rows, axis=0)


def make_kernel(variant: str):
    def kernel(obs_ref, g_ref, wt1_ref, b1_ref, wt2_ref, b2_ref,
               out_ref, acc):
        j = pl.program_id(0)

        @pl.when(j == 0)
        def _():
            acc[:] = jnp.zeros_like(acc)

        wv = obs_ref[0]
        feats = _feats(wv)                                   # (F, bt) bf16
        h1d = jnp.dot(wt1_ref[:], feats,
                      preferred_element_type=jnp.float32)    # (H, bt) f32
        h1p = h1d.astype(jnp.bfloat16) + b1_ref[:]
        h1 = jnp.maximum(h1p, 0)
        h2d = jnp.dot(wt2_ref[:], h1,
                      preferred_element_type=jnp.float32)
        h2p = h2d.astype(jnp.bfloat16) + b2_ref[:]

        g = g_ref[:]                                         # (H, bt) f32

        mm_nt = lambda a_, b_: lax.dot_general(  # noqa: E731
            a_, b_, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

        if variant == "control_unmasked":
            dh = g.astype(jnp.bfloat16)
            acc[:] += mm_nt(dh, h1)
        elif variant == "base_where":
            dh = jnp.where(h2p > 0, g.astype(jnp.bfloat16), 0)
            acc[:] += mm_nt(dh, h1)
        elif variant == "bitand_mask":
            gb = lax.bitcast_convert_type(g.astype(jnp.bfloat16), jnp.int16)
            m = (-(h2p > 0).astype(jnp.int16))               # 0 or 0xFFFF
            dh = lax.bitcast_convert_type(gb & m, jnp.bfloat16)
            acc[:] += mm_nt(dh, h1)
        elif variant == "int_select_bitcast":
            gb = lax.bitcast_convert_type(g.astype(jnp.bfloat16), jnp.int16)
            db = jnp.where(h2p > 0, gb, jnp.int16(0))
            dh = lax.bitcast_convert_type(db, jnp.bfloat16)
            acc[:] += mm_nt(dh, h1)
        elif variant == "scratch_roundtrip":
            # needs an extra scratch; handled by SCRATCH_EXTRA below
            raise RuntimeError("built via make_kernel_scratch")
        elif variant == "f32_dot":
            dh = jnp.where(h2p > 0, g, 0.0)                  # stays f32
            acc[:] += mm_nt(dh, h1.astype(jnp.float32))
        elif variant == "opt_barrier":
            dh = jnp.where(h2p > 0, g.astype(jnp.bfloat16), 0)
            dh = lax.optimization_barrier(dh)
            acc[:] += mm_nt(dh, h1)
        elif variant == "mask_from_f32":
            cond = (h2d + b2_ref[:].astype(jnp.float32)) > 0
            dh = jnp.where(cond, g, 0.0).astype(jnp.bfloat16)
            acc[:] += mm_nt(dh, h1)
        elif variant == "upcast_cmp":
            cond = h2p.astype(jnp.float32) > 0
            dh = jnp.where(cond, g, 0.0).astype(jnp.bfloat16)
            acc[:] += mm_nt(dh, h1)
        else:
            raise ValueError(variant)

        @pl.when(j == pl.num_programs(0) - 1)
        def _():
            out_ref[:] = acc[:]

    return kernel


def make_kernel_scratch():
    def kernel(obs_ref, g_ref, wt1_ref, b1_ref, wt2_ref, b2_ref,
               out_ref, acc, dh_scratch):
        j = pl.program_id(0)

        @pl.when(j == 0)
        def _():
            acc[:] = jnp.zeros_like(acc)

        wv = obs_ref[0]
        feats = _feats(wv)
        h1d = jnp.dot(wt1_ref[:], feats,
                      preferred_element_type=jnp.float32)
        h1p = h1d.astype(jnp.bfloat16) + b1_ref[:]
        h1 = jnp.maximum(h1p, 0)
        h2d = jnp.dot(wt2_ref[:], h1,
                      preferred_element_type=jnp.float32)
        h2p = h2d.astype(jnp.bfloat16) + b2_ref[:]
        g = g_ref[:]
        dh_scratch[:] = jnp.where(h2p > 0, g.astype(jnp.bfloat16), 0)
        dh = dh_scratch[:]
        acc[:] += lax.dot_general(
            dh, h1, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

        @pl.when(j == pl.num_programs(0) - 1)
        def _():
            out_ref[:] = acc[:]

    return kernel


def run_variant(variant: str) -> None:
    scratches = [pltpu.VMEM((H, H), jnp.float32)]
    if variant == "scratch_roundtrip":
        kernel = make_kernel_scratch()
        scratches.append(pltpu.VMEM((H, BT), jnp.bfloat16))
    else:
        kernel = make_kernel(variant)

    def f(obs, g, wt1, b1, wt2, b2):
        return pl.pallas_call(
            kernel,
            grid=(2,),
            in_specs=[
                pl.BlockSpec((1, V2, BT), lambda j: (j, 0, 0)),
                pl.BlockSpec((H, BT), lambda j: (0, 0)),
                pl.BlockSpec(wt1.shape, lambda j: (0, 0)),
                pl.BlockSpec(b1.shape, lambda j: (0, 0)),
                pl.BlockSpec(wt2.shape, lambda j: (0, 0)),
                pl.BlockSpec(b2.shape, lambda j: (0, 0)),
            ],
            out_specs=pl.BlockSpec((H, H), lambda j: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((H, H), jnp.float32),
            scratch_shapes=scratches,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
            ),
        )(obs, g, wt1, b1, wt2, b2)

    key = jax.random.PRNGKey(0)
    obs = jax.random.randint(key, (2, V2, BT), 0, 1 << 11, jnp.int32)
    g = jax.random.normal(key, (H, BT), jnp.float32)
    wt1 = jax.random.normal(key, (H, F), jnp.bfloat16) * 0.05
    b1 = jax.random.normal(key, (H, 1), jnp.bfloat16)
    wt2 = jax.random.normal(key, (H, H), jnp.bfloat16) * 0.05
    b2 = jax.random.normal(key, (H, 1), jnp.bfloat16)
    out = jax.jit(f)(obs, g, wt1, b1, wt2, b2)
    out.block_until_ready()
    print(f"OK {variant}: out_norm={float(jnp.linalg.norm(out)):.3f}")


def main() -> None:
    if len(sys.argv) > 1:
        run_variant(sys.argv[1])
        return
    results = {}
    for v in VARIANTS:
        proc = subprocess.run(
            [sys.executable, __file__, v],
            capture_output=True, text=True, timeout=420,
        )
        ok = proc.returncode == 0
        results[v] = "OK" if ok else f"CRASH (rc={proc.returncode})"
        tail = (proc.stdout + proc.stderr).strip().splitlines()
        tail = tail[-1] if tail else ""
        print(f"{v:20s} {results[v]:16s} {tail[:120]}")
    print()
    print({k: v for k, v in results.items()})


if __name__ == "__main__":
    main()
