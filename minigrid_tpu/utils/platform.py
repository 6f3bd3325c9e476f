"""Backend capability probes.

The engines pick between a Pallas/Mosaic kernel path and a packed XLA
twin. Selecting by the backend NAME (`jax.default_backend() == "tpu"`)
is fragile — experimental TPU plugins/tunnels can register under other
platform names, and XLA:CPU nowadays compiles Mosaic kernels through an
interpreter (which "works" orders of magnitude slower). Probe the actual
capability instead: a TPU device must be attached AND a trivial kernel
must lower via Mosaic and compile.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_MOSAIC_OK: bool | None = None


def mosaic_available(verbose: bool = True) -> bool:
    """True iff a trivial Pallas TPU kernel actually compiles on the
    default backend AND a TPU device is attached. Cached after the first
    call (the probe compile costs ~1 s on a tunneled backend)."""
    global _MOSAIC_OK
    if _MOSAIC_OK is not None:
        return _MOSAIC_OK
    try:
        devs = jax.devices()
        has_tpu = any(
            d.platform == "tpu" or "tpu" in d.device_kind.lower()
            for d in devs
        )
        if not has_tpu:
            if verbose:
                print(
                    "# mosaic_available: no TPU device attached (backend "
                    f"{jax.default_backend()!r}, devices "
                    f"{[d.device_kind for d in devs]!r}); kernel path off."
                )
            _MOSAIC_OK = False
            return False

        from jax.experimental import pallas as pl

        def _probe_kernel(x_ref, o_ref):
            o_ref[...] = x_ref[...] + 1

        f = pl.pallas_call(
            _probe_kernel,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
        )
        x = jnp.zeros((8, 128), jnp.int32)
        lowered = jax.jit(f).lower(x)
        if "tpu_custom_call" not in lowered.as_text():
            raise RuntimeError("probe kernel did not lower via Mosaic")
        lowered.compile()
        _MOSAIC_OK = True
    except Exception as e:  # noqa: BLE001 — any failure means "no kernel path"
        if verbose:
            print(
                "# WARNING: Pallas/Mosaic probe FAILED on backend "
                f"{jax.default_backend()!r} ({type(e).__name__}: {e}); "
                "falling back to the packed XLA engine (~2.5x slower than "
                "the kernel path on TPU)."
            )
        _MOSAIC_OK = False
    return _MOSAIC_OK
