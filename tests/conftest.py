"""Test harness config: run everything on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding correctness is
validated on XLA's host-platform device emulation, which exercises the same
GSPMD partitioner and collectives.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

# Persistent compilation cache: XLA CPU compile time dominates the suite's
# wall-clock; cache compiled programs across test runs.
#
# Cache READS are always on; cache WRITES are off by default because XLA
# CPU's `executable.serialize()` (called only on the write path) segfaults
# sporadically in long-running processes on this jaxlib (observed repeatedly
# under the full suite; never on the read path). Warm the cache with
# `python tools_warm_cache.py` (sets MGTPU_CACHE_WRITE=1 and loops pytest
# until clean); normal runs then hit the cache without ever serializing.
_WRITE = os.environ.get("MGTPU_CACHE_WRITE", "0") == "1"

# The environment's TPU plugin may force `jax_platforms` via
# `jax.config.update` at interpreter startup (sitecustomize), which beats
# the env var — override it back after import so tests really run on the
# 8-device CPU mesh and never contend for the real chip.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update(
    "jax_persistent_cache_min_compile_time_secs", 0.1 if _WRITE else 1e9
)

# Cache-staleness notice: a cold suite costs ~50 min on this box vs ~13
# warm. tools_warm_cache.py stamps /tmp/jax_cache/MANIFEST with a source
# hash after a successful warming run; warn (once, in the controller
# process) when the sources have drifted since.
if os.environ.get("PYTEST_XDIST_WORKER") is None:
    try:
        import pathlib
        import sys

        sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
        from tools_warm_cache import source_manifest

        _m = pathlib.Path("/tmp/jax_cache/MANIFEST")
        _repo = pathlib.Path(__file__).resolve().parent.parent
        if not _m.exists() or _m.read_text() != source_manifest(str(_repo)):
            print(
                "[conftest] NOTE: the persistent compile cache was warmed "
                "for a DIFFERENT source state (or never) — this run will "
                "pay cold XLA compiles (~50 min vs ~13 warm). Run "
                "`python tools_warm_cache.py` to re-warm.",
                flush=True,
            )
    except Exception:
        pass
