"""Warm the persistent XLA compile cache for the test suite.

XLA CPU's `executable.serialize()` (used only when *writing* a persistent
cache entry) segfaults sporadically in long-running processes on this
jaxlib build. `tests/conftest.py` therefore disables cache writes by
default. This script enables writes (MGTPU_CACHE_WRITE=1) and loops pytest
until a run completes without crashing — every crashed attempt still makes
forward progress because entries written before the crash persist.

Usage: python tools_warm_cache.py [extra pytest args...]
"""

from __future__ import annotations

import hashlib
import os
import subprocess
import sys

MAX_ATTEMPTS = 12

CACHE_DIR = "/tmp/jax_cache"


def source_manifest(root: str = ".") -> str:
    """Content hash of everything whose change can invalidate compiled
    programs (package + tests). Written to the cache dir on a successful
    warm; tests/conftest.py compares it and warns when the cache is
    stale (VERDICT r4 #8: cold suites silently cost ~50 min vs ~13)."""
    h = hashlib.sha256()
    for base in ("minigrid_tpu", "tests"):
        for dirpath, _, files in sorted(os.walk(os.path.join(root, base))):
            for f in sorted(files):
                if f.endswith(".py"):
                    path = os.path.join(dirpath, f)
                    h.update(path.encode())
                    with open(path, "rb") as fh:
                        h.update(fh.read())
    return h.hexdigest()


def main() -> int:
    env = dict(os.environ, MGTPU_CACHE_WRITE="1")
    args = sys.argv[1:] or ["tests/"]
    for attempt in range(1, MAX_ATTEMPTS + 1):
        print(f"[warm_cache] attempt {attempt}", flush=True)
        proc = subprocess.run(
            [sys.executable, "-m", "pytest", *args, "-q", "-p", "no:cacheprovider"],
            env=env, capture_output=True, text=True,
        )
        sys.stdout.write(proc.stdout[-4000:])
        sys.stderr.write(proc.stderr[-2000:])
        if proc.returncode == 0:
            os.makedirs(CACHE_DIR, exist_ok=True)
            with open(os.path.join(CACHE_DIR, "MANIFEST"), "w") as fh:
                fh.write(source_manifest())
            print("[warm_cache] suite green, cache warm (manifest stamped)")
            return 0
        # A segfaulting xdist WORKER surfaces as rc=1 with a "node down"
        # marker (the serialize crash this script exists for), not as a
        # signal exit code — treat it as a crash and retry.
        crashed = proc.returncode in (-11, 139, 134, -6) or (
            "node down: Not properly terminated" in proc.stdout
            or "node down: Not properly terminated" in proc.stderr
        )
        if crashed:
            print(f"[warm_cache] crashed (rc={proc.returncode}); retrying — "
                  "entries written so far persist")
            continue
        print(f"[warm_cache] pytest failed (rc={proc.returncode}) — real test "
              "failure, not a cache crash; stopping")
        return proc.returncode
    print("[warm_cache] gave up after MAX_ATTEMPTS")
    return 1


if __name__ == "__main__":
    raise SystemExit(main())
