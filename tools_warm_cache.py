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

import os
import subprocess
import sys

MAX_ATTEMPTS = 12


def main() -> int:
    env = dict(os.environ, MGTPU_CACHE_WRITE="1")
    args = sys.argv[1:] or ["tests/"]
    for attempt in range(1, MAX_ATTEMPTS + 1):
        print(f"[warm_cache] attempt {attempt}", flush=True)
        proc = subprocess.run(
            [sys.executable, "-m", "pytest", *args, "-q", "-p", "no:cacheprovider"],
            env=env,
        )
        if proc.returncode == 0:
            print("[warm_cache] suite green, cache warm")
            return 0
        if proc.returncode in (-11, 139, 134, -6):
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
