"""Two-process `jax.distributed` smoke: parallel/distributed.py exercised
across real OS processes (localhost coordinator, 4 virtual CPU devices per
process → an 8-device global mesh), not just the single-process virtual
mesh the rest of the suite uses.
"""

import os
import socket
import subprocess
import sys
from pathlib import Path

WORKER = Path(__file__).parent / "distributed_worker.py"
REPO = WORKER.parent.parent


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_global_mesh_rollout():
    port = _free_port()
    procs = [
        subprocess.Popen(
            [sys.executable, str(WORKER), str(port), str(pid), "2"],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
            cwd=str(REPO),
            env={
                **os.environ,
                "PYTHONPATH": str(REPO)
                + os.pathsep
                + os.environ.get("PYTHONPATH", ""),
            },
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"worker failed:\n{err[-3000:]}"
        outs.append(out)

    metrics = []
    for out in outs:
        lines = [l for l in out.splitlines() if l.startswith("METRICS ")]
        assert lines, out
        metrics.append(tuple(int(x) for x in lines[-1].split()[1:]))

    # psum'd metrics must agree across processes, and total_steps must be
    # the GLOBAL batch (16 envs/device × 8 devices) × 8 steps.
    assert metrics[0] == metrics[1]
    assert metrics[0][0] == 16 * 8 * 8
