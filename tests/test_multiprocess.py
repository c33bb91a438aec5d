"""True multi-process jax.distributed test: two CPU processes, a localhost
coordinator, 4 virtual devices each -> a global 8-device mesh, and the
landmark-sharded BA schedule running across BOTH processes with its psum
riding the cross-process collective fabric. Proves utils/dist.py +
ba/schedule.py's shard_map path work beyond single-process simulation
(SURVEY.md §7 step 7).

Each worker (tools/mp_ba_worker.py) checks the sharded result against the
single-device schedule and prints MP_OK.

Skippable via SVS_SKIP_MP=1 (e.g. sandboxes without localhost sockets).
"""

import os
import socket
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tools", "mp_ba_worker.py")


@pytest.mark.skipif(
    os.environ.get("SVS_SKIP_MP") == "1",
    reason="multi-process test disabled via SVS_SKIP_MP",
)
def test_two_process_distributed_ba():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"

    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # worker sets its own device count
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")

    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, coord, str(pid), "2"],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
            cwd=REPO,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
        assert "MP_OK" in out, f"worker {pid} missing MP_OK:\n{out}"
