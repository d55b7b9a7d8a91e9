"""Multi-host exercise: a real 2-process `jax.distributed` run.

Closes the reference's multi-node capability (launcher + gloo object
collectives, `/root/reference/yolox/core/launch.py:39-147` +
`yolox/utils/dist.py:68-267`) with an actually-executed equivalent:
two coordinator-connected processes, 4 virtual CPU devices each, one
global 8-device mesh, object all_gather / gather / shared seed /
barrier, and a jit-compiled cross-process reduction over a
`shard_batch`-stitched global batch (see tests/_multihost_child.py).
"""

import os
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CHILD = os.path.join(REPO, "tests", "_multihost_child.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_distributed_mesh():
    port = _free_port()
    coordinator = f"127.0.0.1:{port}"
    n = 2

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    flags = " ".join(
        f for f in env.get("XLA_FLAGS", "").split()
        if not f.startswith("--xla_force_host_platform_device_count")
    )
    env["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=4"
    ).strip()
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    # distinct per-process compile caches: concurrent writers to one dir
    # race on rename; keep the test hermetic instead
    env.pop("JAX_COMPILATION_CACHE_DIR", None)

    procs = [
        subprocess.Popen(
            [sys.executable, CHILD, coordinator, str(n), str(i)],
            env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for i in range(n)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {i} failed:\n{out[-4000:]}"
        assert f"MULTIHOST_CHILD_OK rank={i}" in out, out[-2000:]
