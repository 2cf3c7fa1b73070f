"""True multi-process mesh test: 2 processes x 4 CPU devices, hybrid
DCN(data) x ICI(model) mesh (parallel/multihost.py), collectives crossing a
real process boundary via JAX's gloo transport.

The reference never tests multi-node at all (single-node torchrun
--standalone, SURVEY.md §4); this gates the scale-out path the TPU build adds
(SURVEY.md §7 M6) without TPU pod hardware.
"""

import os
import socket
import subprocess
import sys

WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_hybrid_mesh_matches_single_device():
    port = _free_port()
    env = os.environ.copy()
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env.pop("MAGICDEC_TEST_TPU", None)
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(pid), "2", str(port)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True)
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=600)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
        assert f"MULTIHOST_OK pid={pid}" in out, out
