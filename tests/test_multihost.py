"""Two-process jax.distributed run on CPU (the multi-HOST axis).

Spawns two worker processes, each with 4 virtual CPU devices, joined by
jax.distributed.initialize into one 8-device (dp, shard) mesh; each runs the
distributed chunk step and verifies the merged outputs bit-match the
single-device step (rawhash_tpu/parallel/multihost.py --selftest).
"""

import os
import socket
import subprocess
import sys

import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_distributed_selftest():
    port = _free_port()
    env = dict(
        os.environ,
        PYTHONPATH=REPO_ROOT,
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=4",
    )
    procs = [
        subprocess.Popen(
            [
                sys.executable, "-m", "rawhash_tpu.parallel.multihost",
                "--coordinator", f"localhost:{port}",
                "--num-processes", "2", "--process-id", str(i),
                "--n-shards", "2", "--selftest",
            ],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append((p.returncode, out, err))
    for i, (rc, out, err) in enumerate(outs):
        assert rc == 0, f"process {i} rc={rc}\nstdout:{out}\nstderr:{err[-2000:]}"
        assert f"MULTIHOST_OK process={i}" in out, (out, err[-2000:])
