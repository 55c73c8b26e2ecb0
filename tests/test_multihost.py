"""Multi-host (multi-controller) DCN correctness as a SUITE test
(VERDICT r4 #8 — `scripts/demo_multihost.py` was manually-run and could
rot). Spawns the demo's orchestrator: two worker processes x 4 virtual
CPU devices joined via `jax.distributed.initialize` into one 8-device
global mesh, each feeding only its addressable batch shards, result
allgathered and CRC-compared against an independent single-process
evaluation. Skips cleanly where the distributed runtime can't start."""

import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.watchdog_scale(6)
def test_multihost_two_process_crc_match():
    # a free port per attempt: the probe socket closes before the
    # coordinator binds (TOCTOU), so a bind collision retries with a
    # fresh port instead of flaking (r5 review)
    blob = ""
    for attempt in range(3):
        s = socket.socket()
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
        s.close()
        env = dict(os.environ, KANTER_MULTIHOST_COORD=f"127.0.0.1:{port}")
        # workers force the CPU platform themselves (jax.config.update)
        proc = subprocess.run(
            [sys.executable,
             os.path.join(REPO, "scripts", "demo_multihost.py")],
            capture_output=True, text=True, timeout=600, env=env, cwd=REPO,
        )
        blob = proc.stdout + proc.stderr
        if proc.returncode != 0 and (
            "address already in use" in blob.lower()
            or "address in use" in blob.lower()
        ):
            continue
        break
    if proc.returncode != 0 and (
        "Unable to initialize backend" in blob
        or "DEADLINE_EXCEEDED" in blob
        or "failed to connect" in blob.lower()
    ):
        pytest.skip(f"distributed runtime unavailable: {blob[-300:]}")
    assert proc.returncode == 0, blob[-2000:]
    assert "MULTIHOST OK" in proc.stdout
