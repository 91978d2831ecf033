"""Multi-host as an EXERCISED capability (VERDICT round 2, item #6;
SURVEY.md section 4 'distributed tests without a cluster').

Spawns 2 real OS processes, each with 4 virtual CPU devices, joined by
jax.distributed.initialize over a localhost coordinator with gloo CPU
collectives standing in for ICI/DCN. The worker
(scripts/multihost_worker.py) renders over a global ("tile", "sample")
mesh spanning both processes -- the tile axis crosses the host boundary --
and asserts the gathered image equals the single-process render, then runs
one cross-process inverse-rendering train step (full-mesh gradient psum).
"""

import json
import os
import socket
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(ROOT, "scripts", "multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_render_matches_single_process(tmp_path):
    port = _free_port()
    out = str(tmp_path / "result.json")
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    # the workers size their own device count; don't inherit the suite's
    env.pop("XLA_FLAGS", None)

    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(pid), "2", str(port), out],
            env=env, cwd=ROOT,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for pid in range(2)
    ]
    outs = [p.communicate(timeout=540) for p in procs]
    for p, (stdout, stderr) in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{stderr[-3000:]}"

    with open(out) as f:
        result = json.load(f)
    assert result["process_count"] == 2
    assert result["global_devices"] == 8
    assert result["albedo_finite"]
    assert result["ok"], result
    assert result["max_abs_err"] < 2e-5
