"""CLI surface smoke tests (subprocess, CPU platform)."""

import json
import os
import subprocess
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent


def run_cli(args, timeout=600):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    return subprocess.run(
        [sys.executable, str(REPO / "tools" / "cli.py"), *args],
        capture_output=True, text=True, timeout=timeout, env=env, cwd=REPO,
    )


def test_cli_vo_mode(tmp_path):
    out = tmp_path / "traj.txt"
    r = run_cli([
        "-c", "configs", "-v", "tests/data/images", "-o", str(out),
        "--batch-size", "5", "--stats",
    ])
    assert r.returncode == 0, r.stderr[-2000:]
    stats = json.loads(r.stdout.strip().splitlines()[-1])
    assert stats["frames"] == 10
    assert stats["pose_ok"] == 9
    traj = np.loadtxt(out)
    assert traj.shape == (10, 12)


def test_cli_missing_args():
    r = run_cli([])
    assert r.returncode != 0
    assert "required" in r.stderr.lower()


def test_cli_bad_stream():
    r = run_cli(["-c", "configs", "-v", "/nonexistent/dir", "-o", "/tmp/x.txt"])
    assert r.returncode != 0
