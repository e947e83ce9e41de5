"""Smoke test: the examples stay runnable (bitrot guard)."""

import subprocess
import sys


def test_wfs_demo_runs():
    out = subprocess.run(
        [sys.executable, "examples/wfs_demo.py"],
        capture_output=True, text=True, timeout=420, cwd=".")
    assert out.returncode == 0, out.stderr[-2000:]
    assert "tomography" in out.stdout


def test_mcao_demo_runs():
    out = subprocess.run(
        [sys.executable, "examples/mcao_demo.py"],
        capture_output=True, text=True, timeout=420, cwd=".")
    assert out.returncode == 0, out.stderr[-2000:]
    assert "2 DM" in out.stdout and "Monte-Carlo" in out.stdout


def test_horizon_sweep_demo_runs():
    out = subprocess.run(
        [sys.executable, "examples/horizon_sweep_demo.py"],
        capture_output=True, text=True, timeout=600, cwd=".")
    assert out.returncode == 0, out.stderr[-2000:]
    assert "rejection" in out.stdout
