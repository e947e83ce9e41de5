"""Real multi-process jax.distributed regression (SURVEY.md 5.8).

Launches benchmarks/multiprocess_cpu.py in driver mode: 2 actual
processes x 2 CPU devices over localhost Gloo, psum across process
boundaries, statistics asserted against the single-process run (the
driver exits nonzero on mismatch).  Slow: three pipeline builds in
subprocesses.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_two_process_distributed_stats_match(tmp_path):
    out = os.path.join(tmp_path, "mp.json")
    env = dict(os.environ)
    env.update(MP_RES="64", MP_STEPS="6", MP_SPD="1", MP_DPP="2",
               MP_NPROC="2", MP_PORT="9941")
    # the driver re-execs itself; it must not inherit the test session's
    # already-initialized jax -- subprocess isolation handles that
    r = subprocess.run(
        [sys.executable, "benchmarks/multiprocess_cpu.py", out],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    report = json.load(open(out))
    assert report["ok"] is True
    assert report["num_processes"] == 2
    assert report["max_rel_delta"] < 1e-4
