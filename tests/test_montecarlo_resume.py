"""Kill-and-resume of the checkpointed Monte-Carlo sweep (SURVEY 5.4).

Runs benchmarks/montecarlo_100k.py three ways at toy scale on CPU:
uninterrupted (A), killed after one chunk via MC1_STOP_AFTER (B1), and
resumed with --resume (B2).  The per-chunk PRNG keys derive from the
chunk index only, so the resumed sweep must reproduce the uninterrupted
one bit-identically (checkpoint summary tensors compared exactly).
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH = os.path.join(ROOT, "benchmarks", "montecarlo_100k.py")


def _run(out, ckpt, extra_env=None, args=(), expect_rc=0):
    env = dict(os.environ)
    env.update({
        "MC1_CPU": "1", "MC1_DR0": "5,10", "MC1_SNR": "10,20",
        "MC1_REPS": "4", "MC1_CHUNK": "2", "MC1_STEPS": "5",
        "MC1_CKPT": ckpt, "JAX_PLATFORMS": "cpu",
    })
    env.pop("PYTEST_CURRENT_TEST", None)
    env.update(extra_env or {})
    r = subprocess.run(
        [sys.executable, BENCH, "32", out, *args],
        capture_output=True, text=True, timeout=900, env=env, cwd=ROOT)
    assert r.returncode == expect_rc, (r.returncode, r.stderr[-3000:])
    return r


@pytest.mark.slow
def test_interrupted_sweep_resumes_bit_identically(tmp_path):
    from mpc_sensorlessao_tpu.utils import checkpoint

    out_a = str(tmp_path / "a.json")
    out_b = str(tmp_path / "b.json")
    ck_a = str(tmp_path / "ck_a")
    ck_b = str(tmp_path / "ck_b")

    # A: uninterrupted
    _run(out_a, ck_a)
    # B: killed after 1 of 4 chunks, then resumed
    _run(out_b, ck_b, extra_env={"MC1_STOP_AFTER": "1"}, expect_rc=3)
    assert not os.path.exists(out_b)          # died before the report
    _run(out_b, ck_b, args=("--resume",))

    with open(out_a) as f:
        rep_a = json.load(f)
    with open(out_b) as f:
        rep_b = json.load(f)
    assert rep_b["resumed_at_cursor"] == 1
    assert rep_a["cells"] == rep_b["cells"]

    like = {"summaries": np.zeros((2, 2, 3, 4), np.float32),
            "cursor": np.zeros((), np.int64)}
    st_a = checkpoint.restore(ck_a, like)
    st_b = checkpoint.restore(ck_b, like)
    np.testing.assert_array_equal(np.asarray(st_a["summaries"]),
                                  np.asarray(st_b["summaries"]))
    assert int(st_a["cursor"]) == int(st_b["cursor"]) == 4
