"""Aux subsystems: metrics, logbook, profiling, checkpoint."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from mpc_sensorlessao_tpu.models.closed_loop import StepOutputs
from mpc_sensorlessao_tpu.utils import checkpoint, logbook, metrics, profiling
from mpc_sensorlessao_tpu.utils.config import SystemConfig


def _fake_outputs(S=3, T=10):
    rng = np.random.default_rng(0)
    f = lambda *shape: jnp.asarray(rng.uniform(0.1, 1.0, shape), jnp.float32)
    return StepOutputs(
        u=f(S, T, 4), du=f(S, T, 4), volts=f(S, T, 4), x_est=f(S, T, 5),
        x_est_norm=f(S, T), x_pred_norm=f(S, T), cost=f(S, T),
        rms_res=f(S, T) * 0.2, rms_turb=f(S, T), strehl=f(S, T),
    )


def test_metrics_summarize():
    out = _fake_outputs()
    s = metrics.summarize(out)
    d = metrics.to_dict(s)
    assert 0 < d["mean_rms_res"] < 0.3
    assert d["rejection"] > 1.0
    assert set(d) == set(metrics.LoopSummary._fields)


def test_logbook_capture():
    with logbook.capture() as entries:
        logbook.add("turb", "screen synthesized")
        logbook.add("solver", "1 newton step", level="debug")
    tail = entries()
    assert len(tail) == 2
    assert tail[0][2] == "turb"


def test_roofline_on_matmul():
    a = jnp.ones((256, 256))
    rep = profiling.roofline(lambda x: x @ x, a, repeats=2)
    assert rep.wall_s > 0
    assert rep.flops > 2 * 256**3 * 0.5
    assert rep.bound in ("compute", "memory")
    assert "TFLOP" in str(rep)


def test_checkpoint_round_trip(tmp_path):
    tree = {"a": jnp.arange(5.0), "b": {"c": jnp.ones((3, 3))}}
    cfg = SystemConfig()
    checkpoint.save(str(tmp_path / "ck"), tree, config=cfg)
    restored = checkpoint.restore(str(tmp_path / "ck"), tree)
    np.testing.assert_array_equal(np.asarray(restored["a"]),
                                  np.arange(5.0))
    d = checkpoint.load_config_dict(str(tmp_path / "ck"))
    assert d["mpc"]["horizon"] == 2
