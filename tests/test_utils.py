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


# ------------------ gridtools (utilities.m grab-bag parity) ---------------

def test_gridtools_roundtrips_and_formulas():
    import numpy as np
    import jax.numpy as jnp
    from mpc_sensorlessao_tpu.utils import gridtools as gt

    # mean_sub: zero in-mask mean, outside untouched
    rng = np.random.default_rng(0)
    d = jnp.asarray(rng.normal(size=(3, 8, 8)), jnp.float32)
    m = np.zeros((8, 8), bool); m[2:6, 2:6] = True
    out = np.asarray(gt.mean_sub(d, m))
    assert np.abs(out[:, m].mean(axis=1)).max() < 1e-6
    np.testing.assert_allclose(out[:, ~m], np.asarray(d)[:, ~m])

    # toggle_frame roundtrip
    cube = jnp.asarray(rng.normal(size=(6, 6, 4)), jnp.float32)
    flat = gt.toggle_frame(cube, 2)
    assert flat.shape == (36, 4)
    np.testing.assert_allclose(np.asarray(gt.toggle_frame(flat, 3)),
                               np.asarray(cube))

    # rearrange covers every index exactly once
    idx = gt.rearrange((8, 8), (4, 4))
    assert idx.shape == (16, 4)
    assert sorted(idx.ravel().tolist()) == list(range(64))

    # defocus distance <-> focus coefficient inverse pair
    a4 = 3.0
    dz = gt.defocus_distance(a4, 0.2, 0.01, 532e-9)
    back = gt.out_of_focus(dz, 0.2, 0.01, 532e-9)
    assert abs(back - a4) < 1e-9 * abs(a4) + 1e-12

    # fitting error decreases with actuator count, scales (D/r0)^(5/3)
    f1 = gt.fitting_error_variance(1.0, 0.2, 42.0, 100)
    f2 = gt.fitting_error_variance(1.0, 0.2, 42.0, 400)
    assert f2 < f1
    r = (gt.fitting_error_variance(1.0, 0.1, 42.0, 100) / f1)
    assert abs(r - 2 ** (5.0 / 3.0)) < 1e-6

    # gram_schmidt orthonormal
    Q = gt.gram_schmidt(rng.normal(size=(10, 4)))
    np.testing.assert_allclose(Q.T @ Q, np.eye(4), atol=1e-10)

    # point-ahead angle ~ 2 v_orb h / c, tiny positive
    pa = gt.point_ahead_angle(90e3)
    assert 0 < pa < 1e-3
