"""Scenario-parallel Monte-Carlo on the 8-device virtual CPU mesh."""

import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mpc_sensorlessao_tpu.models import pipeline
from mpc_sensorlessao_tpu.parallel import mesh as mesh_lib
from mpc_sensorlessao_tpu.parallel import montecarlo
from mpc_sensorlessao_tpu.utils.config import reference_config


@pytest.fixture(scope="module")
def tiny_system():
    cfg = reference_config(resolution=32)
    cfg = cfg.replace(
        sim=dataclasses.replace(cfg.sim, n_train=150, n_valid=20, n_test=30),
        estimator=dataclasses.replace(cfg.estimator, resolution=32,
                                      crop_half=7),
        dm=dataclasses.replace(cfg.dm, n_act_side=8),
        zernike=dataclasses.replace(cfg.zernike, radial_order=4),
    )
    system = pipeline.build(cfg, jax.random.PRNGKey(0))
    return cfg, system


def test_mesh_helpers():
    assert len(jax.devices()) == 8
    m = mesh_lib.scenario_mesh()
    assert m.devices.size == 8
    assert mesh_lib.pad_to_devices(13, 8) == 16


def test_vmapped_scenario_batch(tiny_system):
    cfg, system = tiny_system
    scen = montecarlo.make_scenarios(
        cfg, jax.random.PRNGKey(1), 4,
        d_over_r0_grid=(2.0, 5.0), snr_db_grid=(5.0, 10.0, 20.0))
    out = montecarlo.run_batch(system.loop, system.layers, cfg, scen,
                               n_steps=8)
    assert out.rms_res.shape == (4, 8)
    assert np.isfinite(np.asarray(out.rms_res)).all()
    # different scenarios -> different trajectories
    r = np.asarray(out.rms_res)
    assert np.std(r[:, -1]) > 0


def test_sharded_monte_carlo_matches_local(tiny_system):
    cfg, system = tiny_system
    m = mesh_lib.scenario_mesh()
    scen = montecarlo.make_scenarios(cfg, jax.random.PRNGKey(2), 16)
    stats = montecarlo.run_sharded(system.loop, system.layers, cfg, scen,
                                   n_steps=8, mesh=m)
    assert float(stats.n_scenarios) == 16

    out = montecarlo.run_batch(system.loop, system.layers, cfg, scen,
                               n_steps=8)
    settle = montecarlo._settled_slice(8)
    local_mean = float(np.mean(np.asarray(out.rms_res)[:, settle:]))
    np.testing.assert_allclose(float(stats.mean_rms_res), local_mean,
                               rtol=1e-4)
    local_strehl = float(np.mean(np.asarray(out.strehl)[:, settle:]))
    np.testing.assert_allclose(float(stats.mean_strehl), local_strehl,
                               rtol=1e-4)


def test_multihost_global_scenario_assembly():
    """multihost.global_scenarios assembles process-local ScenarioBatch
    shards into a mesh-sharded global batch that run_sharded consumes
    (single-process simulation: global == local, the assembly/sharding
    path is identical)."""
    import dataclasses
    from mpc_sensorlessao_tpu.parallel import multihost
    from mpc_sensorlessao_tpu.parallel.mesh import (SCENARIO_AXIS,
                                                    scenario_mesh)

    multihost.initialize(None)          # no-op bootstrap path
    cfg = reference_config(resolution=32)
    cfg = cfg.replace(sim=dataclasses.replace(
        cfg.sim, n_train=120, n_valid=30, n_test=6))
    system = pipeline.build(cfg, jax.random.PRNGKey(0))
    m = scenario_mesh()
    n = 2 * m.devices.size
    local = montecarlo.make_scenarios(cfg, jax.random.PRNGKey(1), n)
    gscen = multihost.global_scenarios(local, m)
    # sharded over the scenario axis of the mesh
    assert gscen.start_step.shape[0] == n * jax.process_count()
    assert gscen.start_step.sharding.spec[0] == SCENARIO_AXIS
    stats = montecarlo.run_sharded(system.loop, system.layers, cfg, gscen,
                                   n_steps=6, mesh=m)
    assert int(stats.n_scenarios) == n
    assert np.isfinite(float(stats.mean_rms_res))


def test_sharded_stats_contain_diverged_scenarios():
    """A poisoned scenario (non-finite magnification -> NaN telemetry)
    must be counted in n_diverged and excluded from the psum means
    instead of turning the whole shard's statistics to NaN."""
    import dataclasses
    from mpc_sensorlessao_tpu.parallel.mesh import scenario_mesh

    cfg = reference_config(resolution=32)
    cfg = cfg.replace(sim=dataclasses.replace(
        cfg.sim, n_train=120, n_valid=30, n_test=8))
    system = pipeline.build(cfg, jax.random.PRNGKey(0))
    m = scenario_mesh()
    n = 2 * m.devices.size
    scen = montecarlo.make_scenarios(cfg, jax.random.PRNGKey(1), n)
    bad_mag = scen.mag.at[0].set(jnp.nan)
    scen = scen._replace(mag=bad_mag)
    stats = montecarlo.run_sharded(system.loop, system.layers, cfg, scen,
                                   n_steps=8, mesh=m)
    assert int(stats.n_diverged) >= 1
    assert int(stats.n_scenarios) + int(stats.n_diverged) == n
    assert np.isfinite(float(stats.mean_rms_res))
    assert float(stats.mean_rms_res) < 10.0


def test_shared_window_batch_matches_batched_path():
    """run_batch(shared_window=True) must reproduce the fully-batched
    trajectories exactly when every scenario shares the start step."""
    import dataclasses
    cfg = reference_config(resolution=32)
    cfg = cfg.replace(sim=dataclasses.replace(
        cfg.sim, n_train=120, n_valid=30, n_test=6))
    system = pipeline.build(cfg, jax.random.PRNGKey(0))
    scen = montecarlo.make_scenarios(cfg, jax.random.PRNGKey(1), 4,
                                     d_over_r0_grid=(5.0, 10.0))
    a = montecarlo.run_batch(system.loop, system.layers, cfg, scen,
                             n_steps=6)
    b = montecarlo.run_batch(system.loop, system.layers, cfg, scen,
                             n_steps=6, shared_window=True)
    np.testing.assert_allclose(np.asarray(a.rms_res),
                               np.asarray(b.rms_res), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(a.u), np.asarray(b.u),
                               atol=1e-5)


def test_shared_window_traced_unverified_raises():
    """shared_window=True with TRACED start_steps must refuse loudly:
    a silent fall-through would replay start_step[0] for every scenario
    (ADVICE r4 -- was a warning, now a ValueError)."""
    import dataclasses
    cfg = reference_config(resolution=32)
    cfg = cfg.replace(sim=dataclasses.replace(
        cfg.sim, n_train=120, n_valid=30, n_test=4))
    system = pipeline.build(cfg, jax.random.PRNGKey(0))
    scen = montecarlo.make_scenarios(cfg, jax.random.PRNGKey(1), 2)

    @jax.jit
    def run(s):
        return montecarlo.run_batch(system.loop, system.layers, cfg, s,
                                    n_steps=4, shared_window=True)

    with pytest.raises(ValueError, match="traced"):
        run(scen)

    # ... and the explicit escape hatch still works
    montecarlo.assert_shared_window(scen)

    @jax.jit
    def run_ok(s):
        return montecarlo.run_batch(system.loop, system.layers, cfg, s,
                                    n_steps=4,
                                    shared_window="verified").rms_res

    assert np.isfinite(np.asarray(run_ok(scen))).all()


def test_tensor_parallel_estimator_matches_unsharded():
    """p-dimension sharded estimate + Gauss-Newton normal equations ==
    the single-device results (tensor-parallel axis, parallel/
    estimator_tp.py)."""
    from mpc_sensorlessao_tpu.parallel import estimator_tp as tp

    rng = np.random.default_rng(0)
    nx, p, B = 27, 2883, 5
    S = jnp.asarray(rng.normal(size=(nx, p)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(p,)), jnp.float32)
    y = jnp.asarray(rng.normal(size=(B, p)), jnp.float32)
    m = tp.tp_mesh()
    out = np.asarray(tp.sharded_estimate(S, b, y, m))
    ref = np.asarray((y - b) @ S.T)
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)

    A = jnp.asarray(rng.normal(size=(p, nx)), jnp.float32)
    yr = jnp.asarray(rng.normal(size=(p,)), jnp.float32)
    G, g = tp.sharded_normal_equations(A, yr, m)
    np.testing.assert_allclose(np.asarray(G), np.asarray(A.T @ A),
                               rtol=5e-4, atol=5e-3)
    np.testing.assert_allclose(np.asarray(g), np.asarray(yr @ A),
                               rtol=5e-4, atol=5e-3)
