"""Conditional-Gaussian frozen-flow tests (reference parity path,
telescopeAbstract.m:823-901)."""

import dataclasses
import math

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mpc_sensorlessao_tpu.ops import edge_flow, phase_stats
from mpc_sensorlessao_tpu.utils.config import (AtmosphereConfig,
                                               TelescopeConfig,
                                               reference_config)

ATM1 = AtmosphereConfig(fractional_r0=(1.0,), altitudes=(0.0,),
                        wind_speeds=(8.0,), wind_directions=(0.0,),
                        flow="conditional")
TEL32 = TelescopeConfig(resolution=32)


def test_extension_operators_consistent():
    """A = Cov(X,Z) Cov(Z,Z)^-1 and Bc Bc' = Cov(X|Z)
    (telescopeAbstract.m:863-884)."""
    n, pitch = 16, 1 / 15
    A, Bc = edge_flow.extension_operators(ATM1, n, pitch)
    outer_idx, inner_idx = edge_flow._ring_masks(n)
    assert A.shape == (len(outer_idx), len(inner_idx))

    u = np.arange(n + 2) * pitch
    cc, rr = np.meshgrid(u, u, indexing="xy")
    pts_frame = (cc + 1j * rr).ravel()
    pts_phase = pts_frame.reshape(n + 2, n + 2)[1:-1, 1:-1].ravel()
    Zp, Xp = pts_phase[inner_idx], pts_frame[outer_idx]
    ZZt = phase_stats.covariance_matrix(Zp, Zp, ATM1)
    ZXt = phase_stats.covariance_matrix(Zp, Xp, ATM1)
    XXt = phase_stats.covariance_matrix(Xp, Xp, ATM1)

    # regression identity A ZZt = XZt
    np.testing.assert_allclose(A @ ZZt, ZXt.T, rtol=1e-6, atol=1e-8)
    # factor reproduces the conditional covariance
    cond = XXt - A @ ZXt
    np.testing.assert_allclose(Bc @ Bc.T, cond, atol=1e-6)
    # conditioning shrinks the variance
    assert np.all(np.diag(cond) < np.diag(XXt))
    assert np.all(np.diag(cond) >= -1e-9)


def test_conditional_sampling_joint_covariance():
    """X = A Z + B eps with exact Z draws reproduces the joint analytic
    covariance blocks empirically."""
    n, pitch = 12, 1 / 11
    A, Bc = edge_flow.extension_operators(ATM1, n, pitch)
    outer_idx, inner_idx = edge_flow._ring_masks(n)
    u = np.arange(n + 2) * pitch
    cc, rr = np.meshgrid(u, u, indexing="xy")
    pts_frame = (cc + 1j * rr).ravel()
    pts_phase = pts_frame.reshape(n + 2, n + 2)[1:-1, 1:-1].ravel()
    Zp, Xp = pts_phase[inner_idx], pts_frame[outer_idx]
    ZZt = phase_stats.covariance_matrix(Zp, Zp, ATM1)
    ZXt = phase_stats.covariance_matrix(Zp, Xp, ATM1)

    rng = np.random.default_rng(0)
    Lz = np.linalg.cholesky(ZZt + 1e-10 * np.eye(len(Zp)))
    ns = 3000
    Z = (Lz @ rng.standard_normal((len(Zp), ns)))
    X = A @ Z + Bc @ rng.standard_normal((Bc.shape[1], ns))
    emp_XZ = X @ Z.T / ns
    scale = np.abs(ZXt).max()
    assert np.abs(emp_XZ - ZXt.T).max() / scale < 0.15


def _evolve(seed, n_steps, tel=TEL32, atm=ATM1):
    model, state = edge_flow.build(seed, atm, tel)
    key = jax.random.PRNGKey(seed)

    @jax.jit
    def run(state):
        def step(st, idx):
            st, ph = edge_flow.advance(model, st, idx, key)
            return st, ph
        return jax.lax.scan(step, state, jnp.arange(n_steps))

    final, phases = run(state)
    return model, np.asarray(phases)


def test_screen_translates_with_wind():
    """Frozen flow: the screen content moves along the wind; overlapping
    regions of consecutive steps stay strongly correlated."""
    model, phases = _evolve(3, 12)
    (sy, sx) = model.step_px[0]
    assert sy == 0.0 and sx > 1.0        # fast-wind regime, +col direction
    d = int(round(sx))
    a, b = phases[5], phases[6]
    # content moved by ~d px toward +x: b[:, d:] ~ a[:, :-d]
    ov_new = b[:, d:]
    ov_old = a[:, :-d]
    cc = np.corrcoef(ov_new.ravel(), ov_old.ravel())[0, 1]
    assert cc > 0.98, cc


def test_evolved_screen_statistics():
    """After many steps (screen fully regenerated through the border),
    spatial structure function still follows Von Karman analytics."""
    n = TEL32.resolution
    stack = []
    for seed in range(6):
        _, phases = _evolve(seed, 40)
        stack.append(phases[-8:])        # fully refreshed screens
    scr = np.concatenate(stack)          # (48, n, n)
    pitch = TEL32.pixel_pitch
    for sep in (3, 8):
        d_emp = np.mean((scr[:, :, sep:] - scr[:, :, :-sep]) ** 2)
        d_th = phase_stats.structure_function(sep * pitch, ATM1, np)
        assert abs(d_emp - d_th) / d_th < 0.45, (sep, d_emp, d_th)


def test_slow_wind_regime_runs():
    """Sub-pixel winds: stored screen shifts only when the cumulative
    offset crosses a pixel; output drifts smoothly in between."""
    atm = dataclasses.replace(ATM1, wind_speeds=(1.0,))   # 0.155 px/step
    tel = TEL32
    model, state = edge_flow.build(0, atm, tel)
    assert model.nsub[0] == (0, 1)
    key = jax.random.PRNGKey(0)

    @jax.jit
    def run(state):
        def step(st, idx):
            st, ph = edge_flow.advance(model, st, idx, key)
            return st, ph
        return jax.lax.scan(step, state, jnp.arange(14))

    _, phases = run(state)
    phases = np.asarray(phases)
    assert np.isfinite(phases).all()
    # successive screens nearly identical (sub-pixel drift), not equal
    diff = np.abs(phases[1:] - phases[:-1]).mean()
    assert 0 < diff < 0.5 * np.abs(phases).std()


def test_concat_embed_matches_scatter_embed():
    """The concat-based frame assembly (round-5 fast path) must equal
    the pad+ring-scatter oracle bit-for-bit for every layer."""
    model, state = edge_flow.build(2, ATM1, TEL32)
    key = jax.random.PRNGKey(0)
    borders = edge_flow._draw_borders_all(model, state.phases, key)
    fast = np.asarray(edge_flow._embed_all(model, state.phases, borders))
    for l in range(model.n_layers):
        ref = np.asarray(edge_flow._embed(model, state.phases[l],
                                          borders[l]))
        np.testing.assert_array_equal(fast[l], ref)


def test_hybrid_advance_bit_equal_to_vectorized():
    """The hybrid impl (batched draws + per-layer frames/shifts) shares
    the vectorized impl's per-step PRNG stream and math: trajectories
    must match bit-for-bit, for both shift-select strategies."""
    atm = dataclasses.replace(
        ATM1, altitudes=(0.0, 4000.0), wind_speeds=(8.0, 3.0),
        wind_directions=(0.3, math.pi / 2), fractional_r0=(0.7, 0.3))
    model, state = edge_flow.build(7, atm, TEL32)
    key = jax.random.PRNGKey(9)

    def rollout(m):
        @jax.jit
        def run(st):
            def step(st, idx):
                return edge_flow.advance(m, st, idx, key)
            return jax.lax.scan(step, st, jnp.arange(8))
        return run(state)

    for select in ("switch", "where"):
        base = dataclasses.replace(model, impl="vectorized",
                                   shift_select=select)
        hyb = dataclasses.replace(model, impl="hybrid",
                                  shift_select=select)
        f_v, ph_v = rollout(base)
        f_h, ph_h = rollout(hyb)
        np.testing.assert_array_equal(np.asarray(f_v.phases),
                                      np.asarray(f_h.phases))
        np.testing.assert_array_equal(np.asarray(ph_v),
                                      np.asarray(ph_h))


def test_vectorized_advance_matches_per_layer_translation():
    """The layer-vectorized advance (round 5) must preserve the frozen-
    flow translation invariant per layer exactly like the r4 per-layer
    path (different PRNG stream, same deterministic shift schedule)."""
    atm = dataclasses.replace(
        ATM1, altitudes=(0.0, 4000.0), wind_speeds=(8.0, 3.0),
        wind_directions=(0.0, math.pi / 2), fractional_r0=(0.7, 0.3))
    model, state = edge_flow.build(5, atm, TEL32)
    key = jax.random.PRNGKey(5)

    from functools import partial

    @partial(jax.jit, static_argnames=("use_old",))
    def run(state, use_old):
        def step(st, idx):
            fn = (edge_flow.advance_per_layer if use_old
                  else edge_flow.advance)
            st, ph = fn(model, st, idx, key)
            return st, ph
        return jax.lax.scan(step, state, jnp.arange(10))

    for use_old in (False, True):
        final, _ = run(state, use_old=use_old)
        scr = np.asarray(final.phases)
        assert np.isfinite(scr).all()
        # layer 0 travels +x at sx px/step; after 10 steps content that
        # started in columns [0, n-d) sits in columns [d, n)
        sx = model.step_px[0][1]
        d = int(np.floor(10 * sx))
        a0 = np.asarray(state.phases[0])
        cc = np.corrcoef(scr[0][:, d:].ravel(),
                         a0[:, :-d].ravel())[0, 1]
        assert cc > 0.95, (use_old, cc)


def test_run_batch_shared_turbulence_matches_single():
    """montecarlo.run_batch(shared_turbulence=True) must reproduce each
    scenario's single-call trajectory (same turb_key; equal up to f32
    fusion rounding), while amortizing ONE turbulence evolution across
    the batch."""
    import dataclasses as dc

    from mpc_sensorlessao_tpu.models import closed_loop, pipeline
    from mpc_sensorlessao_tpu.parallel import montecarlo

    cfg = reference_config(resolution=32)
    cfg = cfg.replace(
        atmosphere=dataclasses.replace(cfg.atmosphere, flow="conditional"),
        sim=dc.replace(cfg.sim, n_train=120, n_valid=20, n_test=8))
    system = pipeline.build(cfg, jax.random.PRNGKey(0))
    scen = montecarlo.make_scenarios(cfg, jax.random.PRNGKey(1), 3,
                                     d_over_r0_grid=(5.0, 10.0))
    tk = jax.random.PRNGKey(77)
    out = montecarlo.run_batch(
        system.loop, system.layers, cfg, scen, n_steps=8,
        edge_model=system.edge_model, edge_state=system.edge_state,
        shared_turbulence=True, turb_key=tk)
    for i in range(3):
        single = closed_loop.simulate(
            system.loop, system.layers, cfg, scen.key[i], n_steps=8,
            start_step=scen.start_step[i], mag=scen.mag[i],
            noise_scale=scen.noise_scale[i],
            edge_model=system.edge_model, edge_state=system.edge_state,
            turb_key=tk)
        # vmapped vs single-call lowerings fuse differently; same
        # trajectory up to f32 rounding (like the shared-window test)
        np.testing.assert_allclose(np.asarray(out.rms_res[i]),
                                   np.asarray(single.rms_res),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(out.u[i]),
                                   np.asarray(single.u),
                                   rtol=1e-3, atol=1e-4)


def test_run_batch_per_scenario_turbulence_decorrelates():
    """Default edge Monte-Carlo mode: per-scenario initial screens
    (batch_states) + per-scenario turbulence keys give distinct,
    finite, controlled trajectories."""
    import dataclasses as dc

    from mpc_sensorlessao_tpu.models import pipeline
    from mpc_sensorlessao_tpu.parallel import montecarlo

    cfg = reference_config(resolution=32)
    cfg = cfg.replace(
        atmosphere=dataclasses.replace(cfg.atmosphere, flow="conditional"),
        sim=dc.replace(cfg.sim, n_train=120, n_valid=20, n_test=10))
    system = pipeline.build(cfg, jax.random.PRNGKey(0))
    tel = dc.replace(cfg.telescope, resolution=cfg.resolution)
    B = 3
    states = edge_flow.batch_states(123, cfg.atmosphere, tel, B)
    assert states.phases.shape[0] == B
    scen = montecarlo.make_scenarios(cfg, jax.random.PRNGKey(1), B)
    out = montecarlo.run_batch(
        system.loop, system.layers, cfg, scen, n_steps=10,
        edge_model=system.edge_model, edge_state=states)
    turb = np.asarray(out.rms_turb)
    res = np.asarray(out.rms_res)
    assert np.isfinite(res).all()
    # distinct realizations: the uncorrected turbulence differs across
    # scenarios at every step
    assert np.abs(turb[0] - turb[1]).max() > 1e-3
    assert np.abs(turb[1] - turb[2]).max() > 1e-3
    # the loop still rejects on every realization
    assert (res[:, -4:].mean(axis=1) < turb[:, -4:].mean(axis=1)).all()


def test_run_sharded_edge_flow_matches_run_batch():
    """Edge-flow Monte-Carlo over the 8-device scenario mesh: psum
    statistics must match the single-device vmap means."""
    import dataclasses as dc

    from mpc_sensorlessao_tpu.models import pipeline
    from mpc_sensorlessao_tpu.parallel import mesh as mesh_lib
    from mpc_sensorlessao_tpu.parallel import montecarlo

    cfg = reference_config(resolution=32)
    cfg = cfg.replace(
        atmosphere=dataclasses.replace(cfg.atmosphere, flow="conditional"),
        sim=dc.replace(cfg.sim, n_train=120, n_valid=20, n_test=8))
    system = pipeline.build(cfg, jax.random.PRNGKey(0))
    m = mesh_lib.scenario_mesh()
    n = m.devices.size
    scen = montecarlo.make_scenarios(cfg, jax.random.PRNGKey(1), n)
    tk = jax.random.PRNGKey(9)
    stats = montecarlo.make_sharded_runner(
        system.loop, system.layers, cfg, 8, m,
        edge_model=system.edge_model, edge_state=system.edge_state,
        shared_turbulence=True, turb_key=tk)(scen)
    out = montecarlo.run_batch(
        system.loop, system.layers, cfg, scen, n_steps=8,
        edge_model=system.edge_model, edge_state=system.edge_state,
        shared_turbulence=True, turb_key=tk)
    settle = 4
    ref_mean = float(np.asarray(out.rms_res)[:, settle:].mean())
    assert int(stats.n_scenarios) == n
    np.testing.assert_allclose(float(stats.mean_rms_res), ref_mean,
                               rtol=2e-4)


def test_closed_loop_with_conditional_flow():
    """End-to-end: pipeline build + closed loop with flow="conditional"."""
    from mpc_sensorlessao_tpu.models import pipeline
    cfg = reference_config(resolution=48)
    cfg = cfg.replace(
        atmosphere=dataclasses.replace(cfg.atmosphere, flow="conditional"),
        sim=dataclasses.replace(cfg.sim, n_train=160, n_valid=20, n_test=40))
    system = pipeline.build(cfg, jax.random.PRNGKey(0))
    assert system.edge_model is not None
    out = pipeline.run_closed_loop(system, cfg, jax.random.PRNGKey(1))
    rms_res = np.asarray(out.rms_res)
    rms_turb = np.asarray(out.rms_turb)
    assert np.isfinite(rms_res).all()
    # controller rejects most turbulence on the fresh (never-replayed) flow
    assert rms_res[-15:].mean() < 0.5 * rms_turb[-15:].mean()
