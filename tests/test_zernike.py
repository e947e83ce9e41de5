"""Zernike engine: ordering, orthogonality, fit/synthesis round trips."""

import numpy as np
import jax.numpy as jnp

from mpc_sensorlessao_tpu.ops import zernike


def test_modified_mode_ordering():
    # reference: zernmodfit.m:195-198 -- per n: (-n:2:-1) then fliplr(n:-2:0)
    modes = zernike.mode_indices(6)
    assert len(modes) == 28
    assert modes[0] == (0, 0)                      # piston
    assert modes[1:3] == ((1, -1), (1, 1))         # tilt pair
    assert modes[3:6] == ((2, -2), (2, 0), (2, 2))  # astig, DEFOCUS @ idx 4, astig
    assert modes[6:10] == ((3, -3), (3, -1), (3, 1), (3, 3))
    assert modes[10:15] == ((4, -4), (4, -2), (4, 0), (4, 2), (4, 4))


def test_radial_polynomials_known_values():
    # R_2^0(r) = 2r^2 - 1 ; R_4^0 = 6r^4 - 6r^2 + 1 ; R_3^1 = 3r^3 - 2r
    tbl = zernike.radial_coeff_table(6)
    modes = zernike.mode_indices(6)
    k_defocus = modes.index((2, 0))
    np.testing.assert_allclose(tbl[k_defocus, :3], [-1, 0, 2])
    k_sph = modes.index((4, 0))
    np.testing.assert_allclose(tbl[k_sph, :5], [1, 0, -6, 0, 6])
    k_coma = modes.index((3, 1))
    np.testing.assert_allclose(tbl[k_coma, :4], [0, -2, 0, 3])


def test_eval_points_against_analytic():
    rng = np.random.default_rng(0)
    r = rng.uniform(0, 1, 50)
    th = rng.uniform(-np.pi, np.pi, 50)
    z = zernike.eval_points(4, r, th)
    modes = zernike.mode_indices(4)
    # defocus (2,0): 2r^2-1
    np.testing.assert_allclose(z[:, modes.index((2, 0))], 2 * r**2 - 1,
                               atol=1e-12)
    # (2,-2): r^2 sin(2th); (2,2): r^2 cos(2th)  (zernfun.m:184-192)
    np.testing.assert_allclose(z[:, modes.index((2, -2))],
                               r**2 * np.sin(2 * th), atol=1e-12)
    np.testing.assert_allclose(z[:, modes.index((2, 2))],
                               r**2 * np.cos(2 * th), atol=1e-12)
    # tilt pair (1,-1)=r sin, (1,1)=r cos
    np.testing.assert_allclose(z[:, modes.index((1, -1))], r * np.sin(th),
                               atol=1e-12)


def test_fit_synthesize_round_trip():
    basis = zernike.make_basis(6, 64)
    rng = np.random.default_rng(1)
    c_true = jnp.asarray(rng.normal(size=28), dtype=jnp.float32)
    phase = zernike.synthesize(basis, c_true)
    c_fit = zernike.fit(basis, phase)
    np.testing.assert_allclose(np.asarray(c_fit), np.asarray(c_true),
                               atol=5e-4)


def test_fit_batched():
    basis = zernike.make_basis(4, 48)
    rng = np.random.default_rng(2)
    c = jnp.asarray(rng.normal(size=(7, 15)), dtype=jnp.float32)
    phases = zernike.synthesize(basis, c)
    assert phases.shape == (7, 48, 48)
    c_fit = zernike.fit(basis, phases)
    np.testing.assert_allclose(np.asarray(c_fit), np.asarray(c), atol=2e-2)


def test_piston_removal():
    basis = zernike.make_basis(4, 48)
    phase = jnp.ones((48, 48)) * 3.0 + zernike.synthesize(
        basis, jnp.eye(15)[2] * 0.5)
    out = zernike.piston_removed_phase(basis, phase)
    mask = np.asarray(basis.mask)
    inside = np.asarray(out)[mask]
    assert abs(inside.mean()) < 1e-5
    assert np.all(np.asarray(out)[~mask] == 0)


def test_basis_pupil_moments():
    """gram/mode_mean are the discrete pupil moments of the modes --
    the closed loop's algebraic residual-RMS telemetry depends on them
    matching explicit reductions exactly (closed_loop.step)."""
    import numpy as np

    basis = zernike.make_basis(5, 96)
    stack = np.asarray(basis.stack, np.float64)
    mask = np.asarray(basis.mask)
    n = mask.sum()
    K = stack.shape[0]
    flat = stack[:, mask]                                   # (K, n)
    np.testing.assert_allclose(np.asarray(basis.gram),
                               flat @ flat.T / n, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(basis.mode_mean),
                               flat.sum(axis=1) / n, rtol=1e-5, atol=1e-6)
    # the reference basis is UNNORMALIZED zernfun (README.md:84), so the
    # gram diagonal is the per-mode pupil variance, not 1 -- but the
    # modes are still near-orthogonal and non-piston means near zero
    g = np.asarray(basis.gram, np.float64)
    d = np.sqrt(np.diag(g))
    corr = g / np.outer(d, d)
    assert np.abs(corr - np.eye(K)).max() < 0.05
    assert np.abs(np.asarray(basis.mode_mean)[1:]).max() < 0.05
    assert abs(float(basis.mode_mean[0]) - 1.0) < 1e-6


def test_algebraic_rms_matches_reduction():
    """closed_loop residual-RMS telemetry: algebraic mode-moment path
    vs the explicit masked reduction, on random modal content."""
    import numpy as np
    from mpc_sensorlessao_tpu.models import closed_loop

    basis = zernike.make_basis(5, 96)
    rng = np.random.default_rng(3)
    npix = jnp.asarray(float(np.asarray(basis.mask).sum()), jnp.float32)
    pt = zernike.piston_removed_phase_masked(
        jnp.asarray(rng.normal(size=(96, 96)), jnp.float32),
        basis.mask, npix)
    ad = jnp.asarray(rng.normal(size=(basis.n_modes - 1,)) * 0.5,
                     jnp.float32)
    mag = 1.7
    stack = basis.stack[1:]
    phase = mag * pt + jnp.einsum("k,kij->ij", ad, stack)

    class M:
        mask = basis.mask
        mask_npix = npix

    rms_red = float(closed_loop._pupil_rms(M, phase))
    rms_pt = float(closed_loop._pupil_rms(M, pt))
    ct = jnp.einsum("kij,ij->k", stack, pt) / npix
    var = ((mag * rms_pt) ** 2 + 2.0 * mag * float(jnp.dot(ad, ct))
           + float(ad @ basis.gram[1:, 1:] @ ad)
           - float(jnp.dot(ad, basis.mode_mean[1:])) ** 2)
    assert abs(np.sqrt(max(var, 0.0)) - rms_red) < 5e-5
