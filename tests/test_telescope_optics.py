"""Analytic telescope OTF/PSF (telescope.m:160-238 equivalents)."""

import numpy as np
from scipy.special import jn_zeros

from mpc_sensorlessao_tpu.ops import telescope_optics as topt
from mpc_sensorlessao_tpu.ops import phase_stats
from mpc_sensorlessao_tpu.utils.config import AtmosphereConfig

ATM = AtmosphereConfig(fractional_r0=(1.0,), altitudes=(0.0,),
                       wind_speeds=(5.0,), wind_directions=(0.0,))
D = 1.0


def test_diffraction_otf_shape():
    assert abs(topt.diffraction_otf(0.0, D) - 1.0) < 1e-12
    assert topt.diffraction_otf(D, D) == 0.0            # cutoff at r=D
    r = np.linspace(0, D, 100)
    otf = topt.diffraction_otf(r, D)
    assert (np.diff(otf) < 1e-12).all()                 # monotone decreasing
    # known value: OTF(D/2) = (2/pi)(acos(1/2) - (1/2) sqrt(3/4))
    expect = (2 / np.pi) * (np.arccos(0.5) - 0.5 * np.sqrt(0.75))
    assert abs(topt.diffraction_otf(D / 2, D) - expect) < 1e-12


def test_obstructed_otf():
    r = np.linspace(0, D, 50)
    otf = topt.diffraction_otf(r, D, obstruction=0.3)
    assert abs(otf[0] - 1.0) < 1e-9
    assert np.isfinite(otf).all()
    # annular aperture has relatively MORE high-frequency content
    clear = topt.diffraction_otf(r, D)
    assert otf[30] / otf[0] != clear[30] / clear[0]


def test_airy_first_zero():
    # first null of 2J1(u)/u at u = j_{1,1} = 3.8317 -> f = u/(pi D)
    f0 = jn_zeros(1, 1)[0] / (np.pi * D)
    vals = topt.airy_psf(np.array([f0 * 0.5, f0, f0 * 1.5]), D)
    assert vals[1] < 1e-6 * vals[0]
    assert vals[2] > vals[1]


def test_atmospheric_otf_is_structure_function():
    r = np.array([0.05, 0.2, 0.5])
    np.testing.assert_allclose(
        topt.atmospheric_otf(r, ATM),
        np.exp(-0.5 * phase_stats.structure_function(r, ATM, np)),
        rtol=1e-12)


def test_psf_hankel_matches_airy_without_atmosphere():
    f = np.linspace(0.0, 2.0, 7)
    hank = topt.psf_radial(f, D, atm=None)
    airy = topt.airy_psf(f, D)
    np.testing.assert_allclose(hank, airy, rtol=2e-3, atol=1e-6)


def test_strehl_ratio_weak_turbulence_marechal():
    # weak turbulence: OTF-integral Strehl ~ Marechal exp(-sigma_res^2)
    weak = AtmosphereConfig(r0=2.0, L0=10.0, fractional_r0=(1.0,),
                            altitudes=(0.0,), wind_speeds=(5.0,),
                            wind_directions=(0.0,))
    s = topt.strehl_ratio(0.5, weak)
    assert 0.5 < s < 1.0
    strong = AtmosphereConfig(r0=0.1, L0=42.0, fractional_r0=(1.0,),
                              altitudes=(0.0,), wind_speeds=(5.0,),
                              wind_directions=(0.0,))
    assert topt.strehl_ratio(1.0, strong) < 0.1
