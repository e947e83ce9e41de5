"""Astronomical photometric bands.

Equivalent of the reference's `photometry` enumeration class
(reference: OOMAO-master/photometry.m:44-66): per-band wavelength [m],
bandwidth [m], and zero point [photons/m^2/s]; V band anchors the
turbulence wavelength (photometry.m:50, README.md:63).
"""

from __future__ import annotations

import math
from dataclasses import dataclass


@dataclass(frozen=True)
class Band:
    name: str
    wavelength: float      # [m]
    bandwidth: float       # [m]
    zero_point: float      # [photon / m^2 / s]

    def n_photon(self, magnitude: float) -> float:
        """Photon flux for a star of given magnitude
        (photometry.m:18-21: zeroPoint * 10^(-0.4 mag))."""
        return self.zero_point * 10.0 ** (-0.4 * magnitude)

    def n_background(self, mag_per_arcsec2: float,
                     area_arcsec2: float) -> float:
        return self.n_photon(mag_per_arcsec2) * area_arcsec2


# Values from photometry.m:44-66 (wavelength, bandwidth, zeroPoint).
U = Band("U", 0.360e-6, 0.070e-6, 2.0e12)
B = Band("B", 0.440e-6, 0.100e-6, 5.4e12)
V0 = Band("V0", 0.500e-6, 0.090e-6, 3.3e12)
V = Band("V", 0.550e-6, 0.090e-6, 3.3e12)
R = Band("R", 0.640e-6, 0.150e-6, 4.0e12)
I = Band("I", 0.790e-6, 0.150e-6, 2.7e12)
J = Band("J", 1.215e-6, 0.260e-6, 1.9e12)
H = Band("H", 1.654e-6, 0.290e-6, 1.1e12)
K = Band("K", 2.179e-6, 0.410e-6, 7.0e11)
L = Band("L", 3.547e-6, 0.570e-6, 2.5e11)
M = Band("M", 4.769e-6, 0.450e-6, 2.5e10)

BANDS = {b.name: b for b in (U, B, V0, V, R, I, J, H, K, L, M)}


def band(name: str) -> Band:
    return BANDS[name]


def wavelength_scale(from_band: Band, to_band: Band) -> float:
    """Phase rescale factor between bands (telescopeAbstract.m:490)."""
    return from_band.wavelength / to_band.wavelength


def rad_to_nm(wavelength: float) -> float:
    """[rad] -> [nm] of optical path (README.md:373)."""
    return wavelength / (2.0 * math.pi) * 1e9
