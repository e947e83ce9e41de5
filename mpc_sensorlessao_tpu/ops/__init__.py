from . import phase_stats, zernike
