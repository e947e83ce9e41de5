from . import (dft, newton_kkt, pallas_kernels, phase_screens, phase_stats,
               psf, zernike)
