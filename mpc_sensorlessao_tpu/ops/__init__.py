from . import (block_tridiag, dft, edge_flow, karhunen_loeve, newton_kkt,
               pallas_kernels, phase_screens, phase_stats, psf,
               telescope_optics, zernike, zernike_stats)
