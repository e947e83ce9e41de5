from . import (block_tridiag, dft, edge_flow, fourier_ao, karhunen_loeve,
               newton_kkt, pallas_kernels, phase_screens, phase_stats, psf,
               raytrace, relay, segmented, telescope_optics, toeplitz,
               zernike, zernike_stats)
