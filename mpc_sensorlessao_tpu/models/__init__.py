from . import (closed_loop, dm, estimator, imaging, integrator, lgs, mcao,
               mpc, pipeline, pyramid, slopes_mmse, solvers, tomography,
               var, wfs)
