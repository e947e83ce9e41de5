from . import closed_loop, dm, estimator, mpc, pipeline, solvers, var, wfs
