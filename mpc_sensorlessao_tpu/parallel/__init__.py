from . import estimator_tp, horizon, mesh, montecarlo, multihost
