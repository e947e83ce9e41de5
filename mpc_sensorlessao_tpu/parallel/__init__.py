from . import mesh, montecarlo, multihost
