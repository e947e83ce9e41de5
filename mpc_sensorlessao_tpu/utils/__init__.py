from . import (checkpoint, config, gridtools, guards, hostcompute,
               logbook, metrics, photometry, profiling, special, units)
