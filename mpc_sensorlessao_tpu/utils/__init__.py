from . import (checkpoint, config, guards, hostcompute, logbook, metrics,
               photometry, profiling, special)
