from . import config, special
