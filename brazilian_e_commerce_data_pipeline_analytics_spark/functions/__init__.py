from .compat import dsum, davg, dmoney, roundsum  # noqa: F401
