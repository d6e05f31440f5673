from . import math, linalg, rng, jaxutils  # noqa: F401
