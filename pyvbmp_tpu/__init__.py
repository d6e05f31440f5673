"""pyvbmp_tpu — a TPU-native variational Bayesian message passing framework.

Built from scratch in JAX with the capabilities of bayesianempirimancer/pyVBMP:
exponential-family conjugate nodes as pytree-registered natural-parameter
objects, conjugate conditional transforms, and latent-variable models trained
by gradient-free VB-EM coordinate ascent compiled to ``lax.scan`` /
mesh-sharded reductions.  See SURVEY.md for the structural map of the
reference and BASELINE.md for the benchmark protocol.
"""
from . import config, utils, dists  # noqa: F401

__version__ = "0.1.0"
