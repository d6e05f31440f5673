"""Conjugate conditional models p(y|x, theta) with message-passing interfaces
(counterpart of reference transforms/; exported set mirrors
/root/reference/transforms/__init__.py:1-13)."""
from .matrix_normal_wishart import MatrixNormalWishart
from .matrix_normal_gamma import MatrixNormalGamma, MatrixNormalGamma_UnitTrace

__all__ = [
    "MatrixNormalWishart",
    "MatrixNormalGamma",
    "MatrixNormalGamma_UnitTrace",
]
