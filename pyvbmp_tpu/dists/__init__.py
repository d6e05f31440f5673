"""Exponential-family conjugate nodes (counterpart of reference dists/,
exported set mirrors /root/reference/dists/__init__.py:1-18)."""
from .dirichlet import Dirichlet
from .hierarchical_dirichlet import Hierarchical_Dirichlet
from .gamma import Gamma
from .wishart import Wishart, WishartEigh, WishartUnitDet, WishartUnitTrace
from .diagonal_wishart import DiagonalWishart, DiagonalWishartUnitTrace
from .mvn_vector_format import MultivariateNormal_vector_format
from .mvn_matrix_format import MultivariateNormal
from .niw import NormalInverseWishart
from .normal_gamma import NormalGamma
from .mvn_ard import MVN_ard
from .delta import Delta
from .mixture import Mixture
from .tensor_normal_wishart import TensorNormalWishart
from .niw_vector_format import (
    GMM_vector,
    NormalInverseWishart_vector_format,
    NormalInverseWishart_vector_format_invSigma,
)

__all__ = [
    "Dirichlet",
    "Hierarchical_Dirichlet",
    "Gamma",
    "Wishart",
    "WishartEigh",
    "WishartUnitDet",
    "WishartUnitTrace",
    "DiagonalWishart",
    "DiagonalWishartUnitTrace",
    "MultivariateNormal_vector_format",
    "MultivariateNormal",
    "NormalInverseWishart",
    "NormalGamma",
    "MVN_ard",
    "Delta",
    "Mixture",
    "TensorNormalWishart",
    "NormalInverseWishart_vector_format",
    "GMM_vector",
    "NormalInverseWishart_vector_format_invSigma",
]
