"""Conjugate conditional models p(y|x, theta) with message-passing interfaces
(counterpart of reference transforms/; exported set mirrors
/root/reference/transforms/__init__.py:1-13)."""
from .matrix_normal_wishart import MatrixNormalWishart
from .matrix_normal_gamma import MatrixNormalGamma, MatrixNormalGamma_UnitTrace
from .mnlr import MultiNomialLogisticRegression
from .mnlr_bouchard import MultiNomialLogisticRegression_Bouchard
from .mixture_of_linear_transforms import MixtureofLinearTransforms
from .dmix_linear_transforms import dMixtureofLinearTransforms
from .dmixture import dMixture
from .transition import Transition, HierarchicalTransition
from .reduced_rank_regression import ReducedRankRegression
from .nl_regression import (
    NLRegression_full_rank,
    NLRegression_low_rank,
    NLRegression_Multinomial,
)
from .multilinear_normal_wishart import MultiLinearNormalWishart

__all__ = [
    "MatrixNormalWishart",
    "MatrixNormalGamma",
    "MatrixNormalGamma_UnitTrace",
    "MultiNomialLogisticRegression",
    "MultiNomialLogisticRegression_Bouchard",
    "MixtureofLinearTransforms",
    "dMixtureofLinearTransforms",
    "dMixture",
    "Transition",
    "HierarchicalTransition",
    "ReducedRankRegression",
    "NLRegression_full_rank",
    "NLRegression_low_rank",
    "NLRegression_Multinomial",
    "MultiLinearNormalWishart",
]
from .bayesian_transformers import (
    ChainedBayesianTransformer,
    DiscreteBayesianTransformer,
    FocusedBayesianTransformer,
    GenerativeBayesianTransformer,
)
__all__ += [
    "GenerativeBayesianTransformer",
    "FocusedBayesianTransformer",
    "DiscreteBayesianTransformer",
    "ChainedBayesianTransformer",
]
