"""Latent-variable models trained by VB-EM coordinate ascent (counterpart of
reference models/; exported set mirrors /root/reference/models/__init__.py:1-12)."""
from .gmm import GaussianMixtureModel, PoissonMixtureModel
from .bayesian_factor_analysis import BayesianFactorAnalysis

__all__ = [
    "GaussianMixtureModel",
    "PoissonMixtureModel",
    "BayesianFactorAnalysis",
]
from .hmm import HMM
from .arhmm import ARHMM, ARHMM_prXY, ARHMM_prXRY
from .lds import LinearDynamicalSystems
from .mix_lds import MixtureofLinearDynamicalSystems

__all__ += [
    "HMM",
    "ARHMM",
    "ARHMM_prXY",
    "ARHMM_prXRY",
    "LinearDynamicalSystems",
    "MixtureofLinearDynamicalSystems",
]
from .tensor_hmm import Tensor_HMM, Factorial_HMM, HHMM
from .dhmm import dHMM
from .dmbd import DynamicMarkovBlanketDiscovery

__all__ += [
    "Tensor_HMM",
    "Factorial_HMM",
    "HHMM",
    "dHMM",
    "DynamicMarkovBlanketDiscovery",
]
from .bayes_net import BayesNet
from .nlds import NLDS, NonLinearDynamicalSystems
__all__ += ['BayesNet', 'NLDS', 'NonLinearDynamicalSystems']
