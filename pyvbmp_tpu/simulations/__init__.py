"""Synthetic data generators (counterpart of reference simulations/)."""
from .lorenz import Lorenz
from .newtons_cradle import NewtonsCradle
from .flame import FlameSimulator
from .forager import Forager
from .cartthingy import cartthingy
from .flocking import Flocking

__all__ = ["Lorenz", "NewtonsCradle", "FlameSimulator", "Forager", "cartthingy", "Flocking"]
