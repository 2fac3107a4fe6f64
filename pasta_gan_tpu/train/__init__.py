"""Training runtime: losses, steps, state, ADA, EMA."""

from .state import TrainState
from .step import GANTrainer
