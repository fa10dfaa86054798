from .base import PROPAGATION_METHODS, DynamicsModel, EnsembleModel
from .basic_ensemble import BasicEnsemble
from .layers import ensemble_linear, ensemble_linear_init
from .gaussian_mlp import GaussianMLP
from .conv_nets import Conv2dDecoder, Conv2dEncoder
from .model_env import ModelEnv
from .planet import PlaNetModel
from .trainer import ModelTrainer
from .transition_model import TransitionRewardModel

__all__ = [
    "GaussianMLP",
    "DynamicsModel",
    "EnsembleModel",
    "PROPAGATION_METHODS",
    "ensemble_linear",
    "ensemble_linear_init",
    "PlaNetModel",
    "Conv2dEncoder",
    "Conv2dDecoder",
    "BasicEnsemble",
    "TransitionRewardModel",
    "ModelEnv",
    "ModelTrainer",
]
