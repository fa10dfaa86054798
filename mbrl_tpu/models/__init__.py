from .basic_ensemble import BasicEnsemble
from .gaussian_mlp import GaussianMLP
from .conv_nets import Conv2dDecoder, Conv2dEncoder
from .model_env import ModelEnv
from .planet import PlaNetModel
from .trainer import ModelTrainer
from .transition_model import TransitionRewardModel

__all__ = [
    "GaussianMLP",
    "PlaNetModel",
    "Conv2dEncoder",
    "Conv2dDecoder",
    "BasicEnsemble",
    "TransitionRewardModel",
    "ModelEnv",
    "ModelTrainer",
]
