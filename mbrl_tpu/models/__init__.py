from .basic_ensemble import BasicEnsemble
from .gaussian_mlp import GaussianMLP
from .model_env import ModelEnv
from .trainer import ModelTrainer
from .transition_model import TransitionRewardModel

__all__ = [
    "GaussianMLP",
    "BasicEnsemble",
    "TransitionRewardModel",
    "ModelEnv",
    "ModelTrainer",
]
