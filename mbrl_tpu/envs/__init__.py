from . import reward_fns, termination_fns
from .cartpole_continuous import CartPoleEnv

__all__ = ["reward_fns", "termination_fns", "CartPoleEnv"]
