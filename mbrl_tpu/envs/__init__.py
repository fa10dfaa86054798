from . import reward_fns, termination_fns
from .cartpole_continuous import CartPoleEnv

__all__ = ["reward_fns", "termination_fns", "CartPoleEnv"]


def __getattr__(name):
    # Lazy imports for mujoco-dependent envs (parity with the reference env module
    # layout: pets_* envs, MBPO truncated-obs envs, pixel wrapper).
    if name == "PetsHalfCheetahEnv":
        from .pets_halfcheetah import HalfCheetahEnv

        return HalfCheetahEnv
    if name == "PetsCartPoleEnv":
        from .pets_cartpole import CartPoleEnv as PetsCartPoleEnv

        return PetsCartPoleEnv
    if name == "AntTruncatedObsEnv":
        from .truncated_obs import AntTruncatedObsEnv

        return AntTruncatedObsEnv
    if name == "HumanoidTruncatedObsEnv":
        from .truncated_obs import HumanoidTruncatedObsEnv

        return HumanoidTruncatedObsEnv
    if name == "PetsPusherEnv":
        from .pets_pusher import PusherEnv

        return PusherEnv
    if name == "PetsReacher3DEnv":
        from .pets_reacher import Reacher3DEnv

        return Reacher3DEnv
    if name == "MujocoGymPixelWrapper":
        from .mujoco_pixel_wrapper import MujocoGymPixelWrapper

        return MujocoGymPixelWrapper
    raise AttributeError(name)
