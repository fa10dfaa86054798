from .logger import Logger
from .replay_buffer import (
    BootstrapIterator,
    ReplayBuffer,
    SequenceTransitionIterator,
    SequenceTransitionSampler,
    TransitionIterator,
    stack_iterator,
)
from .video import VideoRecorder

__all__ = [
    "ReplayBuffer",
    "TransitionIterator",
    "BootstrapIterator",
    "SequenceTransitionIterator",
    "SequenceTransitionSampler",
    "stack_iterator",
    "Logger",
    "VideoRecorder",
    "create_handler",
    "create_handler_from_str",
    "EnvHandler",
    "Freeze",
]


def __getattr__(name):
    # env-handler names re-exported lazily (they import gymnasium + mujoco)
    if name in ("create_handler", "create_handler_from_str", "EnvHandler", "Freeze",
                "GenericEnvHandler", "MujocoEnvHandler"):
        from mbrl_tpu.util import env as _env

        return getattr(_env, name)
    raise AttributeError(name)
