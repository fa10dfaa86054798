from .replay_buffer import (
    BootstrapIterator,
    ReplayBuffer,
    SequenceTransitionIterator,
    SequenceTransitionSampler,
    TransitionIterator,
    stack_iterator,
)

__all__ = [
    "ReplayBuffer",
    "TransitionIterator",
    "BootstrapIterator",
    "SequenceTransitionIterator",
    "SequenceTransitionSampler",
    "stack_iterator",
]
