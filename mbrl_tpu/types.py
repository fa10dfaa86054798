"""Shared pytree dataclasses and typedefs.

Capability parity with the reference's ``mbrl/types.py:11-83`` (TransitionBatch and the
reward/termination function typedefs), re-designed as JAX pytrees: a TransitionBatch here
is an immutable ``flax.struct`` dataclass whose leaves may live on device, and all
"methods" are pure functions.
"""
from __future__ import annotations

from typing import Callable, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

__all__ = [
    "Array",
    "TermFn",
    "RewardFn",
    "TrajectoryEvalFn",
    "ModelInput",
    "TransitionBatch",
    "transition_batch_like",
]

Array = Union[np.ndarray, jax.Array]

# (act, next_obs) -> terminated flags, batched; pure jnp predicate.
TermFn = Callable[[jax.Array, jax.Array], jax.Array]
# (act, next_obs) -> rewards, batched; pure jnp function.
RewardFn = Callable[[jax.Array, jax.Array], jax.Array]
# (action_sequences P×H×A, initial_obs, key) -> values (P,)
TrajectoryEvalFn = Callable[..., jax.Array]


@struct.dataclass
class TransitionBatch:
    """A batch of environment transitions (leading batch dims arbitrary).

    Mirrors the reference dataclass (``mbrl/types.py:22-80``) but is a registered JAX
    pytree, so it can flow through jit/vmap/scan and be sharded with `jax.sharding`.
    """

    obs: Array
    act: Array
    next_obs: Array
    rewards: Array
    terminateds: Array
    truncateds: Array

    def __len__(self) -> int:
        return int(np.shape(self.obs)[0])

    def astuple(self) -> Tuple[Array, Array, Array, Array, Array, Array]:
        return (
            self.obs,
            self.act,
            self.next_obs,
            self.rewards,
            self.terminateds,
            self.truncateds,
        )

    def __getitem__(self, item) -> "TransitionBatch":
        return jax.tree_util.tree_map(lambda x: x[item], self)

    @property
    def shape(self):
        return np.shape(self.obs)

    def add_new_batch_dim(self, batch_size: int) -> "TransitionBatch":
        """Reshape leading axis N into (N // batch_size, batch_size)."""
        n = len(self)
        if n % batch_size != 0:
            raise ValueError("Current batch of transitions not compatible with new batch size")
        return jax.tree_util.tree_map(
            lambda x: np.asarray(x).reshape((n // batch_size, batch_size) + np.shape(x)[1:])
            if isinstance(x, np.ndarray)
            else x.reshape((n // batch_size, batch_size) + x.shape[1:]),
            self,
        )

    def as_jnp(self, dtype=jnp.float32) -> "TransitionBatch":
        """Upload all leaves to device as jnp arrays (bools stay bool)."""

        def conv(x):
            a = jnp.asarray(x)
            if a.dtype == jnp.bool_:
                return a
            return a.astype(dtype)

        return jax.tree_util.tree_map(conv, self)


ModelInput = Union[TransitionBatch, jax.Array]


def transition_batch_like(
    obs: Array,
    act: Array,
    next_obs: Optional[Array] = None,
    rewards: Optional[Array] = None,
    terminateds: Optional[Array] = None,
    truncateds: Optional[Array] = None,
) -> TransitionBatch:
    """Build a TransitionBatch, zero-filling missing fields (shape-compatible)."""
    b = np.shape(obs)[0]
    if next_obs is None:
        next_obs = np.zeros_like(obs)
    if rewards is None:
        rewards = np.zeros((b, 1), dtype=np.float32)
    if terminateds is None:
        terminateds = np.zeros((b, 1), dtype=bool)
    if truncateds is None:
        truncateds = np.zeros((b, 1), dtype=bool)
    return TransitionBatch(obs, act, next_obs, rewards, terminateds, truncateds)
