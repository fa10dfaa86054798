"""Running input normalizer as an explicit pytree state.

Capability parity with the reference's ``mbrl.util.math.Normalizer``
(mbrl/util/math.py:95-174): full-recompute mean/std over the dataset, small-std
clamping to 1.0, optional float64 stats. Re-designed functionally: the stats are a
``NormalizerState`` pytree carried through jitted programs instead of object attributes,
so model rollouts that normalize inputs stay inside one XLA program.
"""
from __future__ import annotations

import pathlib
import pickle
from typing import Union

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

_STATS_FNAME = "env_stats.pickle"


@struct.dataclass
class NormalizerState:
    mean: jax.Array  # (1, in_size)
    std: jax.Array  # (1, in_size)
    eps: float = struct.field(pytree_node=False, default=1e-5)


def init_normalizer(in_size: int, dtype=jnp.float32) -> NormalizerState:
    eps = 1e-12 if dtype == jnp.float64 else 1e-5
    return NormalizerState(
        mean=jnp.zeros((1, in_size), dtype=dtype),
        std=jnp.ones((1, in_size), dtype=dtype),
        eps=eps,
    )


def update_stats(state: NormalizerState, data: jax.Array) -> NormalizerState:
    """Full recompute of mean/std from ``data`` (N x in_size); std<eps -> 1.0."""
    data = jnp.asarray(data, dtype=state.mean.dtype)
    if data.ndim != 2 or data.shape[1] != state.mean.shape[1]:
        raise ValueError(
            f"Normalizer expected (N, {state.mean.shape[1]}) data, got {data.shape}"
        )
    mean = jnp.mean(data, axis=0, keepdims=True)
    std = jnp.std(data, axis=0, keepdims=True, ddof=1)
    std = jnp.where(std < state.eps, 1.0, std)
    return state.replace(mean=mean, std=std)


def update_stats_host(state: NormalizerState, data: np.ndarray) -> NormalizerState:
    """Host-numpy counterpart of :func:`update_stats`: the stats reduction runs on
    the CPU (the dataset lives in the host replay buffer anyway) and only the tiny
    (1, in_size) results are uploaded — avoids shipping the whole buffer to the
    accelerator once per model retraining."""
    data = np.asarray(data, dtype=np.asarray(state.mean).dtype)
    if data.ndim != 2 or data.shape[1] != state.mean.shape[1]:
        raise ValueError(
            f"Normalizer expected (N, {state.mean.shape[1]}) data, got {data.shape}"
        )
    mean = data.mean(axis=0, keepdims=True)
    std = data.std(axis=0, keepdims=True, ddof=1)
    std = np.where(std < state.eps, 1.0, std)
    return state.replace(
        mean=jnp.asarray(mean, state.mean.dtype),
        std=jnp.asarray(std, state.std.dtype),
    )


def normalize(state: NormalizerState, val: jax.Array) -> jax.Array:
    return (val - state.mean) / state.std


def denormalize(state: NormalizerState, val: jax.Array) -> jax.Array:
    return state.std * val + state.mean


def save(state: NormalizerState, save_dir: Union[str, pathlib.Path]) -> None:
    with open(pathlib.Path(save_dir) / _STATS_FNAME, "wb") as f:
        pickle.dump({"mean": np.asarray(state.mean), "std": np.asarray(state.std)}, f)


def load(state: NormalizerState, results_dir: Union[str, pathlib.Path]) -> NormalizerState:
    with open(pathlib.Path(results_dir) / _STATS_FNAME, "rb") as f:
        stats = pickle.load(f)
    return state.replace(
        mean=jnp.asarray(stats["mean"], dtype=state.mean.dtype),
        std=jnp.asarray(stats["std"], dtype=state.std.dtype),
    )
