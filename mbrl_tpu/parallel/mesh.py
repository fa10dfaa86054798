"""Device-mesh sharding utilities.

The reference is single-device (SURVEY.md §2.15 — no distributed backend exists).
This module is the TPU-native scale-out design: a 2-D logical mesh

  - ``model`` axis: ensemble members (the framework's EP/TP-like axis — each chip
    holds a shard of the ensemble's stacked weights);
  - ``data`` axis: batch rows / rollout particles (the DP axis).

Sharding is expressed with `jax.sharding.NamedSharding`; XLA inserts the
psum/all-gather collectives over ICI. Gradient synchronization across the data axis
falls out of jit on sharded inputs (no hand-written collectives needed).
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

MODEL_AXIS = "model"
DATA_AXIS = "data"


def make_mesh(
    devices: Optional[Sequence[jax.Device]] = None,
    model_axis_size: Optional[int] = None,
) -> Mesh:
    """Create a (model, data) mesh over the given (or all) devices.

    ``model_axis_size`` defaults to the largest power-of-two divisor <= 4 so small
    meshes keep a data axis.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if model_axis_size is None:
        model_axis_size = 1
        for cand in (2, 4):
            if n % cand == 0 and n // cand >= 1:
                model_axis_size = cand
    if n % model_axis_size != 0:
        raise ValueError(f"{n} devices not divisible by model axis {model_axis_size}")
    arr = np.asarray(devices).reshape(model_axis_size, n // model_axis_size)
    return Mesh(arr, (MODEL_AXIS, DATA_AXIS))


def ensemble_param_sharding(mesh: Mesh, ensemble_size: int):
    """Sharding rule for a stacked-ensemble params pytree: leaves whose leading axis
    is the ensemble axis shard over ``model``; everything else replicates. Leaves
    whose ensemble axis doesn't divide the mesh's model axis replicate too (XLA
    rejects uneven device_put shardings)."""
    model_size = mesh.shape[MODEL_AXIS]

    def rule(leaf):
        if (
            hasattr(leaf, "shape")
            and leaf.ndim >= 1
            and leaf.shape[0] == ensemble_size
            and ensemble_size % model_size == 0
        ):
            return NamedSharding(mesh, P(MODEL_AXIS))
        return NamedSharding(mesh, P())

    return rule


def shard_ensemble_params(params: Any, mesh: Mesh, ensemble_size: int) -> Any:
    rule = ensemble_param_sharding(mesh, ensemble_size)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, rule(x)), params)


def shard_member_batch(batch: Any, mesh: Mesh) -> Any:
    """Shard an (E, B, ...) bootstrapped batch: members over ``model``, rows over
    ``data``."""

    def put(leaf):
        leaf = jnp.asarray(leaf)
        if leaf.ndim >= 2:
            return jax.device_put(leaf, NamedSharding(mesh, P(MODEL_AXIS, DATA_AXIS)))
        return jax.device_put(leaf, NamedSharding(mesh, P()))

    return jax.tree_util.tree_map(put, batch)


def shard_particles(batch: Any, mesh: Mesh) -> Any:
    """Shard a (B, ...) particle/population batch over the data axis."""

    def put(leaf):
        leaf = jnp.asarray(leaf)
        return jax.device_put(leaf, NamedSharding(mesh, P(DATA_AXIS)))

    return jax.tree_util.tree_map(put, batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(jnp.asarray(x), NamedSharding(mesh, P())), tree
    )
