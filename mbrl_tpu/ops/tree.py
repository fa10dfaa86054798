"""Pytree partition helpers for mixed parameter trees.

Model params carry non-differentiable data leaves (e.g. elite member indices, int32)
alongside float weights so that checkpoints and jitted programs see one pytree.
Gradient-based training splits the tree into (differentiable, static) halves and
recombines after the optimizer step.
"""
from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp


def _is_inexact(x) -> bool:
    return jnp.issubdtype(jnp.asarray(x).dtype, jnp.inexact)


def partition_params(params: Any) -> Tuple[Any, Any]:
    """Split a pytree into (float leaves, non-float leaves); the other half of each
    pair is None. Recombine with :func:`combine_params`."""
    diff = jax.tree_util.tree_map(lambda x: x if _is_inexact(x) else None, params)
    static = jax.tree_util.tree_map(lambda x: None if _is_inexact(x) else x, params)
    return diff, static


def combine_params(diff: Any, static: Any) -> Any:
    """Inverse of :func:`partition_params`."""
    return jax.tree_util.tree_map(
        lambda d, s: s if d is None else d,
        diff,
        static,
        is_leaf=lambda x: x is None,
    )
