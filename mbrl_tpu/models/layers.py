"""Reusable ensemble layers for custom models.

Capability parity with the reference ``mbrl/models/util.py`` (EnsembleLinearLayer
:31-77 — one batched matmul evaluating every member; truncated_normal_init :15-28).
Functional form: ``ensemble_linear_init`` creates the stacked (E, in, out) weights,
``ensemble_linear`` applies them with a single MXU einsum; elite subsetting is a
parameter gather done by the caller (see GaussianMLP._elite_view).
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from mbrl_tpu.ops.math import truncated_normal_init


def ensemble_linear_init(
    key: jax.Array, ensemble_size: int, in_size: int, out_size: int
) -> Dict[str, jax.Array]:
    """Stacked member weights, PETS truncated-normal init, zero bias."""
    return {
        "w": truncated_normal_init(key, (ensemble_size, in_size, out_size), fan_in=in_size),
        "b": jnp.zeros((ensemble_size, 1, out_size)),
    }


def ensemble_linear(params: Dict[str, jax.Array], x: jax.Array) -> jax.Array:
    """Apply all members in one batched contraction.

    x: (E, B, in) (or (B, in), broadcast to every member) -> (E, B, out)."""
    if x.ndim == 2:
        x = jnp.broadcast_to(x, (params["w"].shape[0],) + x.shape)
    return (
        jnp.einsum("ebi,eio->ebo", x, params["w"], preferred_element_type=jnp.float32)
        + params["b"]
    )
