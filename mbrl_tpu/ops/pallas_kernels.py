"""Pallas TPU kernels for the rollout hot path.

The imagined-rollout step is a chain of small matmuls (ensemble MLP: in -> hid x L
-> 2*out). XLA cannot fuse elementwise+matmul chains ACROSS matmuls, so every layer
round-trips its (batch, hid) activations through HBM; at PETS shapes the activation
traffic is comparable to the matmul FLOP time. ``fused_ensemble_mlp`` keeps the
whole per-member chain resident in VMEM: grid = (members, batch tiles), each program
loads its member's full weight stack (~0.5 MB) plus one activation tile and runs all
layers back-to-back on the MXU.

Used by GaussianMLP's equal-shard propagation path (each member processes its own
contiguous shard). Falls back transparently when shapes don't tile.
"""
from __future__ import annotations

import functools
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl

try:  # pltpu only resolves on TPU-capable installs; interpret mode needs just pl
    from jax.experimental.pallas import tpu as pltpu

    _VMEM = pltpu.VMEM
except Exception:  # pragma: no cover
    pltpu = None
    _VMEM = None


def _kernel(num_layers: int, activation, *refs):
    """refs layout: x, (w_i, b_i) * num_layers, w_head, b_head, out."""
    x_ref = refs[0]
    out_ref = refs[-1]
    layer_refs = refs[1:-1]
    h = x_ref[0]  # (TILE, in)
    for i in range(num_layers):
        w = layer_refs[2 * i][0]  # (in, hid)
        b = layer_refs[2 * i + 1][0]  # (1, hid)
        h = jnp.dot(h, w, preferred_element_type=jnp.float32) + b
        h = activation(h)
    w_head = layer_refs[2 * num_layers][0]
    b_head = layer_refs[2 * num_layers + 1][0]
    out_ref[0] = jnp.dot(h, w_head, preferred_element_type=jnp.float32) + b_head


@functools.partial(jax.jit, static_argnames=("activation", "tile", "interpret"))
def fused_ensemble_mlp(
    x: jax.Array,  # (E, S, in)
    layer_ws: Tuple[jax.Array, ...],  # each (E, d_in, d_out)
    layer_bs: Tuple[jax.Array, ...],  # each (E, 1, d_out)
    head_w: jax.Array,  # (E, hid, out)
    head_b: jax.Array,  # (E, 1, out)
    activation=jax.nn.silu,
    tile: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """Per-member-sharded ensemble MLP forward, fully fused in VMEM.

    Requires S (rows per member) divisible by ``tile``. Returns (E, S, out).
    """
    num_members, rows, in_dim = x.shape
    out_dim = head_w.shape[-1]
    num_layers = len(layer_ws)
    assert rows % tile == 0, (rows, tile)

    grid = (num_members, rows // tile)

    in_specs = [
        pl.BlockSpec((1, tile, in_dim), lambda e, t: (e, t, 0), memory_space=_VMEM)
    ]
    operands: List[jax.Array] = [x]
    for w, b in zip(layer_ws, layer_bs):
        in_specs.append(
            pl.BlockSpec(
                (1,) + w.shape[1:], lambda e, t: (e, 0, 0), memory_space=_VMEM
            )
        )
        in_specs.append(
            pl.BlockSpec(
                (1,) + b.shape[1:], lambda e, t: (e, 0, 0), memory_space=_VMEM
            )
        )
        operands += [w, b]
    in_specs.append(
        pl.BlockSpec((1,) + head_w.shape[1:], lambda e, t: (e, 0, 0), memory_space=_VMEM)
    )
    in_specs.append(
        pl.BlockSpec((1,) + head_b.shape[1:], lambda e, t: (e, 0, 0), memory_space=_VMEM)
    )
    operands += [head_w, head_b]

    out_spec = pl.BlockSpec(
        (1, tile, out_dim), lambda e, t: (e, t, 0), memory_space=_VMEM
    )

    kernel = functools.partial(_kernel, num_layers, activation)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((num_members, rows, out_dim), jnp.float32),
        interpret=interpret,
    )(*operands)


def supports_fused_mlp(rows_per_member: int, tile: int = 512) -> bool:
    return rows_per_member % tile == 0
