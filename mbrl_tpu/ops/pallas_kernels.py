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


# --------------------------------------------------------------------------- #
# Full-horizon weight-stationary rollout kernel (round-4 second attempt).
#
# The round-3 per-step kernel lost to XLA (64.7M vs 86.6M trans/s) because each
# rollout step re-fetched the elite weight stack from HBM and re-paid kernel
# launch + activation in/out traffic 30x per plan. This kernel inverts the
# loop structure: ONE pallas_call per plan, grid over BATCH TILES only, the
# whole elite weight stack (~2.6 MB at PETS shapes) resident in VMEM, and the
# horizon as a fori_loop INSIDE the kernel. Per plan, HBM moves the weights
# once (revolving buffers keep them across grid programs), the pre-expanded
# action table once, and one (tile, 1) return column out: everything else —
# inter-layer activations, Gaussian noise, the obs carry — lives and dies in
# VMEM/registers.
#
# TS1 re-shuffling without data movement: the shard-space "rotate" scheme
# (fast_rollout.py) rolls the packed carry by a uniform offset each step; a
# global roll cannot cross pallas grid programs, so the kernel keeps rows
# STATIONARY and rotates the member ASSIGNMENT instead — row tile i draws
# member ((i + rot[t]) % num_tiles) // tiles_per_member from the in-VMEM
# stacked weights, with rot[t] a cumulative uniform tile-granular rotation
# (coarser than row-granular, but the scheme's balance/unbiasedness argument
# is identical: assignments are a single global shift either way; see
# GaussianMLP.rollout_shuffle and tests/test_fast_rollout.py).
# --------------------------------------------------------------------------- #


def _rollout_kernel(
    num_layers: int,
    out_size: int,
    horizon: int,
    act_dim: int,
    tiles_per_member: int,
    num_tiles: int,
    activation,
    sample: bool,
    *refs,
):
    """refs: seed(SMEM 2), rot(SMEM H), obs0, acts_flat, delta_mask,
    (w_i, b_i)*L, w_head, b_head, max_logvar, min_logvar, out.

    The horizon loop is PYTHON-UNROLLED: actions arrive flattened as
    (tile, H*A) so each step's action slab is a STATIC lane slice — a
    (tile, H, A) block would pad its last two dims to (32, 128) tiles and
    blow the VMEM budget ~20x at PETS shapes (A=6)."""
    seed_ref, rot_ref, obs0_ref, acts_ref, dmask_ref = refs[:5]
    out_ref = refs[-1]
    min_lv_ref = refs[-2]
    max_lv_ref = refs[-3]
    layer_refs = refs[5:-3]
    i = pl.program_id(0)
    if sample:
        # one stream per tile program for the whole horizon (bits calls
        # advance the per-core PRNG state across the unrolled steps)
        pltpu.prng_seed(
            seed_ref[0] + i * jnp.int32(-1640531527),  # 0x9E3779B9
            seed_ref[1] + i * jnp.int32(-2049693685),  # 0x85EBCA6B
        )
    max_lv = max_lv_ref[:]
    min_lv = min_lv_ref[:]
    dmask = dmask_ref[:]  # (1, D) 1.0 where target is a delta

    obs = obs0_ref[:]
    total = jnp.zeros((obs.shape[0], 1), jnp.float32)
    for t in range(horizon):
        m = ((i + rot_ref[t]) % num_tiles) // tiles_per_member
        act_t = acts_ref[:, t * act_dim : (t + 1) * act_dim]
        x = jnp.concatenate([obs, act_t], axis=-1)
        h = x
        for l in range(num_layers):
            w = layer_refs[2 * l][m]
            b = layer_refs[2 * l + 1][m]
            if h.dtype != w.dtype:
                # bf16 weight stack: full-rate MXU with f32 accumulation; the
                # carry/head/reward math stays f32
                h = h.astype(w.dtype)
            h = activation(jnp.dot(h, w, preferred_element_type=jnp.float32) + b)
        w_head = layer_refs[2 * num_layers][m]
        b_head = layer_refs[2 * num_layers + 1][m]
        if h.dtype != w_head.dtype:
            h = h.astype(w_head.dtype)
        out = jnp.dot(h, w_head, preferred_element_type=jnp.float32) + b_head
        mean = out[:, :out_size]
        logvar = out[:, out_size:]
        logvar = max_lv - jax.nn.softplus(max_lv - logvar)
        logvar = min_lv + jax.nn.softplus(logvar - min_lv)
        if sample:
            bits1 = pltpu.bitcast(pltpu.prng_random_bits(mean.shape), jnp.uint32)
            bits2 = pltpu.bitcast(pltpu.prng_random_bits(mean.shape), jnp.uint32)
            u1 = ((bits1 >> 8).astype(jnp.int32).astype(jnp.float32) + 1.0) * (
                2.0 ** -24
            )
            u2 = (bits2 >> 8).astype(jnp.int32).astype(jnp.float32) * (2.0 ** -24)
            z = jnp.sqrt(-2.0 * jnp.log(u1)) * jnp.cos((2.0 * np.pi) * u2)
            pred = mean + jnp.exp(0.5 * logvar) * z
        else:
            pred = mean
        # learned reward rides in the last column; delta targets for obs dims
        raw_next = pred[:, : out_size - 1]
        reward = pred[:, out_size - 1 :]
        obs = dmask * (obs + raw_next) + (1.0 - dmask) * raw_next
        total = total + reward
    out_ref[:] = total


@functools.partial(
    jax.jit,
    static_argnames=("out_size", "activation", "tile", "sample", "interpret"),
)
def fused_rollout_returns(
    seed: jax.Array,  # (2,) int32
    rot_tiles: jax.Array,  # (H,) int32 cumulative tile-granular rotations
    obs0_rows: jax.Array,  # (B, D) f32 — initial obs per particle row
    acts_rows: jax.Array,  # (B, H, A) f32 — row-expanded action table
    delta_mask: jax.Array,  # (1, D) f32 — 1 where target_is_delta applies
    layer_ws: Tuple[jax.Array, ...],  # each (E, d_in, d_out)
    layer_bs: Tuple[jax.Array, ...],  # each (E, 1, d_out)
    head_w: jax.Array,  # (E, hid, 2*out)
    head_b: jax.Array,  # (E, 1, 2*out)
    max_logvar: jax.Array,  # (1, out)
    min_logvar: jax.Array,  # (1, out)
    out_size: int,
    activation=jax.nn.silu,
    tile: int = 800,
    sample: bool = True,
    interpret: bool = False,
) -> jax.Array:
    """Whole-horizon imagined rollout, one pallas_call: per-row total learned
    reward (B, 1). Weights stay in VMEM across the full horizon; see block
    comment above. Requires batch % tile == 0 and shard % tile == 0."""
    batch, obs_dim = obs0_rows.shape
    horizon, act_dim = acts_rows.shape[1:]
    num_members = head_w.shape[0]
    num_layers = len(layer_ws)
    assert batch % tile == 0, (batch, tile)
    num_tiles = batch // tile
    assert num_tiles % num_members == 0, (num_tiles, num_members)
    tiles_per_member = num_tiles // num_members
    # flatten to (B, H*A): a 3-D (tile, H, A) block would tile-pad (H, A) to
    # (32, 128) and blow VMEM ~20x at small action dims
    acts_flat = acts_rows.reshape(batch, horizon * act_dim)

    smem = getattr(pltpu, "SMEM", None)
    in_specs = [
        pl.BlockSpec(memory_space=smem),
        pl.BlockSpec(memory_space=smem),
        pl.BlockSpec((tile, obs_dim), lambda i: (i, 0), memory_space=_VMEM),
        pl.BlockSpec(
            (tile, horizon * act_dim), lambda i: (i, 0), memory_space=_VMEM
        ),
        pl.BlockSpec(delta_mask.shape, lambda i: (0, 0), memory_space=_VMEM),
    ]
    operands: List[jax.Array] = [seed, rot_tiles, obs0_rows, acts_flat, delta_mask]
    for w, b in zip(layer_ws, layer_bs):
        in_specs.append(
            pl.BlockSpec(w.shape, lambda i: (0, 0, 0), memory_space=_VMEM)
        )
        in_specs.append(
            pl.BlockSpec(b.shape, lambda i: (0, 0, 0), memory_space=_VMEM)
        )
        operands += [w, b]
    in_specs.append(
        pl.BlockSpec(head_w.shape, lambda i: (0, 0, 0), memory_space=_VMEM)
    )
    in_specs.append(
        pl.BlockSpec(head_b.shape, lambda i: (0, 0, 0), memory_space=_VMEM)
    )
    operands += [head_w, head_b]
    for lv in (max_logvar, min_logvar):
        in_specs.append(
            pl.BlockSpec(lv.shape, lambda i: (0, 0), memory_space=_VMEM)
        )
        operands.append(lv)

    kernel = functools.partial(
        _rollout_kernel,
        num_layers,
        out_size,
        horizon,
        act_dim,
        tiles_per_member,
        num_tiles,
        activation,
        sample,
    )
    return pl.pallas_call(
        kernel,
        grid=(num_tiles,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=_VMEM),
        out_shape=jax.ShapeDtypeStruct((batch, 1), jnp.float32),
        interpret=interpret,
    )(*operands)


def pick_tile(rows_per_member: int, max_tile: int = 1024) -> int | None:
    """Largest divisor of ``rows_per_member`` that is a multiple of 8 and
    <= ``max_tile`` (TPU sublane alignment); None if none exists."""
    best = None
    for t in range(8, min(rows_per_member, max_tile) + 1, 8):
        if rows_per_member % t == 0:
            best = t
    return best


def _gaussian_kernel(
    num_layers: int, out_size: int, activation, sample: bool, *refs
):
    """refs: seed, x, (w_i, b_i)*L, w_head, b_head, max_logvar, min_logvar, out.

    Fuses the ensemble-member MLP chain, the Gaussian head's soft logvar
    double-bounding (reference mbrl/models/gaussian_mlp.py:150-154), and — when
    ``sample`` — a Box-Muller draw from the per-core hardware PRNG, all in VMEM.
    The rollout hot loop's HBM traffic drops to (x in, sample out, weights); no
    inter-layer activations or threefry noise tensors ever touch HBM.
    """
    seed_ref = refs[0]
    x_ref = refs[1]
    out_ref = refs[-1]
    min_lv_ref = refs[-2]
    max_lv_ref = refs[-3]
    layer_refs = refs[2:-3]
    if sample:
        # distinct stream per (member, tile) program. The hardware accepts at
        # most TWO 32-bit seed words, so mix each program id into one word with
        # an odd-constant multiply (wrapping int32): distinct programs always
        # differ in at least one word, and the per-step stream space is 2^64 —
        # far past birthday collisions over any realistic number of steps.
        pltpu.prng_seed(
            seed_ref[0] + pl.program_id(0) * jnp.int32(-1640531527),  # 0x9E3779B9
            seed_ref[1] + pl.program_id(1) * jnp.int32(-2049693685),  # 0x85EBCA6B
        )
    h = x_ref[0]  # (TILE, in)
    for i in range(num_layers):
        w = layer_refs[2 * i][0]
        b = layer_refs[2 * i + 1][0]
        h = jnp.dot(h, w, preferred_element_type=jnp.float32) + b
        h = activation(h)
        if w.dtype != jnp.float32:
            h = h.astype(w.dtype)
    w_head = layer_refs[2 * num_layers][0]
    b_head = layer_refs[2 * num_layers + 1][0]
    out = jnp.dot(h, w_head, preferred_element_type=jnp.float32) + b_head
    mean = out[:, :out_size]
    logvar = out[:, out_size:]
    max_lv = max_lv_ref[:]  # (1, out)
    min_lv = min_lv_ref[:]
    logvar = max_lv - jax.nn.softplus(max_lv - logvar)
    logvar = min_lv + jax.nn.softplus(logvar - min_lv)
    if not sample:
        out_ref[0] = mean
        return
    shape = mean.shape
    bits1 = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    bits2 = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    # 24-bit uniforms: u1 in (0,1] (log-safe), u2 in [0,1). Mosaic has no
    # uint32->f32 cast; the >>8 values fit in int32 (< 2^24), so go via int32.
    u1 = ((bits1 >> 8).astype(jnp.int32).astype(jnp.float32) + 1.0) * (2.0 ** -24)
    u2 = (bits2 >> 8).astype(jnp.int32).astype(jnp.float32) * (2.0 ** -24)
    z = jnp.sqrt(-2.0 * jnp.log(u1)) * jnp.cos((2.0 * np.pi) * u2)
    out_ref[0] = mean + jnp.exp(0.5 * logvar) * z


@functools.partial(
    jax.jit,
    static_argnames=("out_size", "activation", "tile", "sample", "interpret"),
)
def fused_ensemble_mlp_gaussian(
    seed: jax.Array,  # (2,) int32 — two independent 32-bit seed words
    x: jax.Array,  # (E, S, in)
    layer_ws: Tuple[jax.Array, ...],
    layer_bs: Tuple[jax.Array, ...],
    head_w: jax.Array,  # (E, hid, 2*out)
    head_b: jax.Array,  # (E, 1, 2*out)
    max_logvar: jax.Array,  # (1, out)
    min_logvar: jax.Array,  # (1, out)
    out_size: int,
    activation=jax.nn.silu,
    tile: int = 512,
    sample: bool = True,
    interpret: bool = False,
) -> jax.Array:
    """Fused ensemble MLP + bounded-Gaussian-head sample, (E, S, out_size).

    ``sample=False`` returns the bounded mean (usable in interpret mode, where
    the TPU hardware PRNG is unavailable).
    """
    num_members, rows, in_dim = x.shape
    num_layers = len(layer_ws)
    assert rows % tile == 0, (rows, tile)
    grid = (num_members, rows // tile)

    in_specs = [
        pl.BlockSpec(memory_space=getattr(pltpu, "SMEM", None))
        if pltpu is not None
        else pl.BlockSpec((1,), lambda e, t: (0,)),
        pl.BlockSpec((1, tile, in_dim), lambda e, t: (e, t, 0), memory_space=_VMEM),
    ]
    operands: List[jax.Array] = [seed, x]
    for w, b in zip(layer_ws, layer_bs):
        in_specs.append(
            pl.BlockSpec((1,) + w.shape[1:], lambda e, t: (e, 0, 0), memory_space=_VMEM)
        )
        in_specs.append(
            pl.BlockSpec((1,) + b.shape[1:], lambda e, t: (e, 0, 0), memory_space=_VMEM)
        )
        operands += [w, b]
    in_specs.append(
        pl.BlockSpec((1,) + head_w.shape[1:], lambda e, t: (e, 0, 0), memory_space=_VMEM)
    )
    in_specs.append(
        pl.BlockSpec((1,) + head_b.shape[1:], lambda e, t: (e, 0, 0), memory_space=_VMEM)
    )
    operands += [head_w, head_b]
    for lv in (max_logvar, min_logvar):
        in_specs.append(
            pl.BlockSpec(lv.shape, lambda e, t: (0, 0), memory_space=_VMEM)
        )
        operands.append(lv)

    out_spec = pl.BlockSpec(
        (1, tile, out_size), lambda e, t: (e, t, 0), memory_space=_VMEM
    )
    kernel = functools.partial(
        _gaussian_kernel, num_layers, out_size, activation, sample
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((num_members, rows, out_size), jnp.float32),
        interpret=interpret,
    )(*operands)
