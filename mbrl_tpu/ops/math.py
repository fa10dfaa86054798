"""Core math kernels, written as pure jnp functions (jit/vmap/shard friendly).

Capability parity with the reference's ``mbrl/util/math.py`` (gaussian_nll:41-64,
truncated_normal_:69-92, truncated_linear:19-38, propagate_*:180-303,
powerlaw_psd_gaussian:306-396, quantize_obs:402-426), re-designed for XLA:

  - truncated-normal sampling uses `jax.random.truncated_normal` (inverse-CDF, one
    pass) instead of the reference's host-side rejection-resampling loop — same
    distribution (+/- 2 std), but a fixed-shape program that XLA can fuse;
  - colored-noise generation is `jnp.fft.rfft`-based and takes an explicit PRNG key;
  - propagation helpers are gather-based (`take_along_axis`) so they vectorize on the
    VPU and work under vmap/scan.
"""
from __future__ import annotations

import math as _pymath
from typing import Iterable, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp


def truncated_linear(min_x: float, max_x: float, min_y: float, max_y: float, x: float) -> float:
    """Truncated linear schedule: min_y at x<=min_x, linear up to max_y at x>=max_x.

    Host-side (Python floats) — used for e.g. the MBPO rollout-horizon schedule.
    """
    if max_x - min_x < 1e-10:
        return max_y
    if x <= min_x:
        return min_y
    dx = (x - min_x) / (max_x - min_x)
    dx = min(dx, 1.0)
    return dx * (max_y - min_y) + min_y


def gaussian_nll(
    pred_mean: jax.Array,
    pred_logvar: jax.Array,
    target: jax.Array,
    reduce: bool = True,
) -> jax.Array:
    """Negative log-likelihood of a diagonal Gaussian (up to constants).

    losses = (mean - target)^2 * exp(-logvar) + logvar.
    When ``reduce``, sums over the last axis then means over the rest.
    """
    l2 = jnp.square(pred_mean - target)
    inv_var = jnp.exp(-pred_logvar)
    losses = l2 * inv_var + pred_logvar
    if reduce:
        return jnp.mean(jnp.sum(losses, axis=-1))
    return losses


def truncated_normal(
    key: jax.Array,
    shape: Sequence[int],
    mean: float = 0.0,
    std: float = 1.0,
    dtype=jnp.float32,
) -> jax.Array:
    """Sample from a normal truncated at +/- 2 std around ``mean``.

    One-shot inverse-CDF sampling (no rejection loop), matching the distribution of
    the reference's rejection-resampling initializer.
    """
    base = jax.random.truncated_normal(key, -2.0, 2.0, tuple(shape), dtype)
    return base * std + mean


def truncated_normal_init(
    key: jax.Array, shape: Sequence[int], fan_in: Optional[int] = None, dtype=jnp.float32
) -> jax.Array:
    """PETS-style weight init: truncated normal with std = 1/(2*sqrt(fan_in))."""
    if fan_in is None:
        fan_in = shape[-2] if len(shape) >= 2 else shape[-1]
    std = 1.0 / (2.0 * _pymath.sqrt(float(fan_in)))
    return truncated_normal(key, shape, mean=0.0, std=std, dtype=dtype)


# ------------------------------------------------------------------------ #
# Uncertainty propagation (PETS trajectory-sampling variants)
# ------------------------------------------------------------------------ #
def propagate_from_indices(predicted: jax.Array, indices: jax.Array) -> jax.Array:
    """Select ``out[i] = predicted[indices[i], i]`` from an ``E x B x Od`` stack."""
    # Gather along the ensemble axis; indices: (B,) int32.
    idx = indices[None, :, None]  # 1 x B x 1
    return jnp.take_along_axis(predicted, idx, axis=0)[0]


def propagate_random_model(
    key: jax.Array, predictions: Tuple[jax.Array, ...]
) -> Tuple[jax.Array, ...]:
    """TS1: choose a uniformly random member per batch row (fresh per call)."""
    out = []
    for i, p in enumerate(predictions):
        subkey = jax.random.fold_in(key, i)
        indices = jax.random.randint(subkey, (p.shape[1],), 0, p.shape[0])
        out.append(propagate_from_indices(p, indices))
    return tuple(out)


def propagate_expectation(predictions: Tuple[jax.Array, ...]) -> Tuple[jax.Array, ...]:
    """Mean over ensemble members."""
    return tuple(p.mean(axis=0) for p in predictions)


def propagate_fixed_model(
    predictions: Tuple[jax.Array, ...], propagation_indices: jax.Array
) -> Tuple[jax.Array, ...]:
    """TSinf: use persistent per-row member indices for every prediction."""
    return tuple(propagate_from_indices(p, propagation_indices) for p in predictions)


def propagate(
    predictions: Tuple[jax.Array, ...],
    propagation_method: str = "expectation",
    propagation_indices: Optional[jax.Array] = None,
    key: Optional[jax.Array] = None,
) -> Tuple[jax.Array, ...]:
    """Dispatch over the three PETS propagation modes (static string)."""
    if propagation_method == "random_model":
        if key is None:
            raise ValueError("propagate(random_model) requires a PRNG key")
        return propagate_random_model(key, predictions)
    if propagation_method == "fixed_model":
        if propagation_indices is None:
            raise ValueError("propagate(fixed_model) requires propagation_indices")
        return propagate_fixed_model(predictions, propagation_indices)
    if propagation_method == "expectation":
        return propagate_expectation(predictions)
    raise ValueError(f"Invalid propagation method {propagation_method}.")


# ------------------------------------------------------------------------ #
# Colored noise generator (iCEM)
# ------------------------------------------------------------------------ #
def powerlaw_psd_gaussian(
    key: jax.Array,
    exponent: float,
    size: Union[int, Iterable[int]],
    fmin: float = 0.0,
) -> jax.Array:
    """Gaussian (1/f)**beta noise via rFFT, normalized to unit variance.

    The power spectrum S(f) ~ (1/f)**exponent lives on the LAST axis of ``size``.
    All shapes static; two `normal` draws + one irfft — a single fused XLA program.
    """
    if isinstance(size, int):
        size = [size]
    else:
        size = list(size)
    samples = size[-1]
    if samples < 2:
        # Degenerate spectrum (a single time sample): plain unit-variance Gaussian.
        return jax.random.normal(key, tuple(size))

    f = jnp.fft.rfftfreq(samples)
    fmin = max(fmin, 1.0 / samples)
    s_scale = jnp.where(f < fmin, fmin, f) ** (-exponent / 2.0)

    # Theoretical output std from the scaling factors.
    w = s_scale[1:]
    w = w.at[-1].multiply((1 + (samples % 2)) / 2.0)
    sigma = 2 * jnp.sqrt(jnp.sum(w**2)) / samples

    nf = f.shape[0]
    shape = tuple(size[:-1]) + (nf,)
    k_r, k_i = jax.random.split(key)
    sr = jax.random.normal(k_r, shape) * s_scale
    si = jax.random.normal(k_i, shape) * s_scale

    if not (samples % 2):
        si = si.at[..., -1].set(0.0)
    si = si.at[..., 0].set(0.0)

    s = sr + 1j * si
    y = jnp.fft.irfft(s, n=samples, axis=-1) / sigma
    return y


# ------------------------------------------------------------------------ #
# Pixel manipulation (PlaNet)
# ------------------------------------------------------------------------ #
def quantize_obs(
    obs: jax.Array,
    bit_depth: int,
    key: Optional[jax.Array] = None,
    original_bit_depth: int = 8,
    add_noise: bool = False,
) -> jax.Array:
    """Reduce pixel bit depth; optionally dither with uniform noise in (0, ratio)."""
    ratio = 2 ** (original_bit_depth - bit_depth)
    quantized = (obs // ratio) * ratio
    if add_noise:
        if key is None:
            raise ValueError("quantize_obs(add_noise=True) requires a PRNG key")
        quantized = quantized.astype(jnp.float32) + ratio * jax.random.uniform(
            key, jnp.shape(obs)
        )
    return quantized
