"""Batched analytic termination predicates as pure jnp functions.

Capability parity with the reference ``mbrl/env/termination_fns.py:12-95`` (hopper,
cartpole, inverted_pendulum, no_termination, walker2d, ant, humanoid). All take
``(act, next_obs)`` batches and return ``(B, 1)`` bool; being pure jnp they compile
into the ModelEnv rollout scan.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def hopper(act: jax.Array, next_obs: jax.Array) -> jax.Array:
    height = next_obs[:, 0]
    angle = next_obs[:, 1]
    not_done = (
        jnp.isfinite(next_obs).all(-1)
        & (jnp.abs(next_obs[:, 1:]) < 100).all(-1)
        & (height > 0.7)
        & (jnp.abs(angle) < 0.2)
    )
    return (~not_done)[:, None]


def cartpole(act: jax.Array, next_obs: jax.Array) -> jax.Array:
    x, theta = next_obs[:, 0], next_obs[:, 2]
    x_threshold = 2.4
    theta_threshold = 12 * 2 * math.pi / 360
    not_done = (
        (x > -x_threshold)
        & (x < x_threshold)
        & (theta > -theta_threshold)
        & (theta < theta_threshold)
    )
    return (~not_done)[:, None]


def inverted_pendulum(act: jax.Array, next_obs: jax.Array) -> jax.Array:
    not_done = jnp.isfinite(next_obs).all(-1) & (jnp.abs(next_obs[:, 1]) <= 0.2)
    return (~not_done)[:, None]


def no_termination(act: jax.Array, next_obs: jax.Array) -> jax.Array:
    return jnp.zeros((next_obs.shape[0], 1), dtype=bool)


def walker2d(act: jax.Array, next_obs: jax.Array) -> jax.Array:
    height = next_obs[:, 0]
    angle = next_obs[:, 1]
    not_done = (height > 0.8) & (height < 2.0) & (angle > -1.0) & (angle < 1.0)
    return (~not_done)[:, None]


def ant(act: jax.Array, next_obs: jax.Array) -> jax.Array:
    x = next_obs[:, 0]
    not_done = jnp.isfinite(next_obs).all(-1) & (x >= 0.2) & (x <= 1.0)
    return (~not_done)[:, None]


def humanoid(act: jax.Array, next_obs: jax.Array) -> jax.Array:
    z = next_obs[:, 0]
    return ((z < 1.0) | (z > 2.0))[:, None]
