"""Batched analytic reward functions as pure jnp functions.

Capability parity with the reference ``mbrl/env/reward_fns.py:10-53`` (cartpole,
cartpole_pets, inverted_pendulum, halfcheetah, pusher). All take ``(act, next_obs)``
batches and return ``(B, 1)`` float rewards; compile into the rollout scan.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from . import termination_fns


def cartpole(act: jax.Array, next_obs: jax.Array) -> jax.Array:
    return (~termination_fns.cartpole(act, next_obs)).astype(jnp.float32)


def cartpole_pets(act: jax.Array, next_obs: jax.Array) -> jax.Array:
    goal_pos = jnp.array([0.0, 0.6])
    x0 = next_obs[:, :1]
    theta = next_obs[:, 1:2]
    ee_pos = jnp.concatenate([x0 - 0.6 * jnp.sin(theta), -0.6 * jnp.cos(theta)], axis=1)
    obs_cost = jnp.exp(-jnp.sum(jnp.square(ee_pos - goal_pos), axis=1) / (0.6**2))
    act_cost = -0.01 * jnp.sum(jnp.square(act), axis=1)
    return (obs_cost + act_cost)[:, None]


def inverted_pendulum(act: jax.Array, next_obs: jax.Array) -> jax.Array:
    return (~termination_fns.inverted_pendulum(act, next_obs)).astype(jnp.float32)


def halfcheetah(act: jax.Array, next_obs: jax.Array) -> jax.Array:
    reward_ctrl = -0.1 * jnp.square(act).sum(axis=1)
    reward_run = next_obs[:, 0]
    return (reward_run + reward_ctrl)[:, None]


def pusher(act: jax.Array, next_obs: jax.Array) -> jax.Array:
    goal_pos = jnp.array([0.45, -0.05, -0.323])
    to_w, og_w = 0.5, 1.25
    tip_pos, obj_pos = next_obs[:, 14:17], next_obs[:, 17:20]
    tip_obj_dist = jnp.abs(tip_pos - obj_pos).sum(axis=1)
    obj_goal_dist = jnp.abs(goal_pos - obj_pos).sum(axis=1)
    obs_cost = to_w * tip_obj_dist + og_w * obj_goal_dist
    act_cost = 0.1 * jnp.square(act).sum(axis=1)
    return -(obs_cost + act_cost)[:, None]
