"""Model-as-environment: batched imagined rollouts of a learned dynamics model.

Capability parity with the reference ``mbrl/models/model_env.py`` (reset :62-85,
step :87-140, evaluate_action_sequences :145-191 — "the single hot loop of PETS
planning"). Re-designed TPU-first:

  - the reference steps the model once per horizon step from Python, converting
    numpy<->torch at every boundary (model_env.py:111-112,136-139). Here the ENTIRE
    horizon rollout — input normalization, ensemble forward, propagation gather,
    Gaussian sampling, reward/termination — is one ``lax.scan`` inside one ``jax.jit``
    program; particles stay on device for the whole plan;
  - particle/population batching is a single leading axis, shardable across a device
    mesh for multi-chip planning;
  - randomness is an explicit key; terminated-particle masking uses a carried `alive`
    mask (no dynamic shapes).
"""
from __future__ import annotations

from functools import partial
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from mbrl_tpu.models import fast_rollout
from mbrl_tpu.types import RewardFn, TermFn


class ModelEnv:
    """Gym-like batched environment backed by a TransitionRewardModel.

    Learned rewards are used iff ``reward_fn is None`` (reference model_env.py:124-128).
    Terminal prediction is analytic via ``term_fn`` (learned terminals unsupported,
    as in the reference model_env.py:131-134).
    """

    def __init__(
        self,
        dynamics_model,
        termination_fn: TermFn,
        reward_fn: Optional[RewardFn] = None,
        particle_sharding=None,
    ):
        self.dynamics_model = dynamics_model
        self.termination_fn = termination_fn
        self.reward_fn = reward_fn
        # Optional NamedSharding for the particle batch axis: planning rollouts
        # shard rollout particles across the mesh's data axis (the framework's DP
        # axis — SURVEY.md §2.15); XLA partitions the whole scan accordingly.
        self.particle_sharding = particle_sharding
        self._step = jax.jit(self._step_impl, static_argnames=("sample",))
        self._evaluate = jax.jit(
            self._evaluate_impl, static_argnames=("num_particles",)
        )

    # ------------------------------------------------------------------ #
    def reset(
        self, state: Dict[str, Any], initial_obs_batch: jax.Array, key: jax.Array
    ) -> Dict[str, jax.Array]:
        """Initialize model state for a batch of simulated trajectories."""
        obs = jnp.asarray(initial_obs_batch, dtype=jnp.float32)
        return self.dynamics_model.reset(state, obs, key)

    # ------------------------------------------------------------------ #
    def _step_impl(
        self,
        state: Dict[str, Any],
        actions: jax.Array,
        model_state: Dict[str, jax.Array],
        key: jax.Array,
        sample: bool = False,
    ):
        next_obs, pred_rewards, next_model_state = self.dynamics_model.sample(
            state, actions, model_state, key, deterministic=not sample
        )
        rewards = (
            pred_rewards
            if self.reward_fn is None
            else self.reward_fn(actions, next_obs)
        )
        terminated = self.termination_fn(actions, next_obs)
        return next_obs, rewards, terminated, next_model_state

    def step(
        self,
        state: Dict[str, Any],
        actions: jax.Array,
        model_state: Dict[str, jax.Array],
        key: jax.Array,
        sample: bool = False,
    ) -> Tuple[jax.Array, jax.Array, jax.Array, Dict[str, jax.Array]]:
        """One simulated step for a batch of particles (jitted)."""
        return self._step(state, jnp.asarray(actions, jnp.float32), model_state, key, sample=sample)

    # ------------------------------------------------------------------ #
    def _evaluate_impl(
        self,
        state: Dict[str, Any],
        action_sequences: jax.Array,  # (P, H, A)
        initial_obs: jax.Array,  # (D,)
        key: jax.Array,
        num_particles: int,
    ) -> jax.Array:
        population, horizon, act_dim = action_sequences.shape
        batch = population * num_particles
        if self.particle_sharding is None and fast_rollout.supports_fast_rollout(
            self.dynamics_model, state, batch
        ):
            # whole rollout in shard space: one gather per step instead of three
            # (see models/fast_rollout.py)
            return fast_rollout.evaluate_action_sequences_sharded(
                self.dynamics_model,
                state,
                action_sequences,
                initial_obs,
                key,
                num_particles,
                reward_fn=self.reward_fn,
                termination_fn=self.termination_fn,
            )
        init_obs = jnp.broadcast_to(
            initial_obs, (batch,) + initial_obs.shape
        ).astype(jnp.float32)
        psh = self.particle_sharding
        if psh is not None:
            # XLA rejects uneven shardings: fall back to default placement when
            # the particle batch doesn't divide the data axis
            n_data = 1
            for axis in jax.tree_util.tree_leaves(tuple(psh.spec)):
                n_data *= psh.mesh.shape[axis]
            if batch % max(n_data, 1) == 0:
                init_obs = jax.lax.with_sharding_constraint(init_obs, psh)
        key, k_reset, k_prep = jax.random.split(key, 3)
        model_state = self.dynamics_model.reset(state, init_obs, k_reset)
        prepare = getattr(self.dynamics_model, "prepare_rollout", None)
        if prepare is not None:
            # batch per-step propagation randomness (e.g. TS1 permutations) into
            # one wide program before the scan instead of per-iteration sorts
            model_state = prepare(state, model_state, horizon, k_prep)

        # (H, P, A) for the scan; each sequence's action repeated per particle.
        acts_by_time = jnp.swapaxes(action_sequences, 0, 1)

        def step_fn(carry, acts_t):
            model_state, total, alive, key = carry
            key, k = jax.random.split(key)
            act_batch = jnp.repeat(acts_t, num_particles, axis=0)  # (P*N, A)
            next_obs, pred_rewards, next_model_state = self.dynamics_model.sample(
                state, act_batch, model_state, k
            )
            rewards = (
                pred_rewards
                if self.reward_fn is None
                else self.reward_fn(act_batch, next_obs)
            )
            rewards = jnp.reshape(rewards, (batch,))
            terminated = jnp.reshape(
                self.termination_fn(act_batch, next_obs), (batch,)
            )
            total = total + jnp.where(alive, rewards, 0.0)
            alive = jnp.logical_and(alive, jnp.logical_not(terminated))
            return (next_model_state, total, alive, key), None

        init = (
            model_state,
            jnp.zeros((batch,), jnp.float32),
            jnp.ones((batch,), bool),
            key,
        )
        (model_state, total, _, _), _ = jax.lax.scan(step_fn, init, acts_by_time)
        return total.reshape(population, num_particles).mean(axis=1)

    def evaluate_action_sequences(
        self,
        state: Dict[str, Any],
        action_sequences: jax.Array,
        initial_obs: jax.Array,
        key: jax.Array,
        num_particles: int,
    ) -> jax.Array:
        """Expected return of each candidate action sequence under the model.

        One jitted program: scan over horizon, particles masked after termination,
        mean over particles per sequence. Returns ``(population,)`` values.
        """
        return self._evaluate(
            state,
            jnp.asarray(action_sequences, jnp.float32),
            jnp.asarray(initial_obs, jnp.float32),
            key,
            num_particles=num_particles,
        )

    def make_trajectory_eval_fn(self, num_particles: int) -> Callable:
        """Bind a (state, action_sequences, initial_obs, key) -> values closure for
        trajectory optimizer agents (parity: create_trajectory_optim_agent_for_model,
        reference trajectory_opt.py:719-749)."""
        return partial(self.evaluate_action_sequences, num_particles=num_particles)
