"""Semantic wrapper adapting raw (obs, act) -> (next_obs, reward) tensor models to
TransitionBatch-level training and trajectory simulation.

Capability parity with the reference ``mbrl/models/one_dim_tr_model.py``
(OneDTransitionRewardModel: input concat + obs_process_fn + normalization :103-116,
delta targets with no_delta_list exemptions :118-136, learned reward as the last output
column :131-136 split back at sample time :281-288, update_normalizer :142-162,
save/load of model+normalizer :314-322, reset/sample state threading :245-312).

Re-design: the wrapper is stateless; everything mutable lives in a ``state`` dict
pytree ``{"params": model params, "normalizer": NormalizerState | None}`` carried
through jitted programs, so model rollouts (normalize -> forward -> denormalize-delta)
compile into the surrounding scan.
"""
from __future__ import annotations

import pathlib
import pickle
from typing import Any, Callable, Dict, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from mbrl_tpu.ops import normalizer as nrm
from mbrl_tpu.types import TransitionBatch

_PARAMS_FNAME = "model.pkl"


class TransitionRewardModel:
    """Wraps an ensemble dynamics model with dataset/rollout semantics.

    Args:
        model: the wrapped model (GaussianMLP / BasicEnsemble protocol).
        target_is_delta: predict ``next_obs - obs`` instead of ``next_obs``.
        normalize: keep input normalizer stats and normalize model inputs.
        normalize_double_precision: float64 normalizer stats (PETS default).
        learned_rewards: model's last output column predicts reward.
        obs_process_fn: optional pure fn applied to observations before concat.
        no_delta_list: observation dims exempt from delta-prediction.
    """

    def __init__(
        self,
        model,
        target_is_delta: bool = True,
        normalize: bool = False,
        normalize_double_precision: bool = False,
        learned_rewards: bool = True,
        obs_process_fn: Optional[Callable[[jax.Array], jax.Array]] = None,
        no_delta_list: Optional[Sequence[int]] = None,
        num_elites: Optional[int] = None,
    ):
        self.model = model
        # default: all members are elite (reference one_dim_tr_model.py:99-101)
        self.num_elites = num_elites or getattr(model, "num_members", 1)
        self.frozen_param_keys = getattr(model, "frozen_param_keys", ())
        self.target_is_delta = target_is_delta
        self.normalize = normalize
        self.normalize_double_precision = normalize_double_precision
        self.learned_rewards = learned_rewards
        self.obs_process_fn = obs_process_fn
        self.no_delta_list = tuple(no_delta_list or ())

    # ------------------------------------------------------------------ #
    # State
    # ------------------------------------------------------------------ #
    def init(self, key: jax.Array, obs_size: Optional[int] = None) -> Dict[str, Any]:
        params = self.model.init(key)
        normalizer = None
        if self.normalize:
            # float64 stats only when x64 is enabled; silently use f32 otherwise
            use_x64 = self.normalize_double_precision and jax.config.jax_enable_x64
            dtype = jnp.float64 if use_x64 else jnp.float32
            normalizer = nrm.init_normalizer(self.model.in_size, dtype=dtype)
        return {"params": params, "normalizer": normalizer}

    def update_normalizer(
        self, state: Dict[str, Any], batch: TransitionBatch
    ) -> Dict[str, Any]:
        """Recompute normalizer stats from (processed obs, act) of the batch."""
        if not self.normalize:
            return state
        obs, act = jnp.asarray(batch.obs), jnp.asarray(batch.act)
        if obs.ndim == 1:
            obs, act = obs[None], act[None]
        if self.obs_process_fn is not None:
            obs = self.obs_process_fn(obs)
        model_in = jnp.concatenate([obs, act], axis=-1)
        return {
            **state,
            "normalizer": nrm.update_stats(state["normalizer"], model_in),
        }

    def update_normalizer_host(
        self, state: Dict[str, Any], batch: TransitionBatch
    ) -> Dict[str, Any]:
        """Host-numpy stats recompute (see ops.normalizer.update_stats_host);
        falls back to the device path when an obs_process_fn (jnp) is configured."""
        if not self.normalize:
            return state
        if self.obs_process_fn is not None:
            return self.update_normalizer(state, batch)
        obs = np.asarray(batch.obs)
        act = np.asarray(batch.act)
        if obs.ndim == 1:
            obs, act = obs[None], act[None]
        model_in = np.concatenate([obs, act], axis=-1)
        return {
            **state,
            "normalizer": nrm.update_stats_host(state["normalizer"], model_in),
        }

    # ------------------------------------------------------------------ #
    # Batch processing
    # ------------------------------------------------------------------ #
    def _model_input(self, state: Dict[str, Any], obs: jax.Array, act: jax.Array) -> jax.Array:
        if self.obs_process_fn is not None:
            obs = self.obs_process_fn(obs)
        model_in = jnp.concatenate([obs, act], axis=-1)
        if self.normalize:
            stats = state["normalizer"]
            model_in = nrm.normalize(stats, model_in.astype(stats.mean.dtype))
        return model_in.astype(jnp.float32)

    def process_batch(
        self, state: Dict[str, Any], batch: TransitionBatch
    ) -> Tuple[jax.Array, jax.Array]:
        """TransitionBatch -> (model_in, target). Leading dims pass through, so
        bootstrapped ``E x B`` batches work unchanged."""
        obs = jnp.asarray(batch.obs, dtype=jnp.float32)
        act = jnp.asarray(batch.act, dtype=jnp.float32)
        next_obs = jnp.asarray(batch.next_obs, dtype=jnp.float32)
        rewards = jnp.asarray(batch.rewards, dtype=jnp.float32)
        if rewards.ndim == obs.ndim - 1:
            rewards = rewards[..., None]

        if self.target_is_delta:
            target_obs = next_obs - obs
            for dim in self.no_delta_list:
                target_obs = target_obs.at[..., dim].set(next_obs[..., dim])
        else:
            target_obs = next_obs

        model_in = self._model_input(state, obs, act)
        if self.learned_rewards:
            target = jnp.concatenate([target_obs, rewards], axis=-1)
        else:
            target = target_obs
        return model_in, target

    # ------------------------------------------------------------------ #
    # Train/eval delegation
    # ------------------------------------------------------------------ #
    def loss(self, state: Dict[str, Any], batch: TransitionBatch):
        model_in, target = self.process_batch(state, batch)
        return self.model.loss(state["params"], model_in, target)

    def eval_score(self, state: Dict[str, Any], batch: TransitionBatch):
        model_in, target = self.process_batch(state, batch)
        return self.model.eval_score(state["params"], model_in, target)

    # ------------------------------------------------------------------ #
    # Simulation
    # ------------------------------------------------------------------ #
    def reset(self, state: Dict[str, Any], obs: jax.Array, key: jax.Array) -> Dict[str, jax.Array]:
        """Start simulated trajectories from a batch of observations."""
        return self.model.reset_1d(obs, key)

    def prepare_rollout(
        self,
        state: Dict[str, Any],
        model_state: Dict[str, jax.Array],
        horizon: int,
        key: jax.Array,
    ) -> Dict[str, jax.Array]:
        """Let the wrapped model precompute per-step rollout state (e.g. the full
        stack of TS1 propagation permutations) for a fixed-horizon rollout."""
        inner = getattr(self.model, "prepare_rollout", None)
        if inner is None:
            return model_state
        return inner(state["params"], model_state, horizon, key)

    def sample(
        self,
        state: Dict[str, Any],
        act: jax.Array,
        model_state: Dict[str, jax.Array],
        key: jax.Array,
        deterministic: bool = False,
    ) -> Tuple[jax.Array, Optional[jax.Array], Dict[str, jax.Array]]:
        """One simulated transition for a batch of particles.

        Returns (next_obs, rewards_or_None, next_model_state)."""
        obs = model_state["obs"]
        model_in = self._model_input(state, obs, act)
        preds, next_model_state = self.model.sample_1d(
            state["params"], model_in, model_state, key, deterministic=deterministic
        )
        next_obs = preds[:, :-1] if self.learned_rewards else preds
        if self.target_is_delta:
            full = next_obs + obs
            for dim in self.no_delta_list:
                full = full.at[:, dim].set(next_obs[:, dim])
            next_obs = full
        rewards = preds[:, -1:] if self.learned_rewards else None
        next_model_state = {**next_model_state, "obs": next_obs}
        return next_obs, rewards, next_model_state

    # ------------------------------------------------------------------ #
    # Elites / persistence
    # ------------------------------------------------------------------ #
    def set_propagation_method(self, propagation_method: Optional[str] = None) -> None:
        """Switch the wrapped ensemble's trajectory-sampling mode (parity:
        reference one_dim_tr_model.py:329-332). Jitted programs retrace on the
        next call since the method is static configuration."""
        if hasattr(self.model, "propagation_method"):
            self.model.propagation_method = propagation_method

    def set_elite(self, state: Dict[str, Any], elite_indices) -> Dict[str, Any]:
        return {**state, "params": self.model.set_elite(state["params"], elite_indices)}

    def __len__(self) -> int:
        return len(self.model)

    def save(self, state: Dict[str, Any], save_dir: Union[str, pathlib.Path]) -> None:
        # fetch only what gets persisted (state may also carry Adam moments)
        host_state = jax.device_get(
            {"params": state["params"], "normalizer": state.get("normalizer")}
        )
        with open(pathlib.Path(save_dir) / _PARAMS_FNAME, "wb") as f:
            pickle.dump(
                {
                    "params": host_state["params"],
                    "normalizer": None
                    if host_state["normalizer"] is None
                    else {
                        "mean": np.asarray(host_state["normalizer"].mean),
                        "std": np.asarray(host_state["normalizer"].std),
                    },
                },
                f,
            )

    def load(self, state: Dict[str, Any], load_dir: Union[str, pathlib.Path]) -> Dict[str, Any]:
        with open(pathlib.Path(load_dir) / _PARAMS_FNAME, "rb") as f:
            payload = pickle.load(f)
        params = jax.tree_util.tree_map(jnp.asarray, payload["params"])
        normalizer = state["normalizer"]
        if payload["normalizer"] is not None and normalizer is not None:
            normalizer = normalizer.replace(
                mean=jnp.asarray(payload["normalizer"]["mean"], dtype=normalizer.mean.dtype),
                std=jnp.asarray(payload["normalizer"]["std"], dtype=normalizer.std.dtype),
            )
        return {"params": params, "normalizer": normalizer}
