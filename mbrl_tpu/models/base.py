"""Formal model protocols (the framework's model contract).

Capability parity with the reference's abstract base classes
``mbrl/models/model.py`` (Model:19-245 — forward/loss/eval_score/update/reset/
sample/save/load contract; Ensemble:251-473 — the three uncertainty-propagation
modes, elite handling, reset_1d/sample_1d simulation contract).

In a functional framework the contract is a *protocol over explicit state* rather
than an inheritance hierarchy: any object implementing these methods plugs into
``TransitionRewardModel`` / ``ModelEnv`` / ``ModelTrainer``. The Protocol classes
below document and type-check that surface (GaussianMLP, BasicEnsemble and
PlaNetModel all satisfy them structurally).
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Protocol, Tuple, runtime_checkable

import jax

Params = Dict[str, Any]

# The three PETS trajectory-sampling modes (reference model.py:259-267)
PROPAGATION_METHODS = ("random_model", "fixed_model", "expectation")


@runtime_checkable
class DynamicsModel(Protocol):
    """A raw tensor model: (stacked) params + pure forward/loss/eval functions."""

    in_size: int
    out_size: int
    deterministic: bool

    def init(self, key: jax.Array) -> Params:
        """Create the parameter pytree."""

    def forward(
        self, params: Params, x: jax.Array, use_only_elite: bool = False
    ) -> Tuple[jax.Array, Optional[jax.Array]]:
        """All-member forward -> (mean, logvar|None), member axis leading."""

    def loss(
        self, params: Params, model_in: jax.Array, target: jax.Array
    ) -> Tuple[jax.Array, Dict[str, Any]]:
        """Training loss (scalar) + metadata."""

    def eval_score(
        self, params: Params, model_in: jax.Array, target: jax.Array
    ) -> Tuple[jax.Array, Dict[str, Any]]:
        """Non-reduced per-member validation score."""


@runtime_checkable
class EnsembleModel(DynamicsModel, Protocol):
    """A dynamics model with the 1-D simulation contract used by ModelEnv."""

    ensemble_size: int
    propagation_method: Optional[str]

    def reset_1d(self, obs: jax.Array, key: jax.Array) -> Dict[str, jax.Array]:
        """Start simulated trajectories: returns the model-state pytree
        ({"obs", "propagation_indices"})."""

    def sample_1d(
        self,
        params: Params,
        model_input: jax.Array,
        model_state: Dict[str, jax.Array],
        key: jax.Array,
        deterministic: bool = False,
    ) -> Tuple[jax.Array, Dict[str, jax.Array]]:
        """One stochastic transition under the configured propagation mode."""

    def sample_propagation_indices(self, batch_size: int, key: jax.Array) -> jax.Array:
        """Persistent per-trajectory member assignment (TSinf)."""

    def set_elite(self, params: Params, elite_indices) -> Params:
        """Return params with a new elite member set."""
