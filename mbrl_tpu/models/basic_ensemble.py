"""Generic ensemble over any single-member model, evaluated with `jax.vmap`.

Capability parity with the reference ``mbrl/models/basic_ensemble.py`` (python-loop
over heterogeneous members :94-101, per-member index masking for TS1/TSinf :103-129,
average loss over members :196-221). Re-design: members share one architecture (the
member model object) and their stacked parameters carry the ensemble axis, so the
"loop over members" is a single vmapped XLA program. Per-member parameter
customization (e.g. the propagation-decoding mock models in tests) is done by editing
the stacked params pytree.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

Params = Dict[str, Any]


class BasicEnsemble:
    """Ensemble-of-any-model: member forward is vmapped over a stacked params axis.

    The member model must expose ``init(key) -> params`` and
    ``forward(params, x) -> (mean, logvar_or_None)`` plus ``in_size`` / ``out_size`` /
    ``deterministic`` attributes.
    """

    def __init__(
        self,
        ensemble_size: int,
        member_model=None,
        propagation_method: Optional[str] = None,
        member_cfg=None,
    ):
        # `member_cfg` is the config-instantiation alias (an already-instantiated
        # member model arrives under that name from the YAML tree)
        if member_model is None:
            member_model = member_cfg
        if member_model is None:
            raise ValueError("BasicEnsemble requires a member model")
        self.ensemble_size = ensemble_size
        self.member = member_model
        self.propagation_method = propagation_method
        self.in_size = member_model.in_size
        self.out_size = member_model.out_size
        self.deterministic = member_model.deterministic

    @property
    def num_members(self) -> int:
        return self.ensemble_size

    def __len__(self) -> int:
        return self.ensemble_size

    def init(self, key: jax.Array) -> Params:
        keys = jax.random.split(key, self.ensemble_size)
        member_params = jax.vmap(self.member.init)(keys)
        return {"members": member_params, "elite": jnp.arange(self.ensemble_size, dtype=jnp.int32)}

    def num_elites(self, params: Params) -> int:
        return int(params["elite"].shape[0])

    def set_elite(self, params: Params, elite_indices) -> Params:
        # The reference warns and ignores elites for BasicEnsemble (:262-266); we
        # support them uniformly via the same data-in-params mechanism.
        new = dict(params)
        new["elite"] = jnp.asarray(elite_indices, dtype=jnp.int32)
        return new

    # ------------------------------------------------------------------ #
    def _member_forward_all(self, params: Params, x: jax.Array, use_only_elite: bool):
        member_params = params["members"]
        if use_only_elite and self.ensemble_size > 1:
            member_params = jax.tree_util.tree_map(
                lambda leaf: jnp.take(leaf, params["elite"], axis=0), member_params
            )
        num_used = jax.tree_util.tree_leaves(member_params)[0].shape[0]
        if x.ndim == 2:
            xs = jnp.broadcast_to(x, (num_used,) + x.shape)
        else:
            xs = x

        def fwd(p, xi):
            mean, logvar = self.member.forward(p, xi)
            # members that are themselves (1-member) ensembles produce a leading
            # singleton axis; collapse it so the vmap axis is THE ensemble axis
            if mean.ndim == 3:
                mean = mean[0]
                logvar = None if logvar is None else logvar[0]
            if logvar is None:
                return mean, jnp.zeros_like(mean)
            return mean, logvar

        mean, logvar = jax.vmap(fwd)(member_params, xs)
        return mean, (None if self.deterministic else logvar)

    def forward(
        self, params: Params, x: jax.Array, use_only_elite: bool = False
    ) -> Tuple[jax.Array, Optional[jax.Array]]:
        """All-member forward -> ``(E', B, out)`` mean/logvar."""
        return self._member_forward_all(params, x, use_only_elite)

    def forward_propagated(
        self,
        params: Params,
        x: jax.Array,
        key: Optional[jax.Array] = None,
        propagation_indices: Optional[jax.Array] = None,
    ) -> Tuple[jax.Array, Optional[jax.Array]]:
        method = self.propagation_method
        if method is None:
            return self.forward(params, x)
        mean, logvar = self.forward(params, x, use_only_elite=True)
        num_used, batch = mean.shape[0], x.shape[0]
        if method == "random_model":
            if key is None:
                raise ValueError("random_model propagation requires a PRNG key")
            idx = jax.random.randint(key, (batch,), 0, num_used)
        elif method == "fixed_model":
            if propagation_indices is None:
                raise ValueError("fixed_model propagation requires propagation_indices")
            idx = propagation_indices % num_used
        elif method == "expectation":
            return mean.mean(axis=0), None if logvar is None else logvar.mean(axis=0)
        else:
            raise ValueError(f"Invalid propagation method {method}.")
        g = idx[None, :, None]
        m = jnp.take_along_axis(mean, g, axis=0)[0]
        lv = None if logvar is None else jnp.take_along_axis(logvar, g, axis=0)[0]
        return m, lv

    # ------------------------------------------------------------------ #
    def loss(self, params: Params, model_in: jax.Array, target: jax.Array):
        """Average member loss; member losses computed under vmap."""
        if model_in.ndim == 2:
            model_in = jnp.broadcast_to(
                model_in, (self.ensemble_size,) + model_in.shape
            )
            target = jnp.broadcast_to(target, (self.ensemble_size,) + target.shape)

        def member_loss(p, mi, tg):
            loss, _ = self.member.loss(p, mi, tg)
            return loss

        losses = jax.vmap(member_loss)(params["members"], model_in, target)
        return losses.mean(), {}

    def eval_score(self, params: Params, model_in: jax.Array, target: jax.Array):
        mean, _ = self.forward(params, model_in)
        target = jnp.broadcast_to(target, mean.shape)
        return jnp.square(mean - target), {}

    # ------------------------------------------------------------------ #
    def sample_propagation_indices(self, batch_size: int, key: jax.Array) -> jax.Array:
        return jax.random.randint(key, (batch_size,), 0, self.ensemble_size)

    def reset_1d(self, obs: jax.Array, key: jax.Array) -> Dict[str, jax.Array]:
        batch = obs.shape[0]
        if self.propagation_method == "fixed_model":
            indices = self.sample_propagation_indices(batch, key)
        else:
            indices = jnp.zeros((batch,), dtype=jnp.int32)
        return {"obs": obs, "propagation_indices": indices}

    def sample_1d(
        self,
        params: Params,
        model_input: jax.Array,
        model_state: Dict[str, jax.Array],
        key: jax.Array,
        deterministic: bool = False,
    ) -> Tuple[jax.Array, Dict[str, jax.Array]]:
        k_prop, k_noise = jax.random.split(key)
        mean, logvar = self.forward_propagated(
            params,
            model_input,
            key=k_prop,
            propagation_indices=model_state["propagation_indices"],
        )
        if deterministic or self.deterministic or logvar is None:
            return mean, model_state
        std = jnp.exp(0.5 * logvar)
        return mean + std * jax.random.normal(k_noise, mean.shape, mean.dtype), model_state
