"""Probabilistic ensemble MLP (the PETS/MBPO workhorse dynamics model).

Capability parity with the reference ``mbrl/models/gaussian_mlp.py`` (ensemble of MLPs
predicting per-output mean and soft-bounded log-variance, Gaussian NLL loss with logvar
bound regularizer :291-305, elite subsetting :377-379, per-member MSE eval :337-361,
truncated-normal init mbrl/models/util.py:15-28), re-designed TPU-first:

  - all ensemble members evaluate in ONE batched einsum over a leading member axis
    (the reference's ``EnsembleLinearLayer`` bmm, mbrl/models/util.py:31-77, becomes an
    ``ebi,eio->ebo`` contraction — large MXU matmuls, no Python loops);
  - uncertainty propagation uses the reference's equal-shard permute-reshape trick
    (gaussian_mlp.py:156-216) when the batch divides the elite count — each member
    computes only B/E rows, 1/E the FLOPs — and falls back to computing every
    member's output with an exact per-row gather for arbitrary batch sizes;
  - elite subsetting is a fixed-size parameter gather (num_elites static), so rollout
    programs have static shapes;
  - parameters are a plain pytree; randomness is explicit PRNG keys (fixing the
    reference's torch.Generator segfault workaround, gaussian_mlp.py:379-380).

Config is static Python; everything dynamic (including elite indices) lives in the
params pytree so checkpoints capture it and jitted programs treat it as data.
"""
from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from mbrl_tpu.ops.math import truncated_normal_init

Params = Dict[str, Any]

_ACTIVATIONS: Dict[str, Callable[[jax.Array], jax.Array]] = {
    "relu": jax.nn.relu,
    "silu": jax.nn.silu,
    "swish": jax.nn.silu,
    "tanh": jnp.tanh,
    "elu": jax.nn.elu,
    "gelu": jax.nn.gelu,
    "leaky_relu": jax.nn.leaky_relu,
}

LOGVAR_BOUND_WEIGHT = 0.01  # weight of the max/min logvar regularizer (reference :304)


class GaussianMLP:
    """Ensemble of Gaussian MLPs evaluated as one batched program.

    Output head predicts ``2*out_size`` values (mean, raw logvar) unless
    ``deterministic``. Logvar is soft-bounded between learned/fixed min/max bounds.
    """

    # ModelEnv may run whole-horizon rollouts through the shard-space fast path
    # (models/fast_rollout.py) instead of per-step sample() calls
    supports_fast_rollout = True

    def __init__(
        self,
        in_size: int,
        out_size: int,
        num_layers: int = 4,
        ensemble_size: int = 1,
        hid_size: int = 200,
        deterministic: bool = False,
        propagation_method: Optional[str] = None,
        learn_logvar_bounds: bool = False,
        activation: str = "relu",
        compute_dtype=jnp.float32,
        use_pallas: bool = False,
        pallas_tile: int = 512,
        rollout_shuffle: str = "sort",
    ):
        if rollout_shuffle not in ("sort", "rotate"):
            raise ValueError(
                f"rollout_shuffle must be 'sort' or 'rotate', got {rollout_shuffle!r}"
            )
        if isinstance(compute_dtype, str):
            compute_dtype = jnp.dtype(compute_dtype).type
        if activation not in _ACTIVATIONS:
            raise ValueError(
                f"Unknown activation {activation!r}; options: {sorted(_ACTIVATIONS)}"
            )
        self.in_size = in_size
        self.out_size = out_size
        self.num_layers = num_layers
        self.ensemble_size = ensemble_size
        self.hid_size = hid_size
        self.deterministic = deterministic
        self.propagation_method = propagation_method
        self.learn_logvar_bounds = learn_logvar_bounds
        self.activation = _ACTIVATIONS[activation]
        self.compute_dtype = compute_dtype
        # Pallas fused-MLP rollout kernel (keeps the whole layer chain in VMEM);
        # applies to the equal-shard propagation path when shapes tile.
        self.use_pallas = use_pallas
        self.pallas_tile = pallas_tile
        # TS1 re-shuffle flavor in the fast rollout (models/fast_rollout.py):
        # "sort" = exact fresh uniform permutation per step (a device sort,
        # ~65us per 8k-row step); "rotate" = random whole-batch rotation per
        # step — member marginals stay uniform and exactly balanced, and
        # assignments are independent across steps, but particle PAIRS at small
        # initial offsets co-locate more often than under iid permutations.
        # Unbiased value estimates, slightly higher variance, ~2x faster planning.
        self.rollout_shuffle = rollout_shuffle
        # params excluded from gradient updates (reference: min/max_logvar are
        # nn.Parameters with requires_grad=learn_logvar_bounds, gaussian_mlp.py:118-124)
        self.frozen_param_keys = (
            () if (deterministic or learn_logvar_bounds) else ("min_logvar", "max_logvar")
        )

    # ------------------------------------------------------------------ #
    # Params
    # ------------------------------------------------------------------ #
    @property
    def num_members(self) -> int:
        return self.ensemble_size

    def __len__(self) -> int:
        return self.ensemble_size

    def init(self, key: jax.Array) -> Params:
        """Initialize parameters: truncated-normal weights (std 1/(2*sqrt(fan_in))),
        zero biases, logvar bounds at (-10, 0.5), elites = all members."""
        e = self.ensemble_size
        dims = [self.in_size] + [self.hid_size] * self.num_layers
        head_out = self.out_size if self.deterministic else 2 * self.out_size
        keys = jax.random.split(key, self.num_layers + 1)

        layers = []
        for i in range(self.num_layers):
            layers.append(
                {
                    "w": truncated_normal_init(
                        keys[i], (e, dims[i], dims[i + 1]), fan_in=dims[i]
                    ),
                    "b": jnp.zeros((e, 1, dims[i + 1])),
                }
            )
        params: Params = {
            "layers": layers,
            "head": {
                "w": truncated_normal_init(
                    keys[-1], (e, self.hid_size, head_out), fan_in=self.hid_size
                ),
                "b": jnp.zeros((e, 1, head_out)),
            },
            # all members are elite until the trainer ranks them
            "elite": jnp.arange(e, dtype=jnp.int32),
        }
        if not self.deterministic:
            params["min_logvar"] = -10.0 * jnp.ones((1, self.out_size))
            params["max_logvar"] = 0.5 * jnp.ones((1, self.out_size))
        return params

    def num_elites(self, params: Params) -> int:
        return int(params["elite"].shape[0])

    def set_elite(self, params: Params, elite_indices) -> Params:
        """Return params with a new elite set (stored as data in the pytree)."""
        new = dict(params)
        new["elite"] = jnp.asarray(elite_indices, dtype=jnp.int32)
        return new

    def _elite_view(self, params: Params) -> Params:
        """Gather the elite members' weights (fixed-size gather; static shapes)."""
        if self.ensemble_size == 1:
            return params
        elite = params["elite"]

        def take(leaf):
            return jnp.take(leaf, elite, axis=0)

        return {
            "layers": [{"w": take(l["w"]), "b": take(l["b"])} for l in params["layers"]],
            "head": {"w": take(params["head"]["w"]), "b": take(params["head"]["b"])},
            "elite": jnp.arange(elite.shape[0], dtype=jnp.int32),
            **(
                {}
                if self.deterministic
                else {
                    "min_logvar": params["min_logvar"],
                    "max_logvar": params["max_logvar"],
                }
            ),
        }

    # ------------------------------------------------------------------ #
    # Forward
    # ------------------------------------------------------------------ #
    def forward(
        self, params: Params, x: jax.Array, use_only_elite: bool = False
    ) -> Tuple[jax.Array, Optional[jax.Array]]:
        """All-member forward.

        ``x`` is ``(B, in)`` (broadcast to every member) or ``(E, B, in)``.
        Returns ``(mean, logvar)`` with shape ``(E', B, out)`` where E' is the number
        of members used (elites if ``use_only_elite``). Logvar is None when
        deterministic.
        """
        p = self._elite_view(params) if use_only_elite else params
        num_used = p["head"]["w"].shape[0]
        cdt = self.compute_dtype
        h = x.astype(cdt)
        if h.ndim == 2:
            h = jnp.broadcast_to(h, (num_used,) + h.shape)
        for layer in p["layers"]:
            # both einsum operands in compute_dtype (bf16 runs the MXU at full
            # rate; a mixed f32/bf16 contraction silently promotes to f32),
            # accumulation always f32
            h = jnp.einsum(
                "ebi,eio->ebo",
                h,
                layer["w"].astype(cdt),
                preferred_element_type=jnp.float32,
            )
            h = self.activation(h + layer["b"]).astype(cdt)
        out = jnp.einsum(
            "ebi,eio->ebo",
            h,
            p["head"]["w"].astype(cdt),
            preferred_element_type=jnp.float32,
        )
        out = out + p["head"]["b"]
        if self.deterministic:
            return out, None
        mean = out[..., : self.out_size]
        logvar = out[..., self.out_size :]
        # soft double-bounding keeps logvar in (min_logvar, max_logvar) smoothly
        logvar = p["max_logvar"] - jax.nn.softplus(p["max_logvar"] - logvar)
        logvar = p["min_logvar"] + jax.nn.softplus(logvar - p["min_logvar"])
        return mean, logvar

    def _forward_sharded(
        self,
        params: Params,
        x: jax.Array,
        perm: jax.Array,
        inv: Optional[jax.Array] = None,
    ) -> Tuple[jax.Array, Optional[jax.Array]]:
        """Equal-shard propagation: permute the batch, give each ELITE member an
        equal contiguous shard, forward, un-permute.

        This reproduces the reference's shuffle-reshape trick
        (gaussian_mlp.py:156-216) and computes only B rows total instead of E*B —
        the rollout hot path's dominant FLOP saving. Requires B %% num_elites == 0.
        ``inv`` (the inverse permutation) can be precomputed by ``prepare_rollout``
        so the scatter stays out of the rollout scan.
        """
        p = self._elite_view(params)
        num_used = p["head"]["w"].shape[0]
        batch = x.shape[0]
        h = x[perm].reshape(num_used, batch // num_used, x.shape[-1])
        if self.use_pallas and (batch // num_used) % self.pallas_tile == 0:
            from mbrl_tpu.ops.pallas_kernels import fused_ensemble_mlp

            raw = fused_ensemble_mlp(
                h.astype(self.compute_dtype),
                tuple(l["w"] for l in p["layers"]),
                tuple(l["b"] for l in p["layers"]),
                p["head"]["w"],
                p["head"]["b"],
                activation=self.activation,
                tile=self.pallas_tile,
            )
            if self.deterministic:
                mean, logvar = raw, None
            else:
                mean = raw[..., : self.out_size]
                logvar = raw[..., self.out_size :]
                logvar = p["max_logvar"] - jax.nn.softplus(p["max_logvar"] - logvar)
                logvar = p["min_logvar"] + jax.nn.softplus(logvar - p["min_logvar"])
        else:
            mean, logvar = self.forward(p, h)
        mean = mean.reshape(batch, -1)
        if logvar is not None:
            logvar = logvar.reshape(batch, -1)
        if inv is None:
            # scatter-based inverse permutation (cheaper than argsort)
            inv = jnp.zeros((batch,), jnp.int32).at[perm].set(
                jnp.arange(batch, dtype=jnp.int32)
            )
        return mean[inv], None if logvar is None else logvar[inv]

    def forward_propagated(
        self,
        params: Params,
        x: jax.Array,
        key: Optional[jax.Array] = None,
        propagation_indices: Optional[jax.Array] = None,
        precomputed: Optional[Tuple[jax.Array, jax.Array]] = None,
    ) -> Tuple[jax.Array, Optional[jax.Array]]:
        """Rollout-time forward that collapses the ensemble axis per the configured
        propagation method (over ELITE members). ``x`` is ``(B, in)``; returns
        ``(B, out)`` mean/logvar.

        For random_model/fixed_model with a batch divisible by the elite count, the
        equal-shard fast path runs (1/E the FLOPs); otherwise every member's output
        is computed and gathered per row (exact TS1/TSinf with arbitrary batch)."""
        method = self.propagation_method
        if method is None or self.ensemble_size == 1:
            mean, logvar = self.forward(params, x)
            if self.ensemble_size == 1:
                return mean[0], None if logvar is None else logvar[0]
            return mean, logvar

        num_used = int(params["elite"].shape[0])
        batch = x.shape[0]
        shardable = batch % num_used == 0

        if method == "random_model":
            if precomputed is not None:
                return self._forward_sharded(params, x, *precomputed)
            if key is None:
                raise ValueError("random_model propagation requires a PRNG key")
            if shardable:
                perm = jax.random.permutation(key, batch).astype(jnp.int32)
                return self._forward_sharded(params, x, perm)
            idx = jax.random.randint(key, (batch,), 0, num_used)
        elif method == "fixed_model":
            if propagation_indices is None:
                raise ValueError("fixed_model propagation requires propagation_indices")
            if shardable:
                # persistent permutation => persistent member assignment (TSinf)
                return self._forward_sharded(params, x, propagation_indices)
            idx = propagation_indices % num_used
        elif method == "expectation":
            mean, logvar = self.forward(params, x, use_only_elite=True)
            return mean.mean(axis=0), None if logvar is None else logvar.mean(axis=0)
        else:
            raise ValueError(f"Invalid propagation method {method}.")

        mean, logvar = self.forward(params, x, use_only_elite=True)
        gather = idx[None, :, None]
        m = jnp.take_along_axis(mean, gather, axis=0)[0]
        lv = None if logvar is None else jnp.take_along_axis(logvar, gather, axis=0)[0]
        return m, lv

    # ------------------------------------------------------------------ #
    # Losses
    # ------------------------------------------------------------------ #
    def loss(
        self, params: Params, model_in: jax.Array, target: jax.Array
    ) -> Tuple[jax.Array, Dict[str, Any]]:
        """Training loss over ``(E, B, in)/(E, B, out)`` (or 2-D, auto-lifted).

        Probabilistic: per-member Gaussian NLL (mean over batch and output dim,
        summed over members) + logvar-bound regularizer. Deterministic: summed MSE.
        """
        if model_in.ndim == 2:
            model_in = model_in[None]
            target = target[None]
        if target.shape[0] != self.ensemble_size:
            target = jnp.broadcast_to(target, (self.ensemble_size,) + target.shape[1:])
        mean, logvar = self.forward(params, model_in)
        if self.deterministic:
            return jnp.sum(jnp.square(mean - target)), {}
        nll_elem = jnp.square(mean - target) * jnp.exp(-logvar) + logvar
        nll = nll_elem.mean(axis=(1, 2)).sum()
        nll = nll + LOGVAR_BOUND_WEIGHT * (
            params["max_logvar"].sum() - params["min_logvar"].sum()
        )
        return nll, {}

    def eval_score(
        self, params: Params, model_in: jax.Array, target: jax.Array
    ) -> Tuple[jax.Array, Dict[str, Any]]:
        """Per-member squared error on un-bootstrapped data: ``(E, B, out)``."""
        mean, _ = self.forward(params, model_in)
        target = jnp.broadcast_to(target, mean.shape)
        return jnp.square(mean - target), {}

    # ------------------------------------------------------------------ #
    # Simulation contract (used via TransitionRewardModel by ModelEnv)
    # ------------------------------------------------------------------ #
    def sample_propagation_indices(self, batch_size: int, key: jax.Array) -> jax.Array:
        """Persistent batch permutation for TSinf (fixed_model) propagation.

        The permutation assigns each row to an equal elite-member shard (reference
        gaussian_mlp.py:379-393); the shard assignment stays fixed for the whole
        simulated trajectory. When the batch isn't divisible by the elite count the
        fallback path derives per-row members as ``perm %% num_elites``.
        """
        return jax.random.permutation(key, batch_size).astype(jnp.int32)

    def reset_1d(self, obs: jax.Array, key: jax.Array) -> Dict[str, jax.Array]:
        """Initial per-trajectory model state: propagation indices (always present so
        the state pytree has a fixed structure under jit)."""
        batch = obs.shape[0]
        if self.propagation_method == "fixed_model":
            indices = self.sample_propagation_indices(batch, key)
        else:
            indices = jnp.zeros((batch,), dtype=jnp.int32)
        return {"obs": obs, "propagation_indices": indices}

    def prepare_rollout(
        self,
        params: Params,
        model_state: Dict[str, jax.Array],
        horizon: int,
        key: jax.Array,
    ) -> Dict[str, jax.Array]:
        """Precompute all per-step propagation permutations for a fixed-horizon
        rollout (performance hook used by ModelEnv.evaluate_action_sequences).

        TS1 (random_model) draws a fresh batch permutation every step; generating
        the full (horizon, B) stack as ONE vmapped sort plus ONE batched scatter
        for the inverses is several times faster on TPU than ``horizon``
        sequential sorts inside the rollout scan — semantics are identical
        (same distribution, one permutation per step, fresh per call)."""
        if self.propagation_method != "random_model":
            return model_state
        batch = model_state["obs"].shape[0]
        num_used = int(params["elite"].shape[0])
        if self.ensemble_size == 1 or batch % num_used != 0:
            return model_state
        keys = jax.random.split(key, horizon)
        perms = jax.vmap(
            lambda k: jax.random.permutation(k, batch).astype(jnp.int32)
        )(keys)
        rows = jnp.arange(horizon, dtype=jnp.int32)[:, None]
        cols = jnp.broadcast_to(jnp.arange(batch, dtype=jnp.int32), perms.shape)
        invs = jnp.zeros_like(perms).at[rows, perms].set(cols)
        return {
            **model_state,
            "rollout_perms": perms,
            "rollout_invs": invs,
            "rollout_t": jnp.zeros((), jnp.int32),
        }

    def sample_1d(
        self,
        params: Params,
        model_input: jax.Array,
        model_state: Dict[str, jax.Array],
        key: jax.Array,
        deterministic: bool = False,
    ) -> Tuple[jax.Array, Dict[str, jax.Array]]:
        """One stochastic transition: propagated Gaussian head, reparameterized draw."""
        k_prop, k_noise = jax.random.split(key)
        precomputed = None
        if "rollout_perms" in model_state:
            t = model_state["rollout_t"]
            precomputed = (
                jnp.take(model_state["rollout_perms"], t, axis=0, mode="clip"),
                jnp.take(model_state["rollout_invs"], t, axis=0, mode="clip"),
            )
            model_state = {**model_state, "rollout_t": t + 1}
        mean, logvar = self.forward_propagated(
            params,
            model_input,
            key=k_prop,
            propagation_indices=model_state["propagation_indices"],
            precomputed=precomputed,
        )
        if deterministic or self.deterministic or logvar is None:
            return mean, model_state
        std = jnp.exp(0.5 * logvar)
        sample = mean + std * jax.random.normal(k_noise, mean.shape, mean.dtype)
        return sample, model_state
