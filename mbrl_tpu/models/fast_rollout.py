"""Shard-space fast path for ModelEnv.evaluate_action_sequences (GaussianMLP).

The generic rollout scan (model_env.py) keeps particles in physical row order and
re-shuffles them into equal elite-member shards every step: generate a fresh batch
permutation (a device sort), gather the inputs by it, and un-gather mean and logvar
back (the reference's TS1 trick, mbrl/models/gaussian_mlp.py:156-216). On TPU every
indexed op over an 8k-row batch — sort, gather, scatter — costs ~20 us nearly
independent of row width, so the ~5 such ops per step dominate the whole step (the
4-layer ensemble matmul itself is ~5 us).

This module runs the rollout IN SHARD SPACE with an incrementally-composed
permutation, which needs only TWO indexed ops per step:

  - slot k of the carry holds some physical particle; at every step the carry is
    re-shuffled by a FRESH iid uniform permutation ``q_t`` (ONE gather). Composing
    uniform permutations keeps the slot->particle map uniform and independent
    across steps, so the member assignment (slot block -> elite member) has
    exactly the TS1 equal-shard distribution — no inverse permutation is ever
    materialized. (For TSinf/fixed_model, ``q_t`` is the identity and this gather
    disappears.)
  - the particle's candidate-sequence id rides in the packed carry (as an exact
    small-int float), so its action is ONE small-table gather
    ``acts[t][seq_id]`` per step — no pre-gathered (H, B, A) action stack.
  - the carry (obs, accumulated reward, alive flag, sequence id) is ONE packed
    (B, D+3) array, so all bookkeeping moves in the same gather.
  - the elite parameter view is computed once, outside the scan; the input
    normalizer is folded into the first layer's weights
    (x_norm @ W0 + b0 == x @ (W0/sd) + (b0 - (mu/sd) @ W0), exact);
  - per-sequence expected returns are read out with ONE segment-sum at the end
    (slot order never needs to be mapped back to physical order).

Semantics match the generic path distribution-for-distribution: fresh equal-shard
member assignment each step (TS1) or a persistent one (TSinf), Gaussian head
sampling, delta targets, learned-or-analytic rewards, termination masking, mean
over particles. PRNG streams are consumed in a different order, so results agree
statistically rather than bitwise (tested in tests/test_fast_rollout.py).

Used automatically by ModelEnv when the wrapped model advertises
``supports_fast_rollout`` and shapes/propagation allow; everything else falls back
to the generic scan.
"""
from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp


def _kernel_platform_ok() -> bool:
    """Pallas hardware-PRNG sampling needs a real TPU backend (tests monkeypatch
    this to exercise the kernel wiring on CPU with an emulated kernel)."""
    return jax.devices()[0].platform == "tpu"


def _is_trivial_termination(termination_fn) -> bool:
    """True when the termination fn provably never ends an episode (the
    library's no_termination, or anything explicitly tagged trivial)."""
    if termination_fn is None or getattr(termination_fn, "trivial", False):
        return True
    from mbrl_tpu.envs import termination_fns

    return termination_fn is termination_fns.no_termination


def supports_fast_rollout(wrapper, state: Dict[str, Any], batch: int) -> bool:
    """Static gate: wrapper wraps a GaussianMLP-style ensemble whose equal-shard
    propagation applies to this batch size."""
    model = getattr(wrapper, "model", None)
    if model is None or not getattr(model, "supports_fast_rollout", False):
        return False
    if model.propagation_method not in ("random_model", "fixed_model"):
        return False
    params = state.get("params")
    if params is None or "elite" not in params:
        return False
    num_used = int(params["elite"].shape[0])
    return model.ensemble_size > 1 and batch % num_used == 0


def _fold_normalizer(wrapper, state, w0, b0):
    """Fold (x - mu) / sd into the first layer: exact algebraic rewrite."""
    if not wrapper.normalize or state.get("normalizer") is None:
        return w0, b0
    stats = state["normalizer"]
    mu = jnp.reshape(stats.mean, (-1,)).astype(jnp.float32)
    sd = jnp.reshape(stats.std, (-1,)).astype(jnp.float32)
    w0f = w0 / sd[None, :, None]
    b0f = b0 - jnp.einsum("i,eio->eo", mu / sd, w0)[:, None, :]
    return w0f, b0f


def evaluate_action_sequences_sharded(
    wrapper,
    state: Dict[str, Any],
    action_sequences: jax.Array,  # (P, H, A)
    initial_obs: jax.Array,  # (D,)
    key: jax.Array,
    num_particles: int,
    reward_fn: Optional[Callable] = None,
    termination_fn: Optional[Callable] = None,
) -> jax.Array:
    """Expected return per candidate sequence, (P,). See module docstring."""
    model = wrapper.model
    params = state["params"]
    p = model._elite_view(params)  # ONE elite gather, outside the scan
    num_used = p["head"]["w"].shape[0]
    population, horizon, act_dim = action_sequences.shape
    batch = population * num_particles
    shard = batch // num_used
    obs_dim = initial_obs.shape[-1]
    out_size = model.out_size
    stochastic = not model.deterministic
    fixed = model.propagation_method == "fixed_model"

    key, k_q0, k_qs, k_noise, k_seed = jax.random.split(key, 5)

    # initial slot -> particle assignment (one sort); only its sequence ids matter
    q0 = jax.random.permutation(k_q0, batch).astype(jnp.int32)
    seq0 = (q0 // num_particles).astype(jnp.float32)  # exact small ints in f32

    rotate = getattr(model, "rollout_shuffle", "sort") == "rotate"
    if fixed:
        qs = None  # persistent assignment: the carry never re-shuffles
    elif rotate:
        # random whole-batch rotations: uniform, exactly balanced member
        # marginals each step with no per-step sort or gather (a roll is two
        # contiguous slices); see GaussianMLP.rollout_shuffle
        qs = jax.random.randint(k_qs, (horizon,), 0, batch, jnp.int32).at[0].set(0)
    else:
        # fresh composition permutations, one per step after the first
        # (batched sorts, outside the scan)
        qs = jax.vmap(
            lambda k: jax.random.permutation(k, batch).astype(jnp.int32)
        )(jax.random.split(k_qs, horizon - 1))
        qs = jnp.concatenate(
            [jnp.arange(batch, dtype=jnp.int32)[None], qs], axis=0
        )
    noise_keys = jax.random.split(k_noise, horizon)
    acts_by_time = jnp.swapaxes(action_sequences, 0, 1)  # (H, P, A) small

    # --- fold normalizer into the first layer --- #
    layer_ws = [l["w"] for l in p["layers"]]
    layer_bs = [l["b"] for l in p["layers"]]
    if layer_ws:
        layer_ws[0], layer_bs[0] = _fold_normalizer(
            wrapper, state, layer_ws[0], layer_bs[0]
        )
    head_w, head_b = p["head"]["w"], p["head"]["b"]
    activation = model.activation
    # bf16 opt-in (GaussianMLP(compute_dtype="bfloat16")): cast the weight stack
    # ONCE outside the scan and keep the layer chain's einsum operands in bf16
    # (full-rate MXU) with f32 accumulation; the carry, Gaussian head math, and
    # reward/termination bookkeeping stay f32
    cdt = getattr(model, "compute_dtype", jnp.float32)
    low_precision = jnp.dtype(cdt) != jnp.float32
    if low_precision:
        layer_ws = [w.astype(cdt) for w in layer_ws]
        head_w = head_w.astype(cdt)

    learned_rewards = wrapper.learned_rewards
    target_is_delta = wrapper.target_is_delta
    no_delta_list = wrapper.no_delta_list
    obs_process_fn = wrapper.obs_process_fn

    # Fully-fused Pallas step (opt-in via GaussianMLP(use_pallas=True), TPU only):
    # MLP chain + head + logvar soft bounds + Box-Muller sampling from the
    # per-core hardware PRNG run in ONE kernel — no inter-layer activations or
    # threefry noise tensors in HBM (measured: sampling alone costs ~45% of the
    # einsum step). Per-step seeds replace the per-step PRNG keys.
    kernel_tile = None
    if getattr(model, "use_pallas", False) and stochastic and _kernel_platform_ok():
        from mbrl_tpu.ops.pallas_kernels import pick_tile

        kernel_tile = pick_tile(shard)
    use_kernel = kernel_tile is not None

    # Full-horizon weight-stationary kernel (round 4): when the whole step —
    # learned reward, pure delta targets, no obs preprocessing, no
    # termination — fits the kernel's semantics, run the ENTIRE horizon in one
    # pallas_call with the elite weight stack pinned in VMEM (see
    # ops/pallas_kernels.py fused_rollout_returns). Member re-shuffling
    # happens by rotating the assignment index, not the data.
    if (
        use_kernel
        and rotate
        and not fixed
        and obs_process_fn is None
        and reward_fn is None
        and learned_rewards
        and target_is_delta
        and _is_trivial_termination(termination_fn)
    ):
        import mbrl_tpu.ops.pallas_kernels as _pk

        seed = jax.lax.bitcast_convert_type(
            jax.random.bits(k_seed, (2,), dtype=jnp.uint32), jnp.int32
        )
        num_tiles = batch // kernel_tile
        rot = jax.random.randint(k_qs, (horizon,), 0, num_tiles, jnp.int32)
        rot = jnp.cumsum(rot.at[0].set(0)) % num_tiles
        obs0_rows = jnp.broadcast_to(
            initial_obs.astype(jnp.float32), (batch, obs_dim)
        )
        # strided particle layout: row r plans sequence (r % population), so a
        # sequence's particles spread over ALL row tiles — and therefore over
        # all members every step (stratified TS1: same uniform member
        # marginals as the rolled carry, lower estimator variance than
        # clustering a sequence's particles in one member's shard)
        acts_rows = jnp.tile(action_sequences, (num_particles, 1, 1))
        dmask = jnp.ones((1, obs_dim), jnp.float32)
        for dim in no_delta_list:
            dmask = dmask.at[0, dim].set(0.0)
        totals_rows = _pk.fused_rollout_returns(
            seed,
            rot,
            obs0_rows,
            acts_rows.astype(jnp.float32),
            dmask,
            tuple(layer_ws),
            tuple(layer_bs),
            head_w,
            head_b,
            p["max_logvar"],
            p["min_logvar"],
            out_size,
            activation=activation,
            tile=kernel_tile,
        )
        # strided layout readout: particle p of sequence s is row
        # p * population + s
        return totals_rows.reshape(num_particles, population).mean(axis=0)
    if use_kernel:
        import mbrl_tpu.ops.pallas_kernels as _pk

        fused_ensemble_mlp_gaussian = _pk.fused_ensemble_mlp_gaussian

        # two full 32-bit seed words per step (the kernel adds the program ids as
        # separate words) — the stream space is 2^64 per program, not 2^31
        step_seeds = jax.lax.bitcast_convert_type(
            jax.random.bits(k_seed, (horizon, 2), dtype=jnp.uint32), jnp.int32
        )

    obs0 = jnp.broadcast_to(initial_obs.astype(jnp.float32), (batch, obs_dim))
    packed0 = jnp.concatenate(
        [obs0, jnp.zeros((batch, 1)), jnp.ones((batch, 1)), seq0[:, None]],
        axis=-1,
    )

    def step_fn(packed, xs):
        act_table_t, k_t, q_t = xs
        if q_t is not None and rotate:
            packed = jnp.roll(packed, q_t, axis=0)  # re-shuffle = one cheap roll
        elif q_t is not None:
            packed = jnp.take(packed, q_t, axis=0)  # gather #1: re-shuffle carry
        obs = packed[:, :obs_dim]
        total = packed[:, obs_dim]
        alive = packed[:, obs_dim + 1]
        seq_ids = packed[:, obs_dim + 2].astype(jnp.int32)
        act_t = jnp.take(act_table_t, seq_ids, axis=0)  # gather #2: small table

        x_obs = obs_process_fn(obs) if obs_process_fn is not None else obs
        x = jnp.concatenate([x_obs, act_t], axis=-1)
        if use_kernel:
            # whole member shard through ONE Pallas program: MLP chain + logvar
            # soft bounds + Box-Muller draw from the per-core hardware PRNG, no
            # inter-layer activations or threefry noise tensors in HBM
            x3 = x.reshape(num_used, shard, x.shape[-1])
            if low_precision:
                x3 = x3.astype(cdt)
            pred = fused_ensemble_mlp_gaussian(
                k_t,
                x3,
                tuple(layer_ws),
                tuple(layer_bs),
                head_w,
                head_b,
                p["max_logvar"],
                p["min_logvar"],
                out_size,
                activation=activation,
                tile=kernel_tile,
            ).reshape(batch, out_size)
        else:
            h = x.reshape(num_used, shard, x.shape[-1])
            if low_precision:
                h = h.astype(cdt)
            for w, b in zip(layer_ws, layer_bs):
                h = activation(
                    jnp.einsum(
                        "ebi,eio->ebo", h, w, preferred_element_type=jnp.float32
                    )
                    + b
                )
                if low_precision:
                    h = h.astype(cdt)
            out = (
                jnp.einsum(
                    "ebi,eio->ebo", h, head_w, preferred_element_type=jnp.float32
                )
                + head_b
            )
            if stochastic:
                mean = out[..., :out_size]
                logvar = out[..., out_size:]
                logvar = p["max_logvar"] - jax.nn.softplus(p["max_logvar"] - logvar)
                logvar = p["min_logvar"] + jax.nn.softplus(logvar - p["min_logvar"])
                noise_t = jax.random.normal(
                    k_t, (num_used, shard, out_size), jnp.float32
                )
                pred = mean + jnp.exp(0.5 * logvar) * noise_t
            else:
                pred = out
            pred = pred.reshape(batch, out_size)

        next_obs = pred[:, :-1] if learned_rewards else pred
        if target_is_delta:
            nxt = next_obs + obs
            for dim in no_delta_list:
                nxt = nxt.at[:, dim].set(next_obs[:, dim])
            next_obs = nxt
        if reward_fn is None:
            rewards = pred[:, -1]
        else:
            rewards = jnp.reshape(reward_fn(act_t, next_obs), (batch,))
        terminated = jnp.reshape(termination_fn(act_t, next_obs), (batch,))

        total = total + alive * rewards
        alive = alive * (1.0 - terminated.astype(jnp.float32))
        packed = jnp.concatenate(
            [next_obs, total[:, None], alive[:, None], packed[:, obs_dim + 2 :]],
            axis=-1,
        )
        return packed, None

    noise_xs = step_seeds if use_kernel else noise_keys
    if fixed:
        packed, _ = jax.lax.scan(
            lambda c, xs: step_fn(c, (*xs, None)),
            packed0,
            (acts_by_time, noise_xs),
        )
    else:
        packed, _ = jax.lax.scan(
            step_fn, packed0, (acts_by_time, noise_xs, qs)
        )

    # per-sequence mean over particles: ONE segment-sum readout
    seq_ids = packed[:, obs_dim + 2].astype(jnp.int32)
    totals = jnp.zeros((population,), jnp.float32).at[seq_ids].add(
        packed[:, obs_dim]
    )
    return totals / num_particles
