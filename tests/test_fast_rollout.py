"""Shard-space fast rollout (models/fast_rollout.py) vs the generic ModelEnv scan.

Strategy mirrors the reference's propagation-decoding tests
(tests/core/test_models.py:256-334): craft ensemble members with identifiable
constant outputs so expected returns have closed forms, then check the fast path
and the generic path agree with the analytic value (they consume PRNG streams in
different orders, so agreement is statistical-by-construction: equal-shard
propagation balances members exactly across the batch each step).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mbrl_tpu.models import GaussianMLP, ModelEnv, TransitionRewardModel
from mbrl_tpu.models.fast_rollout import _fold_normalizer, supports_fast_rollout

OBS_DIM = 3
ACT_DIM = 2
ENSEMBLE = 4
MEMBER_VALUES = np.array([1.0, 2.0, 3.0, 4.0], np.float32)


def _constant_member_model(propagation_method, learned_rewards=True, shuffle="sort"):
    """Zero weights, per-member head bias => member m always predicts
    (delta=value_m, reward=value_m) with ~exp(-10) sampling noise."""
    out = OBS_DIM + (1 if learned_rewards else 0)
    model = GaussianMLP(
        in_size=OBS_DIM + ACT_DIM,
        out_size=out,
        num_layers=2,
        ensemble_size=ENSEMBLE,
        hid_size=8,
        propagation_method=propagation_method,
        rollout_shuffle=shuffle,
    )
    params = model.init(jax.random.PRNGKey(0))
    params = jax.tree_util.tree_map(jnp.zeros_like, params)
    params["elite"] = jnp.arange(ENSEMBLE, dtype=jnp.int32)
    bias = jnp.zeros((ENSEMBLE, 1, 2 * out))
    bias = bias.at[:, 0, :out].set(
        jnp.asarray(MEMBER_VALUES)[:, None] * jnp.ones((ENSEMBLE, out))
    )
    # raw logvar 0 -> bounded to ~min_logvar; make bounds tight so noise ~ 0
    params["head"] = {"w": params["head"]["w"], "b": bias}
    params["min_logvar"] = -20.0 * jnp.ones((1, out))
    params["max_logvar"] = -19.0 * jnp.ones((1, out))
    wrapper = TransitionRewardModel(
        model,
        target_is_delta=True,
        normalize=False,
        learned_rewards=learned_rewards,
    )
    return wrapper, {"params": params, "normalizer": None}


def _no_term(act, next_obs):
    return jnp.zeros((next_obs.shape[0], 1), bool)


@pytest.mark.parametrize(
    "prop,shuffle",
    [("random_model", "sort"), ("random_model", "rotate"), ("fixed_model", "sort")],
)
def test_fast_rollout_matches_analytic_value(prop, shuffle):
    # rotate keeps each step's member loads exactly balanced, so the
    # batch-mean analytic value is exact for it too
    wrapper, state = _constant_member_model(prop, shuffle=shuffle)
    env = ModelEnv(wrapper, _no_term)
    horizon, particles = 6, 8 * ENSEMBLE
    seqs = jnp.zeros((1, horizon, ACT_DIM))
    obs0 = jnp.zeros((OBS_DIM,))
    values = env.evaluate_action_sequences(
        state, seqs, obs0, jax.random.PRNGKey(1), num_particles=particles
    )
    # each step every member handles exactly B/E rows => batch-mean reward per
    # step is exactly mean(MEMBER_VALUES); total = H * that
    expected = horizon * float(MEMBER_VALUES.mean())
    np.testing.assert_allclose(np.asarray(values), expected, rtol=1e-3)


@pytest.mark.parametrize("prop", ["random_model", "fixed_model"])
def test_fast_rollout_matches_generic_path(prop):
    wrapper, state = _constant_member_model(prop)
    env = ModelEnv(wrapper, _no_term)
    horizon, particles = 5, 8 * ENSEMBLE
    seqs = jnp.zeros((2, horizon, ACT_DIM))
    obs0 = jnp.zeros((OBS_DIM,))
    fast = env.evaluate_action_sequences(
        state, seqs, obs0, jax.random.PRNGKey(2), num_particles=particles
    )
    wrapper.model.supports_fast_rollout = False
    env2 = ModelEnv(wrapper, _no_term)
    generic = env2.evaluate_action_sequences(
        state, seqs, obs0, jax.random.PRNGKey(2), num_particles=particles
    )
    wrapper.model.supports_fast_rollout = True
    # batch-wide balance makes the batch mean exact in both paths; per-sequence
    # means differ only by which members served each particle
    np.testing.assert_allclose(
        np.asarray(fast).mean(), np.asarray(generic).mean(), rtol=1e-3
    )


def test_fast_rollout_termination_masking():
    """Member m predicts delta m; terminate when obs[0] > 10.5 => rewards stop
    accruing for terminated particles in both paths."""
    wrapper, state = _constant_member_model("fixed_model")

    def term_fn(act, next_obs):
        return (next_obs[:, :1] > 10.5)

    env = ModelEnv(wrapper, term_fn)
    horizon, particles = 8, 16 * ENSEMBLE
    seqs = jnp.zeros((1, horizon, ACT_DIM))
    obs0 = jnp.zeros((OBS_DIM,))
    value_fast = env.evaluate_action_sequences(
        state, seqs, obs0, jax.random.PRNGKey(3), num_particles=particles
    )
    wrapper.model.supports_fast_rollout = False
    env2 = ModelEnv(wrapper, term_fn)
    value_gen = env2.evaluate_action_sequences(
        state, seqs, obs0, jax.random.PRNGKey(3), num_particles=particles
    )
    wrapper.model.supports_fast_rollout = True
    # analytic: member m's particle obs[0] after t steps = m*t; terminates when
    # m*t > 10.5 (threshold off the sample-noise boundary); reward m accrues for
    # steps up to and including the terminating one
    def member_total(m):
        tot, alive_obs = 0.0, 0.0
        for _ in range(horizon):
            if alive_obs > 10.5:
                break
            tot += m
            alive_obs += m
        return tot

    expected = np.mean([member_total(m) for m in MEMBER_VALUES])
    np.testing.assert_allclose(np.asarray(value_fast)[0], expected, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(value_gen)[0], expected, rtol=1e-3)


def test_fold_normalizer_exact():
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 4)
    E, IN, H = 3, 7, 5
    w0 = jax.random.normal(ks[0], (E, IN, H))
    b0 = jax.random.normal(ks[1], (E, 1, H))
    x = jax.random.normal(ks[2], (E, 11, IN))
    mu = jax.random.normal(ks[3], (1, IN))
    sd = jnp.abs(jax.random.normal(jax.random.PRNGKey(9), (1, IN))) + 0.5

    class Stats:
        mean = mu
        std = sd

    class W:
        normalize = True

    state = {"normalizer": Stats()}
    w0f, b0f = _fold_normalizer(W(), state, w0, b0)
    direct = jnp.einsum("ebi,eio->ebo", (x - mu) / sd, w0) + b0
    folded = jnp.einsum("ebi,eio->ebo", x, w0f) + b0f
    np.testing.assert_allclose(np.asarray(direct), np.asarray(folded), atol=1e-4)


def test_fast_rollout_gate():
    wrapper, state = _constant_member_model("random_model")
    assert supports_fast_rollout(wrapper, state, batch=8 * ENSEMBLE)
    assert not supports_fast_rollout(wrapper, state, batch=8 * ENSEMBLE + 1)
    wrapper.model.propagation_method = "expectation"
    assert not supports_fast_rollout(wrapper, state, batch=8 * ENSEMBLE)


def test_fast_rollout_analytic_reward_fn_and_no_delta():
    """Analytic reward_fn (obs sum) + no_delta_list exemption both honored."""
    wrapper, state = _constant_member_model("random_model", learned_rewards=False)
    wrapper.no_delta_list = (0,)

    def reward_fn(act, next_obs):
        return next_obs[:, :1]

    env = ModelEnv(wrapper, _no_term, reward_fn=reward_fn)
    horizon, particles = 4, 8 * ENSEMBLE
    seqs = jnp.zeros((1, horizon, ACT_DIM))
    obs0 = jnp.zeros((OBS_DIM,))
    value = env.evaluate_action_sequences(
        state, seqs, obs0, jax.random.PRNGKey(4), num_particles=particles
    )
    # dim 0 is no-delta: obs[0] = member value every step (not accumulated); the
    # balanced batch mean per step is mean(values); total = H * mean
    expected = horizon * float(MEMBER_VALUES.mean())
    np.testing.assert_allclose(np.asarray(value), expected, rtol=1e-3)


def test_fast_rollout_bfloat16_compute():
    """compute_dtype="bfloat16" runs the layer chain in bf16 (f32 accumulation)
    and still matches the analytic balanced-member value within bf16 tolerance."""
    wrapper, state = _constant_member_model("random_model")
    wrapper.model.compute_dtype = jnp.bfloat16
    env = ModelEnv(wrapper, _no_term)
    horizon, particles = 6, 8 * ENSEMBLE
    seqs = jnp.zeros((1, horizon, ACT_DIM))
    obs0 = jnp.zeros((OBS_DIM,))
    values = env.evaluate_action_sequences(
        state, seqs, obs0, jax.random.PRNGKey(7), num_particles=particles
    )
    assert values.dtype == jnp.float32  # returns stay full precision
    expected = horizon * float(MEMBER_VALUES.mean())
    np.testing.assert_allclose(np.asarray(values), expected, rtol=2e-2)


def test_forward_bfloat16_close_to_f32():
    """All-member forward with bf16 compute stays within bf16 rounding of f32."""
    model32 = GaussianMLP(
        in_size=5, out_size=3, num_layers=2, ensemble_size=3, hid_size=16,
        activation="silu",
    )
    params = model32.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (3, 32, 5))
    m32, lv32 = model32.forward(params, x)
    model16 = GaussianMLP(
        in_size=5, out_size=3, num_layers=2, ensemble_size=3, hid_size=16,
        activation="silu", compute_dtype="bfloat16",
    )
    m16, lv16 = model16.forward(params, x)
    assert m16.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(m16), np.asarray(m32), atol=5e-2)
    np.testing.assert_allclose(np.asarray(lv16), np.asarray(lv32), atol=5e-2)


def test_fast_rollout_pallas_kernel_wiring(monkeypatch):
    """With use_pallas=True the step_fn must route through
    fused_ensemble_mlp_gaussian. On CPU the hardware PRNG is unavailable, so the
    kernel is emulated with the same math in plain JAX; the rollout must (a)
    actually CALL it and (b) still produce the analytic expected return."""
    import mbrl_tpu.models.fast_rollout as fr
    import mbrl_tpu.ops.pallas_kernels as pk

    calls = {"n": 0}

    def fake_kernel(seed, x, layer_ws, layer_bs, head_w, head_b, max_logvar,
                    min_logvar, out_size, activation=jax.nn.silu, tile=512,
                    sample=True, interpret=False):
        calls["n"] += 1
        assert seed.shape == (2,)
        h = x
        for w, b in zip(layer_ws, layer_bs):
            h = activation(jnp.einsum("ebi,eio->ebo", h, w) + b)
        out = jnp.einsum("ebi,eio->ebo", h, head_w) + head_b
        mean = out[..., :out_size]
        logvar = out[..., out_size:]
        logvar = max_logvar - jax.nn.softplus(max_logvar - logvar)
        logvar = min_logvar + jax.nn.softplus(logvar - min_logvar)
        key = jax.random.fold_in(jax.random.fold_in(jax.random.PRNGKey(0), seed[0]), seed[1])
        z = jax.random.normal(key, mean.shape)
        return mean + jnp.exp(0.5 * logvar) * z

    monkeypatch.setattr(fr, "_kernel_platform_ok", lambda: True)
    monkeypatch.setattr(pk, "fused_ensemble_mlp_gaussian", fake_kernel)

    wrapper, state = _constant_member_model("random_model", shuffle="rotate")
    wrapper.model.use_pallas = True
    env = ModelEnv(wrapper, _no_term)
    horizon, particles = 6, 8 * ENSEMBLE
    seqs = jnp.zeros((1, horizon, ACT_DIM))
    obs0 = jnp.zeros((OBS_DIM,))
    values = env.evaluate_action_sequences(
        state, seqs, obs0, jax.random.PRNGKey(1), num_particles=particles
    )
    assert calls["n"] >= 1, "fused kernel was never called"
    expected = horizon * float(MEMBER_VALUES.mean())
    np.testing.assert_allclose(np.asarray(values), expected, rtol=1e-3)


def test_full_horizon_kernel_statistical_agreement(monkeypatch):
    """Statistical-agreement pin for the full-horizon kernel's tile-granular
    member rotation (ADVICE r4): on a FIXED random model, per-sequence return
    statistics over many independent rollout keys must agree between the
    kernel branch and the rolled-carry fallback — unbiasedness (equal means
    within standard error) plus non-inflation (the kernel's stratified row
    layout must not produce a higher estimator variance than the rolled
    carry). Sampling noise is neutralized (tight logvar bounds / mean-path
    kernel) so the statistic isolates the member-assignment schedule, which is
    exactly where the two schedules differ."""
    import mbrl_tpu.models.fast_rollout as fr
    import mbrl_tpu.ops.pallas_kernels as pk
    from mbrl_tpu.envs.termination_fns import no_termination

    monkeypatch.setattr(fr, "_kernel_platform_ok", lambda: True)
    orig = pk.fused_rollout_returns
    called = {}

    def interp(*args, **kwargs):
        called["yes"] = True
        kwargs["interpret"] = True
        kwargs["sample"] = False  # mean path: hardware PRNG needs a real TPU
        return orig(*args, **kwargs)

    monkeypatch.setattr(pk, "fused_rollout_returns", interp)

    def build(use_pallas):
        model = GaussianMLP(
            OBS_DIM + ACT_DIM, OBS_DIM + 1, num_layers=2, ensemble_size=ENSEMBLE,
            hid_size=16, propagation_method="random_model",
            rollout_shuffle="rotate", use_pallas=use_pallas, pallas_tile=8,
        )
        params = model.init(jax.random.PRNGKey(7))
        params["elite"] = jnp.arange(ENSEMBLE, dtype=jnp.int32)
        # tight logvar bounds: the fallback's Gaussian draw becomes ~exp(-10)
        # noise, so both paths are effectively mean rollouts and the only
        # stochasticity left is the member-assignment schedule
        params["min_logvar"] = -20.0 * jnp.ones((1, OBS_DIM + 1))
        params["max_logvar"] = -19.0 * jnp.ones((1, OBS_DIM + 1))
        wrapper = TransitionRewardModel(
            model, target_is_delta=True, normalize=False, learned_rewards=True
        )
        return ModelEnv(wrapper, no_termination), {
            "params": params, "normalizer": None,
        }

    pop, horizon, particles = 4, 5, 16
    seqs = 0.3 * jax.random.normal(jax.random.PRNGKey(1), (pop, horizon, ACT_DIM))
    obs0 = 0.5 * jnp.ones((OBS_DIM,))
    n_keys = 32
    keys = jax.random.split(jax.random.PRNGKey(2), n_keys)

    def sweep(env, state):
        f = jax.jit(
            lambda k: env.evaluate_action_sequences(
                state, seqs, obs0, k, num_particles=particles
            )
        )
        return np.stack([np.asarray(f(k)) for k in keys])  # (n_keys, pop)

    env_k, state_k = build(use_pallas=True)
    vals_kernel = sweep(env_k, state_k)
    assert called.get("yes"), "full-horizon kernel branch was not taken"
    env_f, state_f = build(use_pallas=False)
    vals_fallback = sweep(env_f, state_f)

    mean_k, mean_f = vals_kernel.mean(0), vals_fallback.mean(0)
    var_k, var_f = vals_kernel.var(0), vals_fallback.var(0)
    # unbiasedness: per-sequence means agree within a 5-sigma standard-error
    # band (both estimators see the same uniform member marginals)
    se = np.sqrt((var_k + var_f) / n_keys) + 1e-6
    np.testing.assert_array_less(np.abs(mean_k - mean_f), 5.0 * se + 1e-3)
    # non-inflation: stratified tiles must not be a worse estimator than the
    # rolled carry (the docstring claims lower variance; allow slack for the
    # finite key sample)
    assert float(var_k.mean()) <= 1.5 * float(var_f.mean()) + 1e-6, (
        var_k.mean(), var_f.mean(),
    )
