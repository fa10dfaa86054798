"""Model-layer tests, mirroring the reference's strategy (tests/core/test_models.py):
identifiable mock members decode which ensemble member produced each row; an analytic
dummy model gives evaluate_action_sequences a closed form; a GaussianMLP must fit a
1-D function."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mbrl_tpu.models import (
    BasicEnsemble,
    GaussianMLP,
    ModelEnv,
    ModelTrainer,
    TransitionRewardModel,
)
from mbrl_tpu.types import TransitionBatch
from mbrl_tpu.util import BootstrapIterator, TransitionIterator

_OBS_DIM = 1
_ACT_DIM = 1


class MockProbModel:
    """Member whose output equals a per-member constant — outputs decode the member.

    The constant lives in params so BasicEnsemble's vmap machinery works unchanged.
    """

    in_size = _OBS_DIM + _ACT_DIM
    out_size = _OBS_DIM + 1
    deterministic = True

    def init(self, key):
        return {"value": jnp.zeros(())}

    def forward(self, params, x):
        return params["value"] * jnp.ones((x.shape[0], self.out_size)), None

    def loss(self, params, model_in, target):
        mean, _ = self.forward(params, model_in)
        return jnp.square(mean - target).sum(), {}


def mock_term_fn(act, next_obs):
    return jnp.zeros((next_obs.shape[0], 1), dtype=bool)


MEMBER_INCS = [10.0, 11.0, 12.0]


def _mock_model_env(propagation_method):
    ens = BasicEnsemble(3, MockProbModel(), propagation_method=propagation_method)
    wrapper = TransitionRewardModel(ens, target_is_delta=True, normalize=False)
    state = wrapper.init(jax.random.PRNGKey(0))
    # give each member its identifiable constant
    state["params"]["members"]["value"] = jnp.asarray(MEMBER_INCS)
    env = ModelEnv(wrapper, mock_term_fn)
    return env, state


def test_model_env_expectation_propagation():
    batch_size = 7
    env, state = _mock_model_env("expectation")
    key = jax.random.PRNGKey(0)
    obs = np.zeros((batch_size, _OBS_DIM), np.float32)
    ms = env.reset(state, obs, key)
    action = np.zeros((batch_size, _ACT_DIM), np.float32)
    prev_sum = 0.0
    for i in range(10):
        key, k = jax.random.split(key)
        next_obs, reward, done, ms = env.step(state, action, ms, k, sample=False)
        assert next_obs.shape == (batch_size, _OBS_DIM)
        cur_sum = float(jnp.sum(next_obs))
        assert (cur_sum - prev_sum) == pytest.approx(batch_size * np.mean(MEMBER_INCS))
        assert float(reward[0, 0]) == pytest.approx(np.mean(MEMBER_INCS))
        prev_sum = cur_sum


def test_model_env_random_model_propagation():
    batch_size = 100
    env, state = _mock_model_env("random_model")
    key = jax.random.PRNGKey(0)
    obs = np.zeros((batch_size, _OBS_DIM), np.float32)
    ms = env.reset(state, obs, key)
    action = np.zeros((batch_size, _ACT_DIM), np.float32)
    history = ["" for _ in range(batch_size)]
    for i in range(50):
        key, k = jax.random.split(key)
        next_obs, *_, ms = env.step(state, action, ms, k)
        diff = np.asarray(next_obs) - obs
        seen = set()
        for j, v in enumerate(diff[:, 0]):
            v = int(round(float(v)))
            assert v in MEMBER_INCS
            seen.add(v)
            history[j] += str(int(v - 10))
        assert len(seen) == 3  # all members used somewhere in the batch
        obs = np.asarray(next_obs)
    # member choice varies over time for (virtually) every particle
    assert len(set(history)) == batch_size


def test_model_env_fixed_model_propagation():
    batch_size = 99
    env, state = _mock_model_env("fixed_model")
    key = jax.random.PRNGKey(0)
    obs = np.zeros((batch_size, _OBS_DIM), np.float32)
    ms = env.reset(state, obs, key)
    action = np.zeros((batch_size, _ACT_DIM), np.float32)
    history = ["" for _ in range(batch_size)]
    seen_all = set()
    for i in range(50):
        key, k = jax.random.split(key)
        next_obs, *_, ms = env.step(state, action, ms, k)
        diff = np.asarray(next_obs) - obs
        for j, v in enumerate(diff[:, 0]):
            v = int(round(float(v)))
            assert v in MEMBER_INCS
            seen_all.add(v)
            history[j] += str(int(v - 10))
        obs = np.asarray(next_obs)
    assert len(seen_all) == 3
    # TSinf: each particle sticks to one member forever
    for h in history:
        assert len(set(h)) == 1


class DummyModel:
    """Analytic dynamics: next_obs = obs + mean(act); reward = obs[0]."""

    def __init__(self, obs_dim, act_dim):
        self.in_size = obs_dim + act_dim
        self.out_size = obs_dim + 1
        self.obs_dim = obs_dim
        self.deterministic = True
        self.num_members = 1
        self.propagation_method = None

    def init(self, key):
        return {"elite": jnp.arange(1, dtype=jnp.int32)}

    def set_elite(self, params, elite):
        return params

    def reset_1d(self, obs, key):
        return {"obs": obs, "propagation_indices": jnp.zeros((obs.shape[0],), jnp.int32)}

    def sample_1d(self, params, model_input, model_state, key, deterministic=False):
        obs = model_input[:, : self.obs_dim]
        act = model_input[:, self.obs_dim :]
        new_obs = obs + act.mean(axis=1, keepdims=True)
        reward = new_obs[:, :1]
        return jnp.concatenate([new_obs, reward], axis=1), model_state


@pytest.mark.parametrize("num_particles", [1, 3, 5])
@pytest.mark.parametrize("horizon", [1, 4, 9])
def test_evaluate_action_sequences_analytic(num_particles, horizon):
    model = DummyModel(1, 2)
    wrapper = TransitionRewardModel(model, target_is_delta=False, normalize=False)
    state = wrapper.init(jax.random.PRNGKey(0))
    env = ModelEnv(wrapper, mock_term_fn)
    a = 0.5
    seqs = a * jnp.ones((8, horizon, 2))
    init_obs = jnp.zeros((1,))
    values = env.evaluate_action_sequences(
        state, seqs, init_obs, jax.random.PRNGKey(0), num_particles=num_particles
    )
    # obs_t = t*a, reward_t = obs_t => total = a * H(H+1)/2
    expected = a * horizon * (horizon + 1) / 2
    np.testing.assert_allclose(np.asarray(values), expected, rtol=1e-5)


def test_gaussian_mlp_shapes_and_logvar_bounds():
    model = GaussianMLP(4, 3, num_layers=2, ensemble_size=5, hid_size=32, activation="silu")
    params = model.init(jax.random.PRNGKey(0))
    x = jnp.ones((7, 4))
    mean, logvar = model.forward(params, x)
    assert mean.shape == (5, 7, 3) and logvar.shape == (5, 7, 3)
    assert np.all(np.asarray(logvar) <= 0.5 + 1e-4)
    assert np.all(np.asarray(logvar) >= -10.0 - 1e-4)
    # elite view
    params = model.set_elite(params, [0, 2, 4])
    m2, _ = model.forward(params, x, use_only_elite=True)
    assert m2.shape == (3, 7, 3)
    np.testing.assert_allclose(np.asarray(m2[1]), np.asarray(mean[2]), rtol=1e-5)


def test_gaussian_mlp_propagation_modes():
    model = GaussianMLP(
        2, 2, num_layers=1, ensemble_size=4, hid_size=16,
        propagation_method="expectation",
    )
    params = model.init(jax.random.PRNGKey(1))
    x = jnp.ones((8, 2))
    mean_all, _ = model.forward(params, x)
    m, lv = model.forward_propagated(params, x, key=jax.random.PRNGKey(2))
    np.testing.assert_allclose(np.asarray(m), np.asarray(mean_all.mean(0)), rtol=1e-5)

    model.propagation_method = "fixed_model"
    # fixed_model takes a persistent batch PERMUTATION; rows in the e-th shard of
    # the permutation are computed by member e (equal-shard TSinf semantics,
    # reference gaussian_mlp.py:156-216)
    perm = jnp.array([3, 1, 7, 5, 0, 2, 4, 6], dtype=jnp.int32)
    m, lv = model.forward_propagated(params, x, propagation_indices=perm)
    rows_per_member = 2
    for rank in range(8):
        row = int(perm[rank])
        member = rank // rows_per_member
        np.testing.assert_allclose(
            np.asarray(m[row]), np.asarray(mean_all[member, row]), rtol=1e-5
        )

    model.propagation_method = "random_model"
    m, lv = model.forward_propagated(params, x, key=jax.random.PRNGKey(3))
    assert m.shape == (8, 2)


def test_gaussian_mlp_fits_sine():
    """1-D regression parity gate (reference notebook fit_gaussian_mlp_ensemble_1d)."""
    rng = np.random.default_rng(0)
    x = rng.uniform(-3, 3, size=(512, 1)).astype(np.float32)
    y = np.sin(x) + 0.01 * rng.standard_normal((512, 1)).astype(np.float32)

    model = GaussianMLP(1, 1, num_layers=3, ensemble_size=3, hid_size=64, activation="silu")
    params = model.init(jax.random.PRNGKey(0))
    import optax

    from mbrl_tpu.ops.tree import combine_params, partition_params

    diff, static = partition_params(params)
    opt = optax.adam(1e-3)
    opt_state = opt.init(diff)

    @jax.jit
    def step(diff, opt_state, xb, yb):
        def loss_fn(d):
            loss, _ = model.loss(combine_params(d, static), xb, yb)
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(diff)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(diff, updates), opt_state, loss

    xb = jnp.broadcast_to(jnp.asarray(x), (3, 512, 1))
    yb = jnp.broadcast_to(jnp.asarray(y), (3, 512, 1))
    for i in range(500):
        diff, opt_state, loss = step(diff, opt_state, xb, yb)
    params = combine_params(diff, static)
    mean, _ = model.forward(params, jnp.asarray(x))
    pred = np.asarray(mean.mean(axis=0))
    mse = float(np.mean((pred - np.sin(x)) ** 2))
    assert mse < 0.01, mse


def test_transition_reward_model_semantics():
    """Delta targets, no_delta_list exemptions, learned-reward split, normalization."""
    model = GaussianMLP(4, 3, num_layers=1, ensemble_size=2, hid_size=8)
    wrapper = TransitionRewardModel(
        model, target_is_delta=True, normalize=True, learned_rewards=True,
        no_delta_list=[0],
    )
    state = wrapper.init(jax.random.PRNGKey(0))
    n = 16
    batch = TransitionBatch(
        obs=np.arange(n * 2, dtype=np.float32).reshape(n, 2),
        act=np.ones((n, 2), np.float32),
        next_obs=np.arange(n * 2, dtype=np.float32).reshape(n, 2) + 3,
        rewards=np.ones(n, np.float32),
        terminateds=np.zeros(n, bool),
        truncateds=np.zeros(n, bool),
    )
    state = wrapper.update_normalizer(state, batch)
    model_in, target = wrapper.process_batch(state, batch)
    assert model_in.shape == (n, 4) and target.shape == (n, 3)
    # normalized input has ~zero mean
    assert abs(float(model_in[:, 0].mean())) < 1e-4
    # dim 0 exempted from delta: target is absolute next_obs
    np.testing.assert_allclose(np.asarray(target[:, 0]), batch.next_obs[:, 0])
    # dim 1 is delta
    np.testing.assert_allclose(np.asarray(target[:, 1]), 3.0)
    # last column is reward
    np.testing.assert_allclose(np.asarray(target[:, 2]), 1.0)


def test_model_trainer_early_stopping_and_elites():
    rng = np.random.default_rng(0)
    n = 256
    obs = rng.standard_normal((n, 2)).astype(np.float32)
    act = rng.standard_normal((n, 1)).astype(np.float32)
    next_obs = obs + 0.1 * act
    batch = TransitionBatch(
        obs, act, next_obs, np.zeros(n, np.float32), np.zeros(n, bool), np.zeros(n, bool)
    )
    model = GaussianMLP(3, 2, num_layers=2, ensemble_size=3, hid_size=32, activation="silu")
    wrapper = TransitionRewardModel(
        model, target_is_delta=True, normalize=False, learned_rewards=False,
        num_elites=2,
    )
    state = wrapper.init(jax.random.PRNGKey(0))
    trainer = ModelTrainer(wrapper, optim_lr=1e-3)
    train_it = BootstrapIterator(batch[:200], 32, ensemble_size=3, shuffle_each_epoch=True)
    val_it = TransitionIterator(batch[200:], 32)
    state, losses, scores = trainer.train(
        state, train_it, val_it, num_epochs=30, patience=5
    )
    assert len(losses) >= 1
    assert scores[-1] <= scores[0]  # learned something
    # elites selected: 2 of 3 members
    assert state["params"]["elite"].shape == (2,)
    # eval API
    member_scores = trainer.evaluate(state, val_it)
    assert member_scores.shape == (3,)
