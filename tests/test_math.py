"""Unit tests for mbrl_tpu.ops — mirrors the reference's math tests
(tests/core/test_common_utils.py truncated-normal statistics, normalizer tests)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mbrl_tpu import ops
from mbrl_tpu.ops import normalizer as nrm


def test_gaussian_nll_matches_formula():
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    mean = jax.random.normal(k1, (8, 4))
    logvar = jax.random.normal(k2, (8, 4)) * 0.1
    target = jax.random.normal(k3, (8, 4))
    expected = np.mean(
        np.sum(
            np.square(np.asarray(mean - target)) * np.exp(-np.asarray(logvar))
            + np.asarray(logvar),
            axis=-1,
        )
    )
    got = ops.gaussian_nll(mean, logvar, target)
    np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-5)
    unreduced = ops.gaussian_nll(mean, logvar, target, reduce=False)
    assert unreduced.shape == (8, 4)


def test_truncated_normal_bounds_and_stats():
    key = jax.random.PRNGKey(1)
    x = ops.truncated_normal(key, (100000,), mean=1.0, std=0.5)
    x = np.asarray(x)
    assert np.all(x <= 1.0 + 2 * 0.5 + 1e-6)
    assert np.all(x >= 1.0 - 2 * 0.5 - 1e-6)
    assert abs(x.mean() - 1.0) < 0.01
    # truncated normal at +-2 sigma has std ~0.8796 * sigma
    assert abs(x.std() - 0.5 * 0.8796) < 0.01


def test_truncated_linear_schedule():
    assert ops.truncated_linear(1, 5, 0.0, 10.0, 0.5) == 0.0
    assert ops.truncated_linear(1, 5, 0.0, 10.0, 7) == 10.0
    assert abs(ops.truncated_linear(1, 5, 0.0, 10.0, 3) - 5.0) < 1e-9
    # degenerate range behaves as constant max_y
    assert ops.truncated_linear(2, 2, 0.0, 10.0, 0) == 10.0


def test_propagation_helpers():
    E, B, D = 3, 6, 2
    preds = jnp.arange(E * B * D, dtype=jnp.float32).reshape(E, B, D)
    idx = jnp.array([0, 1, 2, 0, 1, 2])
    out = ops.propagate_from_indices(preds, idx)
    for i in range(B):
        np.testing.assert_array_equal(np.asarray(out[i]), np.asarray(preds[idx[i], i]))

    (exp_out,) = ops.propagate((preds,), "expectation")
    np.testing.assert_allclose(np.asarray(exp_out), np.asarray(preds.mean(0)), rtol=1e-6)

    (fix_out,) = ops.propagate((preds,), "fixed_model", propagation_indices=idx)
    np.testing.assert_array_equal(np.asarray(fix_out), np.asarray(out))

    key = jax.random.PRNGKey(0)
    (rnd_out,) = ops.propagate((preds,), "random_model", key=key)
    # every row must come from one of the members
    for i in range(B):
        row = np.asarray(rnd_out[i])
        assert any(np.allclose(row, np.asarray(preds[e, i])) for e in range(E))

    with pytest.raises(ValueError):
        ops.propagate((preds,), "bogus")


def test_powerlaw_psd_gaussian_stats():
    key = jax.random.PRNGKey(42)
    y = ops.powerlaw_psd_gaussian(key, 2.0, (512, 250))
    y = np.asarray(y)
    assert y.shape == (512, 250)
    # normalized to approximately unit variance
    assert abs(y.std() - 1.0) < 0.1
    # beta=2 (red noise) should concentrate power at low frequencies
    spec = np.abs(np.fft.rfft(y, axis=-1)) ** 2
    low = spec[:, 1:10].mean()
    high = spec[:, -10:].mean()
    assert low > 10 * high
    # white noise (beta=0) should be flat-ish
    y0 = np.asarray(ops.powerlaw_psd_gaussian(key, 0.0, (512, 250)))
    spec0 = np.abs(np.fft.rfft(y0, axis=-1)) ** 2
    assert spec0[:, 1:10].mean() < 2 * spec0[:, -10:].mean()


def test_quantize_obs():
    obs = jnp.array([[0, 17, 255]], dtype=jnp.int32)
    q = ops.quantize_obs(obs, 5)
    np.testing.assert_array_equal(np.asarray(q), [[0, 16, 248]])
    qn = ops.quantize_obs(obs, 5, key=jax.random.PRNGKey(0), add_noise=True)
    qn = np.asarray(qn)
    assert np.all(qn >= np.asarray(q)) and np.all(qn < np.asarray(q) + 8)


def test_normalizer_roundtrip(tmp_path):
    state = nrm.init_normalizer(3)
    data = np.random.RandomState(0).randn(100, 3).astype(np.float32) * 5 + 2
    state = nrm.update_stats(state, data)
    normed = np.asarray(nrm.normalize(state, jnp.asarray(data)))
    assert abs(normed.mean()) < 1e-5
    assert abs(normed.std() - 1.0) < 0.02
    denormed = np.asarray(nrm.denormalize(state, jnp.asarray(normed)))
    np.testing.assert_allclose(denormed, data, rtol=1e-4, atol=1e-4)

    # constant columns get std=1 (no NaNs)
    const = np.ones((50, 3), dtype=np.float32)
    state2 = nrm.update_stats(nrm.init_normalizer(3), const)
    np.testing.assert_array_equal(np.asarray(state2.std), np.ones((1, 3)))

    nrm.save(state, tmp_path)
    state3 = nrm.load(nrm.init_normalizer(3), tmp_path)
    np.testing.assert_allclose(np.asarray(state3.mean), np.asarray(state.mean))


def test_transition_batch_pytree():
    from mbrl_tpu.types import TransitionBatch

    b = TransitionBatch(
        obs=np.zeros((6, 3)),
        act=np.zeros((6, 2)),
        next_obs=np.zeros((6, 3)),
        rewards=np.zeros((6, 1)),
        terminateds=np.zeros((6, 1), dtype=bool),
        truncateds=np.zeros((6, 1), dtype=bool),
    )
    assert len(b) == 6
    sub = b[2:4]
    assert len(sub) == 2
    r = b.add_new_batch_dim(3)
    assert r.obs.shape == (2, 3, 3)
    leaves = jax.tree_util.tree_leaves(b)
    assert len(leaves) == 6
