"""Pallas kernel tests (interpret mode on CPU): fused ensemble MLP must match the
reference einsum forward exactly."""
import jax
import jax.numpy as jnp
import numpy as np

from mbrl_tpu.models import GaussianMLP
from mbrl_tpu.ops.pallas_kernels import fused_ensemble_mlp, supports_fused_mlp


def test_fused_mlp_matches_einsum_forward():
    model = GaussianMLP(10, 6, num_layers=3, ensemble_size=4, hid_size=32, activation="silu")
    params = model.init(jax.random.PRNGKey(0))
    e, s = 4, 16
    x = jax.random.normal(jax.random.PRNGKey(1), (e, s, 10))

    ref_mean, ref_logvar = model.forward(params, x)

    raw = fused_ensemble_mlp(
        x,
        tuple(l["w"] for l in params["layers"]),
        tuple(l["b"] for l in params["layers"]),
        params["head"]["w"],
        params["head"]["b"],
        activation=jax.nn.silu,
        tile=8,
        interpret=True,
    )
    mean = raw[..., :6]
    logvar = raw[..., 6:]
    logvar = params["max_logvar"] - jax.nn.softplus(params["max_logvar"] - logvar)
    logvar = params["min_logvar"] + jax.nn.softplus(logvar - params["min_logvar"])
    np.testing.assert_allclose(np.asarray(mean), np.asarray(ref_mean), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(logvar), np.asarray(ref_logvar), rtol=1e-5, atol=1e-5)


def test_supports_predicate():
    assert supports_fused_mlp(1024, 512)
    assert not supports_fused_mlp(1000, 512)


def test_gaussian_mlp_pallas_path_interpret(monkeypatch):
    """The shard path with use_pallas must agree with the plain path."""
    import mbrl_tpu.ops.pallas_kernels as pk

    orig = pk.fused_ensemble_mlp

    def interp(*args, **kwargs):
        kwargs["interpret"] = True
        return orig(*args, **kwargs)

    monkeypatch.setattr(pk, "fused_ensemble_mlp", interp)

    m_plain = GaussianMLP(
        5, 4, num_layers=2, ensemble_size=3, hid_size=16,
        propagation_method="fixed_model",
    )
    m_pallas = GaussianMLP(
        5, 4, num_layers=2, ensemble_size=3, hid_size=16,
        propagation_method="fixed_model", use_pallas=True, pallas_tile=8,
    )
    params = m_plain.init(jax.random.PRNGKey(0))
    batch = 24  # 8 rows/member -> tiles with tile=8
    x = jax.random.normal(jax.random.PRNGKey(1), (batch, 5))
    perm = jax.random.permutation(jax.random.PRNGKey(2), batch).astype(jnp.int32)
    mean_a, lv_a = m_plain.forward_propagated(params, x, propagation_indices=perm)
    mean_b, lv_b = m_pallas.forward_propagated(params, x, propagation_indices=perm)
    np.testing.assert_allclose(np.asarray(mean_a), np.asarray(mean_b), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(lv_a), np.asarray(lv_b), rtol=1e-5, atol=1e-5)
