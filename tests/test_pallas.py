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


def test_fused_gaussian_mean_matches_einsum(monkeypatch):
    """Interpret-mode check of fused_ensemble_mlp_gaussian's mean path (the
    hardware-PRNG sampling path needs a real TPU; its distribution is exercised
    by scripts/verify_pallas_kernel_on_tpu.py and the on-chip bench)."""
    from mbrl_tpu.ops.pallas_kernels import fused_ensemble_mlp_gaussian, pick_tile

    E, S, IN, HID, OUT = 3, 16, 7, 24, 5
    ks = jax.random.split(jax.random.PRNGKey(0), 8)
    ws = (
        0.1 * jax.random.normal(ks[0], (E, IN, HID)),
        0.1 * jax.random.normal(ks[1], (E, HID, HID)),
    )
    bs = (
        0.1 * jax.random.normal(ks[2], (E, 1, HID)),
        0.1 * jax.random.normal(ks[3], (E, 1, HID)),
    )
    hw = 0.1 * jax.random.normal(ks[4], (E, HID, 2 * OUT))
    hb = 0.1 * jax.random.normal(ks[5], (E, 1, 2 * OUT))
    maxlv = 0.5 * jnp.ones((1, OUT))
    minlv = -10.0 * jnp.ones((1, OUT))
    x = jax.random.normal(ks[6], (E, S, IN))

    h = x
    for w, b in zip(ws, bs):
        h = jax.nn.silu(jnp.einsum("ebi,eio->ebo", h, w) + b)
    out = jnp.einsum("ebi,eio->ebo", h, hw) + hb
    ref_mean = out[..., :OUT]

    seed = jnp.array([123, 456], jnp.int32)
    mean_k = fused_ensemble_mlp_gaussian(
        seed, x, ws, bs, hw, hb, maxlv, minlv, out_size=OUT,
        tile=pick_tile(S), sample=False, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(mean_k), np.asarray(ref_mean), rtol=1e-5, atol=1e-5
    )


def test_pick_tile():
    from mbrl_tpu.ops.pallas_kernels import pick_tile

    assert pick_tile(1024) == 1024
    assert pick_tile(1600) == 800
    assert pick_tile(2048, max_tile=1024) == 1024
    assert pick_tile(7) is None  # no multiple-of-8 divisor
    assert pick_tile(24) == 24


def test_fused_rollout_returns_matches_reference(monkeypatch):
    """Interpret-mode check of the full-horizon weight-stationary kernel
    (mean path): per-row totals must match a step-by-step jnp replica of the
    same member schedule, delta targets, and learned-reward accumulation."""
    from mbrl_tpu.ops.pallas_kernels import fused_rollout_returns

    E, IN, HID = 2, 7, 16  # IN = obs 5 + act 2
    D, A, OUT = 5, 2, 6  # OUT = obs 5 + learned reward
    H, TILE = 4, 8
    B = 32  # 4 tiles, 2 per member
    ks = jax.random.split(jax.random.PRNGKey(3), 10)
    ws = (
        0.2 * jax.random.normal(ks[0], (E, IN, HID)),
        0.2 * jax.random.normal(ks[1], (E, HID, HID)),
    )
    bs = (
        0.2 * jax.random.normal(ks[2], (E, 1, HID)),
        0.2 * jax.random.normal(ks[3], (E, 1, HID)),
    )
    hw = 0.2 * jax.random.normal(ks[4], (E, HID, 2 * OUT))
    hb = 0.2 * jax.random.normal(ks[5], (E, 1, 2 * OUT))
    maxlv = 0.5 * jnp.ones((1, OUT))
    minlv = -10.0 * jnp.ones((1, OUT))
    obs0 = jax.random.normal(ks[6], (B, D))
    acts = jax.random.normal(ks[7], (B, H, A))
    rot = jnp.array([0, 3, 1, 2], jnp.int32)  # cumulative tile rotations
    dmask = jnp.ones((1, D)).at[0, 1].set(0.0)  # dim 1 is not a delta

    num_tiles = B // TILE
    tiles_per_member = num_tiles // E

    def replica():
        obs = np.asarray(obs0, np.float64).copy()
        total = np.zeros((B, 1))
        for t in range(H):
            for i in range(num_tiles):
                m = int(((i + int(rot[t])) % num_tiles) // tiles_per_member)
                rows = slice(i * TILE, (i + 1) * TILE)
                x = np.concatenate(
                    [obs[rows], np.asarray(acts)[rows, t]], axis=-1
                )
                h = x
                for w, b in zip(ws, bs):
                    z = h @ np.asarray(w[m], np.float64) + np.asarray(b[m])
                    h = z / (1 + np.exp(-z))  # silu
                out = h @ np.asarray(hw[m], np.float64) + np.asarray(hb[m])
                mean = out[:, :OUT]
                raw, reward = mean[:, : OUT - 1], mean[:, OUT - 1 :]
                nxt = np.asarray(dmask) * (obs[rows] + raw) + (
                    1 - np.asarray(dmask)
                ) * raw
                obs[rows] = nxt
                total[rows] += reward
        return total

    got = fused_rollout_returns(
        jnp.array([7, 8], jnp.int32), rot, obs0, acts, dmask,
        ws, bs, hw, hb, maxlv, minlv, out_size=OUT,
        tile=TILE, sample=False, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), replica(), rtol=1e-4, atol=1e-4)


def test_fast_rollout_full_horizon_kernel_wiring(monkeypatch):
    """The ModelEnv fast path takes the full-horizon kernel branch when the
    rollout semantics fit, and returns finite per-sequence values (interpret
    mode, mean path — the PRNG path needs real TPU hardware)."""
    import mbrl_tpu.models.fast_rollout as fr
    import mbrl_tpu.ops.pallas_kernels as pk
    from mbrl_tpu.envs.termination_fns import no_termination
    from mbrl_tpu.models import GaussianMLP, ModelEnv, TransitionRewardModel

    monkeypatch.setattr(fr, "_kernel_platform_ok", lambda: True)
    called = {}
    orig = pk.fused_rollout_returns

    def interp(*args, **kwargs):
        called["yes"] = True
        kwargs["interpret"] = True
        kwargs["sample"] = False
        return orig(*args, **kwargs)

    monkeypatch.setattr(pk, "fused_rollout_returns", interp)

    model = GaussianMLP(
        5 + 2, 5 + 1, num_layers=2, ensemble_size=2, hid_size=16,
        propagation_method="random_model", rollout_shuffle="rotate",
        use_pallas=True, pallas_tile=8,
    )
    wrapper = TransitionRewardModel(
        model, target_is_delta=True, normalize=True, learned_rewards=True
    )
    state = wrapper.init(jax.random.PRNGKey(0))
    state = wrapper.set_elite(state, [0, 1])
    env = ModelEnv(wrapper, no_termination)
    seqs = 0.1 * jax.random.normal(jax.random.PRNGKey(1), (4, 3, 2))
    obs0 = jnp.zeros((5,))
    vals = env.evaluate_action_sequences(
        state, seqs, obs0, jax.random.PRNGKey(2), num_particles=8
    )
    assert called.get("yes"), "full-horizon kernel branch was not taken"
    assert vals.shape == (4,)
    assert np.isfinite(np.asarray(vals)).all()


def test_fused_rollout_returns_bf16_close_to_f32():
    """bf16 weight stacks through the full-horizon kernel stay close to the
    f32 result (f32 accumulation bounds the drift at these depths)."""
    from mbrl_tpu.ops.pallas_kernels import fused_rollout_returns

    E, IN, HID = 2, 7, 16
    D, OUT, H, TILE, B = 5, 6, 3, 8, 16
    ks = jax.random.split(jax.random.PRNGKey(9), 8)
    ws = tuple(0.2 * jax.random.normal(k, (E, IN if i == 0 else HID, HID))
               for i, k in enumerate(ks[:2]))
    bs = tuple(0.2 * jax.random.normal(k, (E, 1, HID)) for k in ks[2:4])
    hw = 0.2 * jax.random.normal(ks[4], (E, HID, 2 * OUT))
    hb = 0.2 * jax.random.normal(ks[5], (E, 1, 2 * OUT))
    maxlv, minlv = 0.5 * jnp.ones((1, OUT)), -10.0 * jnp.ones((1, OUT))
    obs0 = jax.random.normal(ks[6], (B, D))
    acts = jax.random.normal(ks[7], (B, H, 2))
    rot = jnp.array([0, 1, 1], jnp.int32)
    dmask = jnp.ones((1, D))
    seed = jnp.array([1, 2], jnp.int32)

    args = (seed, rot, obs0, acts, dmask)
    kw = dict(out_size=OUT, tile=TILE, sample=False, interpret=True)
    f32 = fused_rollout_returns(*args, ws, bs, hw, hb, maxlv, minlv, **kw)
    bf = fused_rollout_returns(
        *args,
        tuple(w.astype(jnp.bfloat16) for w in ws), bs,
        hw.astype(jnp.bfloat16), hb, maxlv, minlv, **kw,
    )
    np.testing.assert_allclose(np.asarray(bf), np.asarray(f32), rtol=0.15, atol=0.15)
