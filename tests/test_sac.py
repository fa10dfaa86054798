"""SAC learner unit tests + device replay buffer semantics."""
import gymnasium as gym
import jax
import jax.numpy as jnp
import numpy as np

from mbrl_tpu.planning.sac import SAC, SACAgent
from mbrl_tpu.util.device_buffer import DeviceReplayBuffer


def _box(act_dim=2):
    return gym.spaces.Box(-np.ones(act_dim), np.ones(act_dim))


def test_sac_action_shapes_and_bounds():
    sac = SAC(3, _box(2), hidden_size=32)
    state = sac.init(jax.random.PRNGKey(0))
    obs = np.random.randn(3).astype(np.float32)
    a = sac.select_action(state, obs, jax.random.PRNGKey(1))
    assert a.shape == (2,)
    assert np.all(a <= 1.0) and np.all(a >= -1.0)
    batch = sac.select_action(state, np.random.randn(5, 3), jax.random.PRNGKey(2))
    assert batch.shape == (5, 2)
    # eval mode is deterministic
    e1 = sac.select_action(state, obs, jax.random.PRNGKey(3), evaluate=True)
    e2 = sac.select_action(state, obs, jax.random.PRNGKey(4), evaluate=True)
    np.testing.assert_allclose(e1, e2)


def test_sac_logprob_correction():
    sac = SAC(3, _box(2), hidden_size=32)
    state = sac.init(jax.random.PRNGKey(0))
    obs = jnp.zeros((64, 3))
    a, logp, mean = sac._sample_action(state.policy, obs, jax.random.PRNGKey(1))
    assert logp.shape == (64, 1)
    assert np.isfinite(np.asarray(logp)).all()


def test_sac_update_learns_simple_bandit():
    """Reward = -||a - 0.5||^2, no dynamics: policy mean should move toward 0.5."""
    sac = SAC(
        2, _box(1), hidden_size=32, automatic_entropy_tuning=True, lr=3e-3, gamma=0.0
    )
    state = sac.init(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(1)
    rng = np.random.default_rng(0)
    for i in range(300):
        obs = rng.standard_normal((128, 2)).astype(np.float32)
        key, k_a, k_u = jax.random.split(key, 3)
        act = sac.select_action(state, obs, k_a)
        rew = -np.square(act - 0.5).sum(1, keepdims=True).astype(np.float32)
        batch = (
            jnp.asarray(obs),
            jnp.asarray(act),
            jnp.asarray(obs),
            jnp.asarray(rew),
            jnp.ones((128, 1)),
        )
        state, metrics = sac.update_parameters(state, batch, k_u)
    mean_act = sac.select_action(
        state, np.zeros((64, 2), np.float32), jax.random.PRNGKey(9), evaluate=True
    )
    assert abs(float(mean_act.mean()) - 0.5) < 0.2, float(mean_act.mean())
    assert np.isfinite(float(metrics["critic_loss"]))


def test_sac_update_many_scan():
    sac = SAC(2, _box(1), hidden_size=16)
    state = sac.init(jax.random.PRNGKey(0))
    n, b = 5, 32
    batches = (
        jnp.zeros((n, b, 2)),
        jnp.zeros((n, b, 1)),
        jnp.zeros((n, b, 2)),
        jnp.ones((n, b, 1)),
        jnp.ones((n, b, 1)),
    )
    new_state, metrics = sac.update_many(state, batches, jax.random.PRNGKey(1))
    assert int(new_state.updates) == 5
    assert np.isfinite(float(metrics["policy_loss"]))


def test_sac_checkpoint_roundtrip(tmp_path):
    sac = SAC(2, _box(1), hidden_size=16)
    state = sac.init(jax.random.PRNGKey(0))
    path = tmp_path / "sac.pkl"
    sac.save_checkpoint(state, path)
    loaded = sac.load_checkpoint(path)
    a1 = sac.select_action(state, np.zeros(2, np.float32), jax.random.PRNGKey(1), evaluate=True)
    a2 = sac.select_action(loaded, np.zeros(2, np.float32), jax.random.PRNGKey(1), evaluate=True)
    np.testing.assert_allclose(a1, a2)


# ---------------------------------------------------------------------- #
# Device buffer
# ---------------------------------------------------------------------- #
def test_device_buffer_ring_and_sampling():
    buf = DeviceReplayBuffer(10, 2, 1)
    st = buf.init()
    obs = np.arange(8, dtype=np.float32)[:, None].repeat(2, 1)
    st = buf.add_batch(st, obs, np.ones((8, 1)), obs + 1, np.arange(8), np.ones(8))
    assert int(st.num_stored) == 8 and int(st.cur_idx) == 8
    # wrap: 4 more
    obs2 = (np.arange(4, dtype=np.float32)[:, None] + 100).repeat(2, 1)
    st = buf.add_batch(st, obs2, np.ones((4, 1)), obs2, np.zeros(4), np.ones(4))
    assert int(st.num_stored) == 10 and int(st.cur_idx) == 2
    np.testing.assert_allclose(np.asarray(st.obs[0, 0]), 102)
    o, a, no, r, m = buf.sample(st, jax.random.PRNGKey(0), 32)
    assert o.shape == (32, 2) and m.shape == (32, 1)
    stacked = buf.sample_many(st, jax.random.PRNGKey(1), 3, 16)
    assert stacked[0].shape == (3, 16, 2)


def test_device_buffer_masked_add():
    buf = DeviceReplayBuffer(100, 1, 1)
    st = buf.init()
    obs = np.arange(6, dtype=np.float32)[:, None]
    valid = np.array([True, False, True, True, False, True])
    st = buf.add_batch_masked(
        st, obs, obs, obs, np.arange(6), np.ones(6), valid
    )
    assert int(st.num_stored) == 4
    np.testing.assert_allclose(np.asarray(st.obs[:4, 0]), [0, 2, 3, 5])
    # scratch row took the dead writes; sampling can never return it
    idx = jax.random.randint(jax.random.PRNGKey(0), (1000,), 0, int(st.num_stored))
    assert int(idx.max()) < 4


def test_device_buffer_resize_keeps_recent():
    buf = DeviceReplayBuffer(6, 1, 1)
    st = buf.init()
    obs = np.arange(9, dtype=np.float32)[:, None]  # wraps: keeps 3..8
    st = buf.add_batch(st, obs, obs, obs, np.arange(9), np.ones(9))
    buf2, st2 = buf.resize(st, 4)
    assert buf2.capacity == 4
    assert int(st2.num_stored) == 4
    got = sorted(np.asarray(st2.obs[:4, 0]).tolist())
    assert got == [5, 6, 7, 8], got


def test_load_reference_torch_checkpoint(tmp_path):
    """Cross-framework interop: a reference-format pranz24 torch checkpoint
    (policy/critic/critic_target state dicts) loads into the jax learner and
    produces numerically identical policy means and Q-values."""
    import torch

    OBS, ACT, HID = 6, 3, 32

    class TorchGaussianPolicy(torch.nn.Module):
        # same module/attribute names the reference's GaussianPolicy registers
        def __init__(self):
            super().__init__()
            self.linear1 = torch.nn.Linear(OBS, HID)
            self.linear2 = torch.nn.Linear(HID, HID)
            self.mean_linear = torch.nn.Linear(HID, ACT)
            self.log_std_linear = torch.nn.Linear(HID, ACT)

        def forward(self, x):
            x = torch.relu(self.linear1(x))
            x = torch.relu(self.linear2(x))
            return self.mean_linear(x), self.log_std_linear(x)

    class TorchQNetwork(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.linear1 = torch.nn.Linear(OBS + ACT, HID)
            self.linear2 = torch.nn.Linear(HID, HID)
            self.linear3 = torch.nn.Linear(HID, 1)
            self.linear4 = torch.nn.Linear(OBS + ACT, HID)
            self.linear5 = torch.nn.Linear(HID, HID)
            self.linear6 = torch.nn.Linear(HID, 1)

        def forward(self, xu):
            q1 = self.linear3(torch.relu(self.linear2(torch.relu(self.linear1(xu)))))
            q2 = self.linear6(torch.relu(self.linear5(torch.relu(self.linear4(xu)))))
            return q1, q2

    torch.manual_seed(0)
    t_policy, t_critic, t_target = TorchGaussianPolicy(), TorchQNetwork(), TorchQNetwork()
    ckpt_path = tmp_path / "sac.pth"
    torch.save(
        {
            "policy_state_dict": t_policy.state_dict(),
            "critic_state_dict": t_critic.state_dict(),
            "critic_target_state_dict": t_target.state_dict(),
        },
        ckpt_path,
    )

    space = gym.spaces.Box(low=-np.ones(ACT), high=np.ones(ACT), dtype=np.float64)
    sac = SAC(num_inputs=OBS, action_space=space, hidden_size=HID)
    state = sac.load_torch_checkpoint(ckpt_path)

    obs = np.random.default_rng(1).normal(size=(5, OBS)).astype(np.float32)
    with torch.no_grad():
        t_mean, t_log_std = t_policy(torch.from_numpy(obs))
    j_mean, j_log_std = sac._policy_dist(state.policy, jnp.asarray(obs))
    np.testing.assert_allclose(np.asarray(j_mean), t_mean.numpy(), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(j_log_std),
        np.clip(t_log_std.numpy(), -20.0, 2.0),
        rtol=1e-5, atol=1e-5,
    )

    act = np.random.default_rng(2).normal(size=(5, ACT)).astype(np.float32)
    with torch.no_grad():
        t_q1, t_q2 = t_critic(torch.from_numpy(np.concatenate([obs, act], axis=1)))
    j_q1, j_q2 = sac._q_values(state.critic, jnp.asarray(obs), jnp.asarray(act))
    np.testing.assert_allclose(np.asarray(j_q1), t_q1.numpy(), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(j_q2), t_q2.numpy(), rtol=1e-5, atol=1e-5)

    # deterministic eval action goes through the tanh-squash + rescale path
    a = sac.select_action(state, obs[0], jax.random.PRNGKey(0), evaluate=True)
    assert a.shape == (ACT,) and np.isfinite(a).all()
