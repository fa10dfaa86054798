"""On-device model training (ModelTrainer.train_device), the device dataset
mirror, the fused SAC sample+update program, and the host-CPU actor.

These paths exist to collapse the per-step / per-epoch host<->device round trips
of the MBPO loop into enqueue-only device calls (the reference round-trips every
minibatch, mbrl/models/model_trainer.py:146-157, and every SAC batch,
third_party/pytorch_sac_pranz24/sac.py:89-93). Semantics must match the host
paths, so each test checks the device path against its host twin.
"""
import gymnasium as gym
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mbrl_tpu.models import GaussianMLP, ModelTrainer, TransitionRewardModel
from mbrl_tpu.planning.sac import SAC, SACAgent
from mbrl_tpu.types import TransitionBatch
from mbrl_tpu.util.device_buffer import (
    DeviceReplayBuffer,
    DeviceTransitionDataset,
)
from mbrl_tpu.util.replay_buffer import ReplayBuffer

OBS_DIM, ACT_DIM = 3, 2


def _make_buffer(n, capacity=512, seed=0):
    rng = np.random.default_rng(seed)
    rb = ReplayBuffer(capacity, (OBS_DIM,), (ACT_DIM,), rng=rng)
    for _ in range(n):
        obs = rng.normal(size=OBS_DIM).astype(np.float32)
        act = rng.normal(size=ACT_DIM).astype(np.float32)
        # learnable linear dynamics: next = obs + 0.1 * sum(act)
        next_obs = obs + 0.1 * act.sum()
        rew = float(obs[0])
        rb.add(obs, act, next_obs, rew, False, False)
    return rb


def _make_model(ensemble=3, deterministic=False):
    model = GaussianMLP(
        in_size=OBS_DIM + ACT_DIM,
        out_size=OBS_DIM + 1,
        num_layers=2,
        ensemble_size=ensemble,
        hid_size=32,
        deterministic=deterministic,
    )
    wrapper = TransitionRewardModel(
        model, target_is_delta=True, normalize=True, learned_rewards=True,
        num_elites=2,
    )
    return wrapper, wrapper.init(jax.random.PRNGKey(0))


class TestDeviceTransitionDataset:
    def test_incremental_sync_matches_buffer(self):
        rb = _make_buffer(100)
        ds = DeviceTransitionDataset(OBS_DIM, ACT_DIM, min_capacity=64)
        ds.sync_from(rb)
        assert ds.num_stored == 100
        assert ds.capacity >= 100
        np.testing.assert_allclose(
            np.asarray(ds.data.obs[:100]), rb.get_all().obs, rtol=1e-6
        )
        # append more rows -> only the delta uploads; content still matches
        rng = np.random.default_rng(7)
        for _ in range(40):
            rb.add(
                rng.normal(size=OBS_DIM).astype(np.float32),
                rng.normal(size=ACT_DIM).astype(np.float32),
                rng.normal(size=OBS_DIM).astype(np.float32),
                0.5, False, False,
            )
        ds.sync_from(rb)
        assert ds.num_stored == 140
        all_host = rb.get_all()
        np.testing.assert_allclose(
            np.asarray(ds.data.next_obs[:140]), all_host.next_obs, rtol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(ds.data.rewards[:140]), all_host.rewards, rtol=1e-6
        )

    def test_wrapped_ring_sync(self):
        rb = _make_buffer(60, capacity=64)
        ds = DeviceTransitionDataset(OBS_DIM, ACT_DIM, min_capacity=64)
        ds.sync_from(rb)
        rng = np.random.default_rng(3)
        for _ in range(20):  # wraps: 60 + 20 > 64
            rb.add(
                rng.normal(size=OBS_DIM).astype(np.float32),
                rng.normal(size=ACT_DIM).astype(np.float32),
                rng.normal(size=OBS_DIM).astype(np.float32),
                -1.0, False, False,
            )
        ds.sync_from(rb)
        assert ds.num_stored == 64
        np.testing.assert_allclose(
            np.asarray(ds.data.obs[:64]), rb.get_all().obs, rtol=1e-6
        )
        # further wrapped writes keep mirroring physical rows
        for _ in range(10):
            rb.add(
                rng.normal(size=OBS_DIM).astype(np.float32),
                rng.normal(size=ACT_DIM).astype(np.float32),
                rng.normal(size=OBS_DIM).astype(np.float32),
                2.0, False, False,
            )
        ds.sync_from(rb)
        np.testing.assert_allclose(
            np.asarray(ds.data.obs[:64]), rb.get_all().obs, rtol=1e-6
        )

    def test_bucketed_growth(self):
        ds = DeviceTransitionDataset(OBS_DIM, ACT_DIM, min_capacity=256)
        rb = _make_buffer(100, capacity=4096)
        ds.sync_from(rb)
        cap0 = ds.capacity
        assert cap0 == 256
        for _ in range(3):
            batch = rb.get_range(0, 100)
            ds.append(batch)
        assert ds.num_stored == 400
        assert ds.capacity >= 400 and ds.capacity % 256 == 0


class TestDeviceTrainer:
    def test_device_training_learns_and_sets_elites(self):
        rb = _make_buffer(300)
        wrapper, state = _make_model()
        trainer = ModelTrainer(wrapper, optim_lr=1e-3, weight_decay=0.0)
        state = wrapper.update_normalizer_host(state, rb.get_all())
        ds = DeviceTransitionDataset(OBS_DIM, ACT_DIM, min_capacity=256)
        ds.sync_from(rb)
        new_state, losses, vals = trainer.train_device(
            state, ds, batch_size=32, val_ratio=0.2, num_epochs=20,
            patience=20,
        )
        assert len(losses) == 20
        # NLL decreases markedly on a learnable linear system
        assert losses[-1] < losses[0]
        assert vals[-1] < vals[0]
        elite = np.asarray(new_state["params"]["elite"])
        assert elite.shape == (2,)  # num_elites
        assert len(set(elite.tolist())) == 2

    def test_device_training_raises_on_divergence(self):
        """NaN params -> DivergenceError, never a silently-returned dead model
        (the round-2 on-chip PlaNet failure mode)."""
        import jax

        from mbrl_tpu.models.trainer import DivergenceError

        rb = _make_buffer(200)
        wrapper, state = _make_model()
        trainer = ModelTrainer(wrapper, optim_lr=1e-3, weight_decay=0.0)
        ds = DeviceTransitionDataset(OBS_DIM, ACT_DIM, min_capacity=256)
        ds.sync_from(rb)
        bad = {
            **state,
            "params": jax.tree_util.tree_map(
                lambda x: x * np.nan
                if np.issubdtype(np.asarray(x).dtype, np.floating)
                else x,
                state["params"],
            ),
        }
        with pytest.raises(DivergenceError):
            trainer.train_device(
                bad, ds, batch_size=32, val_ratio=0.2, num_epochs=2, patience=2
            )

    def test_device_training_persists_opt_state(self):
        """Adam moments carry across train_device calls via the state dict
        (reference constructs its optimizer once, model_trainer.py:63-68)."""
        rb = _make_buffer(200)
        wrapper, state = _make_model()
        trainer = ModelTrainer(wrapper, optim_lr=1e-3, weight_decay=0.0)
        state = wrapper.update_normalizer_host(state, rb.get_all())
        ds = DeviceTransitionDataset(OBS_DIM, ACT_DIM, min_capacity=256)
        ds.sync_from(rb)
        s1, _, _ = trainer.train_device(
            state, ds, batch_size=32, val_ratio=0.2, num_epochs=2, patience=2
        )
        assert "opt_state" in s1
        s2, _, _ = trainer.train_device(
            s1, ds, batch_size=32, val_ratio=0.2, num_epochs=3, patience=3
        )
        def step_counts(s):
            return [
                int(l)
                for l in jax.tree_util.tree_leaves(s["opt_state"])
                if getattr(l, "ndim", None) == 0
                and str(getattr(l, "dtype", "")).startswith("int")
            ]

        c1, c2 = step_counts(s1), step_counts(s2)
        assert c1 and c2 and max(c2) > max(c1), (c1, c2)

    def test_early_stopping_respects_patience(self):
        rb = _make_buffer(200)
        wrapper, state = _make_model()
        trainer = ModelTrainer(wrapper, optim_lr=1e-3, weight_decay=0.0)
        state = wrapper.update_normalizer_host(state, rb.get_all())
        ds = DeviceTransitionDataset(OBS_DIM, ACT_DIM, min_capacity=256)
        ds.sync_from(rb)
        # lr=0 makes every epoch a non-improvement -> exactly `patience` epochs
        frozen_trainer = ModelTrainer(wrapper, optim_lr=0.0, weight_decay=0.0)
        _, losses, _ = frozen_trainer.train_device(
            state, ds, batch_size=32, val_ratio=0.2, patience=3, max_epochs=50
        )
        assert len(losses) == 3

    def test_device_path_tracks_host_path(self):
        """Same data, same epoch count: both paths reach similar val scores
        (they consume different PRNG streams, so parity is statistical)."""
        rb = _make_buffer(400)
        wrapper, state0 = _make_model()
        from mbrl_tpu.util.common import get_basic_buffer_iterators

        # host path
        trainer_h = ModelTrainer(wrapper, optim_lr=1e-3, weight_decay=0.0)
        state_h = wrapper.update_normalizer(state0, rb.get_all())
        tr_it, va_it = get_basic_buffer_iterators(rb, 32, 0.2, ensemble_size=3)
        _, _, vals_h = trainer_h.train(
            state_h, tr_it, dataset_val=va_it, num_epochs=15, patience=15
        )
        # device path
        trainer_d = ModelTrainer(wrapper, optim_lr=1e-3, weight_decay=0.0)
        state_d = wrapper.update_normalizer_host(state0, rb.get_all())
        ds = DeviceTransitionDataset(OBS_DIM, ACT_DIM, min_capacity=512)
        ds.sync_from(rb)
        _, _, vals_d = trainer_d.train_device(
            state_d, ds, batch_size=32, val_ratio=0.2, num_epochs=15, patience=15
        )
        # both paths near-converge (different PRNG streams and val splits, so
        # compare improvement, not the tiny final values bitwise)
        assert vals_h[-1] < 0.1 * vals_h[0]
        assert vals_d[-1] < 0.1 * vals_d[0]
        assert vals_d[-1] < 3.0 * max(vals_h[-1], 1e-4)


class TestFusedSACUpdate:
    def _sac(self):
        space = gym.spaces.Box(-1.0, 1.0, (ACT_DIM,), np.float32)
        sac = SAC(num_inputs=OBS_DIM, action_space=space, hidden_size=32)
        return sac, sac.init(jax.random.PRNGKey(0))

    def test_update_from_buffer_matches_update_many_semantics(self):
        sac, state = self._sac()
        buf = DeviceReplayBuffer(128, OBS_DIM, ACT_DIM)
        bs = buf.init()
        rng = np.random.default_rng(0)
        bs = buf.add_batch(
            bs,
            rng.normal(size=(64, OBS_DIM)),
            rng.normal(size=(64, ACT_DIM)),
            rng.normal(size=(64, OBS_DIM)),
            rng.normal(size=64),
            np.ones(64),
        )
        key = jax.random.PRNGKey(42)
        new_state, new_key, metrics = sac.update_from_buffer(
            state, bs, key, num_updates=5, batch_size=16
        )
        assert int(new_state.updates) == 5
        assert not np.array_equal(np.asarray(new_key), np.asarray(key))
        assert np.isfinite(float(metrics["critic_loss"]))
        # params actually moved
        w0 = np.asarray(state.policy[0]["w"])
        w1 = np.asarray(new_state.policy[0]["w"])
        assert not np.allclose(w0, w1)

    def test_host_actor_matches_device_actor(self):
        sac, state = self._sac()
        agent_host = SACAgent(sac, state, seed=5, host_actor=True)
        agent_dev = SACAgent(sac, state, seed=5, host_actor=False)
        obs = np.ones(OBS_DIM, np.float32)
        # deterministic (evaluate) path: same params -> identical mean action
        a_h = agent_host.act(obs, sample=False)
        a_d = agent_dev.act(obs, sample=False)
        np.testing.assert_allclose(a_h, a_d, rtol=1e-5, atol=1e-6)
        assert a_h.shape == (ACT_DIM,)

    def test_host_actor_tracks_set_state(self):
        sac, state = self._sac()
        agent = SACAgent(sac, state, seed=1, host_actor=True)
        obs = np.full(OBS_DIM, 0.3, np.float32)
        a0 = agent.act(obs, sample=False)
        # perturb policy params; the mirrored actor must follow
        new_policy = jax.tree_util.tree_map(lambda p: p + 0.1, state.policy)
        agent.set_state(state.replace(policy=new_policy))
        a1 = agent.act(obs, sample=False)
        assert not np.allclose(a0, a1)


def test_mbpo_save_video_writes_eval_video(tmp_path):
    """cfg.save_video=true must produce a per-epoch eval video artifact
    (reference mbrl/algorithms/mbpo.py:137-147)."""
    import pathlib
    import sys

    sys.path.insert(0, str(pathlib.Path(__file__).parent))
    from test_algorithms import MockLineEnv, mock_term_fn

    import mbrl_tpu.algorithms.mbpo as mbpo
    from mbrl_tpu.config import load_config

    class RenderableLineEnv(MockLineEnv):
        render_mode = "rgb_array"

        def render(self):
            return np.zeros((8, 8, 3), np.uint8)

    conf = pathlib.Path(__file__).parent.parent / "mbrl_tpu/examples/conf"
    cfg = load_config(conf, "main", overrides=[
        "algorithm=mbpo", "overrides=mbpo_cartpole", "save_video=true",
        "overrides.num_steps=60", "overrides.epoch_length=30",
        "algorithm.initial_exploration_steps=30",
        "overrides.freq_train_model=30",
        "overrides.effective_model_rollouts_per_step=2",
        "overrides.num_sac_updates_per_step=1",
        "overrides.num_epochs_train_model=1",
        "dynamics_model.ensemble_size=2", "dynamics_model.hid_size=16",
        "dynamics_model.num_layers=2",
        "overrides.model_batch_size=16", "overrides.sac_batch_size=16",
        "seed=0",
    ])
    mbpo.train(
        RenderableLineEnv(), RenderableLineEnv(), mock_term_fn, cfg,
        silent=True, work_dir=str(tmp_path),
    )
    videos = list((tmp_path / "video").glob("*"))
    assert videos, "no eval video artifact written"
