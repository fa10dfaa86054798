"""End-to-end algorithm convergence tests on a mock double-integrator env, mirroring
the reference's tests/algorithms/test_algorithms.py (MockLineEnv, threshold chosen so
random success probability < 1e-5). Configs are assembled from the real YAML tree plus
test overrides, so these also validate the config schema."""
import pathlib

import gymnasium as gym
import jax.numpy as jnp
import numpy as np
import pytest

import mbrl_tpu.algorithms.pets as pets
from mbrl_tpu.config import load_config

_TRIAL_LEN = 30
_REW_C = 0.001
_INITIAL_EXPLORE = 500
_TARGET_REWARD = -20 * _REW_C
_CONF_DIR = pathlib.Path(__file__).parent.parent / "mbrl_tpu" / "examples" / "conf"

SEED = 12345


class MockLineEnv(gym.Env):
    """Point mass starts at 1.0 and must return to 0.0; reward -c*pos^2."""

    def __init__(self):
        self.pos = 1.0
        self.vel = 0.0
        self.time_left = _TRIAL_LEN
        self.observation_space = gym.spaces.Box(
            -np.inf * np.ones(2), np.inf * np.ones(2), shape=(2,)
        )
        self.action_space = gym.spaces.Box(-np.ones(1), np.ones(1), shape=(1,))
        self.action_space.seed(SEED)
        self.observation_space.seed(SEED)

    def reset(self, seed=None, options=None):
        super().reset(seed=seed)
        self.pos = 1.0
        self.vel = 0.0
        self.time_left = _TRIAL_LEN
        return np.array([self.pos, self.vel]), {}

    def step(self, action):
        self.vel += action.item()
        self.pos += self.vel
        self.time_left -= 1
        reward = -_REW_C * (self.pos**2)
        return np.array([self.pos, self.vel]), reward, self.time_left == 0, False, {}


def mock_reward_fn(action, obs):
    return (-_REW_C * (obs[:, 0] ** 2))[:, None]


def mock_term_fn(act, next_obs):
    return jnp.zeros((next_obs.shape[0], 1), dtype=bool)


def _pets_cfg(extra_overrides=()):
    cfg = load_config(
        _CONF_DIR,
        "main",
        overrides=[
            "algorithm=pets",
            "overrides=pets_cartpole",
            *extra_overrides,
        ],
    )
    cfg.seed = SEED
    # test-scale problem (mirrors the reference's test overrides)
    cfg.overrides["num_steps"] = _TRIAL_LEN * 5 + _INITIAL_EXPLORE
    cfg.overrides["trial_length"] = _TRIAL_LEN
    cfg.overrides["model_batch_size"] = 128
    cfg.overrides["num_epochs_train_model"] = 10
    cfg.overrides["patience"] = 5
    cfg.overrides["freq_train_model"] = 30
    cfg.overrides["planning_horizon"] = 10
    cfg.overrides["cem_num_iters"] = 5
    cfg.overrides["cem_population_size"] = 150
    cfg.algorithm["initial_exploration_steps"] = _INITIAL_EXPLORE
    cfg.algorithm["num_particles"] = 5
    size_node = (
        cfg.dynamics_model.member_cfg
        if "member_cfg" in cfg.dynamics_model
        else cfg.dynamics_model
    )
    size_node["hid_size"] = 64
    size_node["num_layers"] = 2
    from mbrl_tpu.config.engine import resolve_interpolations

    resolve_interpolations(cfg)
    return cfg


@pytest.mark.slow
@pytest.mark.parametrize("model_kind", ["gaussian_ensemble", "basic_ensemble"])
def test_pets_mock_line_env(model_kind, tmp_path):
    extra = []
    if model_kind == "basic_ensemble":
        extra = ["dynamics_model=basic_ensemble"]
    cfg = _pets_cfg(extra)
    if model_kind == "basic_ensemble":
        # mirror the reference: deterministic members, no elite subsetting
        # (test_algorithms.py:120-121), larger planning/training budget
        cfg.dynamics_model["ensemble_size"] = 5
        cfg.dynamics_model.member_cfg["deterministic"] = True
        cfg.overrides["num_elites"] = 5
        cfg.overrides["planning_horizon"] = 15
        cfg.overrides["cem_population_size"] = 350
        cfg.overrides["num_epochs_train_model"] = 25
        cfg.overrides["patience"] = 10
        from mbrl_tpu.config.engine import resolve_interpolations

        resolve_interpolations(cfg)
    env = MockLineEnv()
    max_reward = pets.train(
        env, mock_term_fn, mock_reward_fn, cfg, silent=True, work_dir=str(tmp_path)
    )
    assert max_reward > _TARGET_REWARD, max_reward


@pytest.mark.slow
def test_pets_icem_mock_line_env(tmp_path):
    cfg = _pets_cfg(["action_optimizer=icem"])
    # mirror the reference's iCEM test hyperparameters (test_algorithms.py:224-235)
    cfg.overrides["cem_population_decay_factor"] = 1.3
    cfg.overrides["cem_colored_noise_exponent"] = 2.0
    cfg.overrides["cem_keep_elite_frac"] = 0.3
    cfg.overrides["cem_population_size"] = 350
    cfg.overrides["planning_horizon"] = 15
    cfg.overrides["num_epochs_train_model"] = 20
    cfg.overrides["patience"] = 8
    from mbrl_tpu.config.engine import resolve_interpolations

    resolve_interpolations(cfg)
    env = MockLineEnv()
    max_reward = pets.train(env, mock_term_fn, mock_reward_fn, cfg, silent=True, work_dir=str(tmp_path))
    assert max_reward > _TARGET_REWARD, max_reward


@pytest.mark.slow
def test_pets_mppi_mock_line_env(tmp_path):
    cfg = _pets_cfg(["action_optimizer=mppi"])
    cfg.overrides["mppi_num_iters"] = 5
    cfg.overrides["mppi_population_size"] = 150
    cfg.overrides["mppi_gamma"] = 10.0
    cfg.overrides["mppi_sigma"] = 0.5
    cfg.overrides["mppi_beta"] = 0.7
    from mbrl_tpu.config.engine import resolve_interpolations

    resolve_interpolations(cfg)
    env = MockLineEnv()
    max_reward = pets.train(env, mock_term_fn, mock_reward_fn, cfg, silent=True, work_dir=str(tmp_path))
    assert max_reward > _TARGET_REWARD, max_reward


@pytest.mark.slow
def test_mbpo_mock_line_env(tmp_path):
    cfg = load_config(
        _CONF_DIR,
        "main",
        overrides=["algorithm=mbpo", "overrides=mbpo_halfcheetah"],
    )
    cfg.seed = SEED
    ov = cfg.overrides
    ov["num_steps"] = _TRIAL_LEN * 12
    ov["epoch_length"] = _TRIAL_LEN
    ov["freq_train_model"] = _TRIAL_LEN
    ov["effective_model_rollouts_per_step"] = 10
    ov["rollout_schedule"] = [1, 15, 1, 1]
    ov["num_sac_updates_per_step"] = 10
    ov["sac_updates_every_steps"] = 1
    ov["num_epochs_to_retain_sac_buffer"] = 1
    ov["model_batch_size"] = 128
    ov["validation_ratio"] = 0.1
    ov["num_epochs_train_model"] = 10
    ov["patience"] = 5
    ov["num_elites"] = 5
    ov["sac_hidden_size"] = 64
    ov["sac_batch_size"] = 128
    cfg.algorithm["initial_exploration_steps"] = _INITIAL_EXPLORE
    cfg.algorithm["random_initial_explore"] = True
    cfg.dynamics_model["hid_size"] = 64
    cfg.dynamics_model["num_layers"] = 2
    from mbrl_tpu.config.engine import resolve_interpolations

    resolve_interpolations(cfg)
    import mbrl_tpu.algorithms.mbpo as mbpo

    env = MockLineEnv()
    test_env = MockLineEnv()
    best_reward = mbpo.train(env, test_env, mock_term_fn, cfg, silent=True, work_dir=str(tmp_path))
    assert best_reward > _TARGET_REWARD, best_reward
