"""Agent base interfaces.

Capability parity with the reference ``mbrl/planning/core.py`` (Agent ABC :18-47,
RandomAgent :50-68). Config-completion (`complete_agent_cfg` :71-123) lives in
``mbrl_tpu.config`` since it is a config-engine concern.
"""
from __future__ import annotations

import abc
from typing import Any, Optional

import numpy as np


class Agent(abc.ABC):
    """An agent maps observations to actions."""

    @abc.abstractmethod
    def act(self, obs: np.ndarray, **kwargs) -> np.ndarray:
        """Issue an action for the given observation."""

    def plan(self, obs: np.ndarray, **kwargs) -> np.ndarray:
        """Issue a sequence of actions (defaults to a single-action plan)."""
        return np.asarray(self.act(obs, **kwargs))[None]

    def reset(self, **kwargs) -> None:
        """Clear any episode state."""


class RandomAgent(Agent):
    """Uniformly random actions from the env's action space."""

    def __init__(self, env):
        self.env = env

    def act(self, obs: np.ndarray, **kwargs) -> np.ndarray:
        return self.env.action_space.sample()


def load_agent(agent_path, env):
    """Reconstruct a saved agent from a results directory.

    The directory must contain the run's composed ``config.yaml`` (written by
    ``mbrl_tpu.examples.main``) and the agent checkpoint (``sac.pkl`` for SAC
    agents). Parity: reference ``mbrl/planning/core.py:126-157`` (which reloads
    from the saved Hydra config).
    """
    import pathlib

    import yaml

    from mbrl_tpu.config import Config

    agent_path = pathlib.Path(agent_path)
    cfg_file = agent_path / "config.yaml"
    if not cfg_file.exists():
        cfg_file = agent_path / ".hydra" / "config.yaml"
    with open(cfg_file) as f:
        cfg = Config(yaml.safe_load(f))

    if cfg.algorithm.name == "mbpo":
        import jax

        from mbrl_tpu.planning.sac import SAC, SACAgent

        sac = SAC(
            num_inputs=env.observation_space.shape[0],
            action_space=env.action_space,
            gamma=cfg.overrides.sac_gamma,
            tau=cfg.overrides.sac_tau,
            alpha=cfg.overrides.sac_alpha,
            policy=cfg.overrides.sac_policy,
            target_update_interval=cfg.overrides.sac_target_update_interval,
            automatic_entropy_tuning=cfg.overrides.sac_automatic_entropy_tuning,
            hidden_size=cfg.overrides.sac_hidden_size,
            lr=cfg.overrides.sac_lr,
            target_entropy=cfg.overrides.get("sac_target_entropy", None),
        )
        if (agent_path / "sac.pkl").exists():
            state = sac.load_checkpoint(agent_path / "sac.pkl")
        else:
            # reference-trained run dir: torch pranz24 checkpoint
            # (mbrl/planning/core.py:126-157 reloads these; we convert the
            # tensors into the jax learner, planning/sac.py
            # load_torch_checkpoint)
            state = sac.load_torch_checkpoint(agent_path / "sac.pth")
        return SACAgent(sac, state)
    if cfg.algorithm.name == "pets":
        # beyond the reference (which only reloads SAC agents): rebuild the
        # saved ensemble + MPC planner so PETS runs are re-evaluable from
        # their results dir (scripts/eval_agent.py)
        import jax

        from mbrl_tpu.config import (
            complete_agent_cfg,
            create_one_dim_tr_model,
            instantiate,
        )
        from mbrl_tpu.models import ModelEnv
        from mbrl_tpu.planning.trajectory_opt import (
            create_trajectory_optim_agent_for_model,
        )
        from mbrl_tpu.util.env import create_handler

        _, term_fn, reward_fn = create_handler(cfg).make_env(cfg)
        dynamics_model = create_one_dim_tr_model(
            cfg, env.observation_space.shape, env.action_space.shape
        )
        model_state = dynamics_model.init(jax.random.PRNGKey(0))
        model_state = dynamics_model.load(model_state, agent_path)
        model_env = ModelEnv(dynamics_model, term_fn, reward_fn)
        agent_cfg = complete_agent_cfg(env, cfg.algorithm.agent)
        agent = instantiate(agent_cfg, seed=1)
        agent = create_trajectory_optim_agent_for_model(
            model_env, agent, num_particles=cfg.algorithm.num_particles
        )
        agent.set_eval_state(model_state)
        return agent
    raise ValueError(
        f"load_agent does not support algorithm {cfg.algorithm.name!r}"
    )
