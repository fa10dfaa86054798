"""Shared loader for experiment result directories.

The run dir (written by ``mbrl_tpu.examples.main``) is the source of truth for
reconstruction, mirroring the reference's reload-from-Hydra-dir convention
(mbrl/util/common.py:113-130): ``config.yaml`` + ``model.pkl`` (+ normalizer stats)
+ ``replay_buffer.npz``.
"""
from __future__ import annotations

import pathlib
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
import yaml

from mbrl_tpu.config import Config, create_one_dim_tr_model
from mbrl_tpu.util import common as util_common
from mbrl_tpu.util.env import create_handler


def load_run_config(results_dir) -> Config:
    results_dir = pathlib.Path(results_dir)
    cfg_file = results_dir / "config.yaml"
    if not cfg_file.exists():
        cfg_file = results_dir / ".hydra" / "config.yaml"
    with open(cfg_file) as f:
        return Config(yaml.safe_load(f))


def load_experiment(
    results_dir, load_buffer: bool = True
) -> Tuple[Config, Any, Any, Dict[str, Any], Optional[Any], Any, Any]:
    """Reconstruct (cfg, env, dynamics wrapper, wrapper state, replay buffer,
    term_fn, reward_fn) from a results directory."""
    results_dir = pathlib.Path(results_dir)
    cfg = load_run_config(results_dir)
    handler = create_handler(cfg)
    env, term_fn, reward_fn = handler.make_env(cfg)
    obs_shape = env.observation_space.shape
    act_shape = env.action_space.shape

    wrapper = create_one_dim_tr_model(cfg, obs_shape, act_shape)
    state = wrapper.init(jax.random.PRNGKey(cfg.get("seed", 0) or 0))
    state = wrapper.load(state, results_dir)

    buffer = None
    if load_buffer and (results_dir / "replay_buffer.npz").exists():
        buffer = util_common.create_replay_buffer(
            cfg, obs_shape, act_shape, load_dir=results_dir
        )
    return cfg, env, wrapper, state, buffer, term_fn, reward_fn
