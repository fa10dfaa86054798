"""Env layer tests: custom envs, config-driven creation, pixel wrapper, handlers."""
import pathlib

import numpy as np
import pytest

from mbrl_tpu.config import load_config
from mbrl_tpu.util.env import create_handler

_CONF_DIR = pathlib.Path(__file__).parent.parent / "mbrl_tpu" / "examples" / "conf"


def _cfg(overrides):
    return load_config(_CONF_DIR, "main", overrides=overrides)


@pytest.mark.parametrize(
    "override,obs_dim,has_reward_fn",
    [
        ("pets_cartpole", 4, True),
        ("pets_halfcheetah", 18, True),
        ("pets_cartpole_paper_version", 4, True),
        ("mbpo_inv_pendulum", 4, False),
        ("mbpo_ant", 27, False),
    ],
)
def test_make_env_from_config(override, obs_dim, has_reward_fn):
    cfg = _cfg([f"overrides={override}"])
    handler = create_handler(cfg)
    env, term_fn, reward_fn = handler.make_env(cfg)
    obs, _ = env.reset(seed=0)
    assert obs.shape == (obs_dim,)
    next_obs, reward, term, trunc, _ = env.step(env.action_space.sample())
    assert np.isfinite(reward)
    if has_reward_fn:
        assert reward_fn is not None
    else:
        assert reward_fn is None  # learned rewards
    assert term_fn is not None
    # termination fns run batched on jnp
    import jax.numpy as jnp

    flags = term_fn(
        jnp.zeros((3, env.action_space.shape[0])), jnp.zeros((3, obs_dim))
    )
    assert flags.shape == (3, 1)


def test_obs_process_fn_import():
    cfg = _cfg(["overrides=pets_halfcheetah"])
    from mbrl_tpu.config import create_one_dim_tr_model

    wrapper = create_one_dim_tr_model(cfg, (18,), (6,))
    assert wrapper.obs_process_fn is not None
    assert wrapper.no_delta_list == (0,)
    # model in_size accounts for processed obs (18 stays 18 for halfcheetah)
    assert wrapper.model.in_size == 18 + 6


def test_mujoco_pixel_wrapper():
    from mbrl_tpu.envs.pets_cartpole import CartPoleEnv
    from mbrl_tpu.envs.mujoco_pixel_wrapper import MujocoGymPixelWrapper

    env = MujocoGymPixelWrapper(
        CartPoleEnv(render_mode="rgb_array"),
        image_width=48,
        image_height=48,
        frame_skip=2,
        bit_depth=5,
    )
    obs, _ = env.reset(seed=0)
    assert obs.shape == (3, 48, 48) and obs.dtype == np.uint8
    obs2, r, term, trunc, _ = env.step(env.action_space.sample())
    assert obs2.shape == (3, 48, 48)
    assert env.get_last_low_dim_obs().shape == (4,)
    # normalized action space
    np.testing.assert_allclose(env.action_space.low, -1.0)


def test_mujoco_handler_freeze():
    from mbrl_tpu.util.env import MujocoEnvHandler
    from mbrl_tpu.envs.pets_halfcheetah import HalfCheetahEnv

    env = HalfCheetahEnv()
    env.reset(seed=0)
    state_before = MujocoEnvHandler.get_current_state(env)
    with MujocoEnvHandler.freeze(env):
        for _ in range(5):
            env.step(env.action_space.sample())
    state_after = MujocoEnvHandler.get_current_state(env)
    np.testing.assert_allclose(state_before[0], state_after[0])
    np.testing.assert_allclose(state_before[1], state_after[1])


def test_dmcontrol_handler_freeze():
    import os

    os.environ.setdefault("MUJOCO_GL", "egl")
    from mbrl_tpu.util.dmcontrol_wrapper import DmControlEnv
    from mbrl_tpu.util.env import DmcontrolEnvHandler, create_handler_from_str

    assert isinstance(
        create_handler_from_str("dmcontrol___cartpole--balance"), DmcontrolEnvHandler
    )
    env = DmControlEnv("cartpole", "balance", seed=0)
    env.reset()
    before = DmcontrolEnvHandler.get_current_state(env)
    with DmcontrolEnvHandler.freeze(env):
        for _ in range(5):
            env.step(env.action_space.sample())
    after = DmcontrolEnvHandler.get_current_state(env)
    np.testing.assert_allclose(before[0], after[0])
