"""PETS-variant HalfCheetah (Chua et al., 2018 benchmark env).

Capability parity with the reference ``mbrl/env/pets_halfcheetah.py``: 18-dim
observation whose first entry is the forward velocity computed from the qpos
difference (:47-54), reward = velocity - 0.1*||a||^2 via a static ``get_reward``
(:123-145), and the sin/cos angle preprocessing hook used by the dynamics model
(``preprocess_fn``, :67-121, wired via overrides.obs_process_fn).

Uses gymnasium's bundled half_cheetah.xml (same morphology the benchmark derives
from) instead of vendored assets; the preprocessing fn is pure jnp/numpy so it
compiles into model rollouts.
"""
from __future__ import annotations

import os
from typing import Optional

import numpy as np
from gymnasium import utils
from gymnasium.envs.mujoco import mujoco_env
from gymnasium.spaces import Box


def _gym_asset(name: str) -> str:
    import gymnasium.envs.mujoco as m

    return os.path.join(os.path.dirname(m.__file__), "assets", name)


class HalfCheetahEnv(mujoco_env.MujocoEnv, utils.EzPickle):
    metadata = {
        "render_modes": ["human", "rgb_array", "depth_array"],
        "render_fps": 20,
    }

    def __init__(self, render_mode: Optional[str] = None):
        self.prev_qpos = None
        observation_space = Box(low=-np.inf, high=np.inf, shape=(18,), dtype=np.float64)
        mujoco_env.MujocoEnv.__init__(
            self,
            _gym_asset("half_cheetah.xml"),
            5,
            observation_space,
            render_mode,
        )
        utils.EzPickle.__init__(self)

    def step(self, action):
        self.prev_qpos = np.copy(self.data.qpos.flat)
        self.do_simulation(action, self.frame_skip)
        ob = self._get_obs()
        reward = HalfCheetahEnv.get_reward(ob, action)
        if self.render_mode == "human":
            self.render()
        return ob, reward, False, False, {}

    def _get_obs(self):
        return np.concatenate(
            [
                (self.data.qpos[:1] - self.prev_qpos[:1]) / self.dt,
                self.data.qpos[1:],
                self.data.qvel,
            ]
        )

    def reset_model(self):
        qpos = self.init_qpos + np.random.normal(loc=0, scale=0.001, size=self.model.nq)
        qvel = self.init_qvel + np.random.normal(loc=0, scale=0.001, size=self.model.nv)
        self.set_state(qpos, qvel)
        self.prev_qpos = np.copy(self.data.qpos)
        return self._get_obs()

    @staticmethod
    def preprocess_fn(state):
        """obs[1], sin(obs[2]), cos(obs[2]), obs[3:] — works on numpy or jnp,
        any leading batch dims."""
        import jax.numpy as jnp

        xp = jnp if not isinstance(state, np.ndarray) else np
        return xp.concatenate(
            [
                state[..., 1:2],
                xp.sin(state[..., 2:3]),
                xp.cos(state[..., 2:3]),
                state[..., 3:],
            ],
            axis=-1,
        )

    @staticmethod
    def get_reward(next_ob, action):
        """reward = forward velocity - 0.1*||a||^2 (batched or single)."""
        was1d = next_ob.ndim == 1
        if was1d:
            next_ob = np.expand_dims(next_ob, 0)
            action = np.expand_dims(action, 0)
        reward_ctrl = -0.1 * np.square(action).sum(axis=-1)
        reward_run = next_ob[..., 0]
        reward = reward_run + reward_ctrl
        return reward.squeeze() if was1d else reward
