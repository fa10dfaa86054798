"""PETS-paper cartpole swing-up (mujoco).

Capability parity with the reference ``mbrl/env/pets_cartpole.py``: 4-dim
(qpos, qvel) observation, exponential end-effector reward toward the upright
position minus action cost (:38-57), sin/cos angle preprocessing hook
(``preprocess_fn``, :79-103 — note it EXPANDS the obs dim, so configs set the model
in_size manually, e.g. ``dynamics_model.in_size=6``).
"""
from __future__ import annotations

import os
from typing import Optional

import numpy as np
from gymnasium import utils
from gymnasium.envs.mujoco import mujoco_env
from gymnasium.spaces import Box

_ASSET = os.path.join(os.path.dirname(__file__), "assets", "cartpole_swingup.xml")


class CartPoleEnv(mujoco_env.MujocoEnv, utils.EzPickle):
    PENDULUM_LENGTH = 0.6
    metadata = {
        "render_modes": ["human", "rgb_array", "depth_array"],
        "render_fps": 25,
    }

    def __init__(self, render_mode: Optional[str] = None):
        utils.EzPickle.__init__(self)
        observation_space = Box(low=-np.inf, high=np.inf, shape=(4,), dtype=np.float64)
        mujoco_env.MujocoEnv.__init__(self, _ASSET, 2, observation_space, render_mode)

    def step(self, a):
        self.do_simulation(a, self.frame_skip)
        ob = self._get_obs()
        ee = CartPoleEnv._get_ee_pos(ob)
        reward = np.exp(
            -np.sum(np.square(ee - np.array([0.0, CartPoleEnv.PENDULUM_LENGTH])))
            / (CartPoleEnv.PENDULUM_LENGTH**2)
        )
        reward -= 0.01 * np.sum(np.square(a))
        if self.render_mode == "human":
            self.render()
        return ob, reward, False, False, {}

    def reset_model(self):
        qpos = self.init_qpos + np.random.normal(0, 0.1, np.shape(self.init_qpos))
        qvel = self.init_qvel + np.random.normal(0, 0.1, np.shape(self.init_qvel))
        self.set_state(qpos, qvel)
        return self._get_obs()

    def _get_obs(self):
        return np.concatenate([self.data.qpos, self.data.qvel]).ravel()

    @staticmethod
    def _get_ee_pos(x):
        x0, theta = x[0], x[1]
        return np.array(
            [
                x0 - CartPoleEnv.PENDULUM_LENGTH * np.sin(theta),
                -CartPoleEnv.PENDULUM_LENGTH * np.cos(theta),
            ]
        )

    @staticmethod
    def preprocess_fn(state):
        """[sin(theta), cos(theta), x, qvel...] — numpy or jnp, batched."""
        import jax.numpy as jnp

        xp = jnp if not isinstance(state, np.ndarray) else np
        return xp.concatenate(
            [
                xp.sin(state[..., 1:2]),
                xp.cos(state[..., 1:2]),
                state[..., :1],
                state[..., 2:],
            ],
            axis=-1,
        )
