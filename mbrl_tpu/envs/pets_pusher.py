"""PETS-benchmark Pusher (7-DOF PR2-style arm pushing a cylinder to a goal).

Capability parity with the reference ``mbrl/env/pets_pusher.py``: 20-dim observation
(arm qpos/qvel + tips_arm + object positions, goal excluded), reward
``1.25*dist + 0.1*ctrl + 0.5*near`` computed BEFORE stepping, frame_skip 4, fixed
goal with small cylinder-position noise on reset. Uses gymnasium's bundled
``pusher.xml`` (the same openai/gym PR2 arm the PETS asset derives from).
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


class PusherEnv(mujoco_env.MujocoEnv, utils.EzPickle):
    metadata = {
        "render_modes": ["human", "rgb_array", "depth_array"],
        "render_fps": 25,
    }

    def __init__(self, render_mode: Optional[str] = None):
        observation_space = Box(low=-np.inf, high=np.inf, shape=(20,), dtype=np.float64)
        mujoco_env.MujocoEnv.__init__(
            self, _gym_asset("pusher.xml"), 4, observation_space, render_mode
        )
        utils.EzPickle.__init__(self)
        self.reset_model()

    def step(self, a):
        obj_pos = self.get_body_com("object")
        vec_to_arm = obj_pos - self.get_body_com("tips_arm")
        vec_to_goal = obj_pos - self.get_body_com("goal")
        reward_near = -np.sum(np.abs(vec_to_arm))
        reward_dist = -np.sum(np.abs(vec_to_goal))
        reward_ctrl = -np.square(a).sum()
        reward = 1.25 * reward_dist + 0.1 * reward_ctrl + 0.5 * reward_near

        self.do_simulation(a, self.frame_skip)
        ob = self._get_obs()
        if self.render_mode == "human":
            self.render()
        return ob, reward, False, False, {}

    def reset_model(self):
        qpos = np.copy(self.init_qpos)
        self.goal_pos = np.asarray([0.0, 0.0])
        self.cylinder_pos = np.array([-0.25, 0.15]) + self.np_random.normal(
            0, 0.025, [2]
        )
        qpos[-4:-2] = self.cylinder_pos
        qpos[-2:] = self.goal_pos
        qvel = self.init_qvel + self.np_random.uniform(
            low=-0.005, high=0.005, size=self.model.nv
        )
        qvel[-4:] = 0
        self.set_state(qpos, qvel)
        self.ac_goal_pos = self.get_body_com("goal")
        return self._get_obs()

    def _get_obs(self):
        return np.concatenate(
            [
                self.data.qpos.flat[:7],
                self.data.qvel.flat[:7],
                self.get_body_com("tips_arm"),
                self.get_body_com("object"),
            ]
        )
