"""Environment construction and state freeze/get/set handlers.

Capability parity with the reference ``mbrl/util/env.py`` (EnvHandler/Freeze ABC
:48-284 with make_env from config or legacy ``gym___``/``dmcontrol___`` strings,
termination/reward fn lookup, ground-truth rollouts inside a freeze context) and the
backend handlers (mujoco.py, dmcontrol.py).
"""
from __future__ import annotations

import abc
from typing import Any, Callable, Dict, Optional, Tuple, Union

import gymnasium as gym
import numpy as np

import mbrl_tpu.envs
from mbrl_tpu.envs import reward_fns as _reward_fns
from mbrl_tpu.envs import termination_fns as _term_fns


def _lookup_fn(module, name: Optional[str]):
    if not name:
        return None
    if not hasattr(module, name):
        return None
    return getattr(module, name)


class Freeze(abc.ABC):
    """Context manager capturing and restoring an env's physics state."""

    def __enter__(self):
        raise NotImplementedError

    def __exit__(self, *args):
        raise NotImplementedError


class EnvHandler(abc.ABC):
    """Backend-neutral environment utilities."""

    freeze = Freeze

    @staticmethod
    @abc.abstractmethod
    def is_correct_env_type(env: gym.wrappers.TimeLimit) -> bool:
        ...

    @staticmethod
    @abc.abstractmethod
    def make_env_from_str(env_name: str) -> gym.Env:
        ...

    @staticmethod
    @abc.abstractmethod
    def get_current_state(env) -> Tuple:
        ...

    @staticmethod
    @abc.abstractmethod
    def set_env_state(state: Tuple, env) -> None:
        ...

    @classmethod
    def rollout_env(
        cls,
        env: gym.wrappers.TimeLimit,
        initial_obs: np.ndarray,
        lookahead: int,
        agent=None,
        plan=None,
    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Ground-truth rollouts inside a freeze context (diagnostics)."""
        actions = []
        real_obses = []
        rewards = []
        with cls.freeze(env):  # type: ignore
            current_obs = initial_obs.copy()
            real_obses.append(current_obs)
            if plan is not None:
                lookahead = len(plan)
            for i in range(lookahead):
                a = plan[i] if plan is not None else agent.act(current_obs)
                if isinstance(a, np.ndarray) and a.ndim == 0:
                    a = a[None]
                next_obs, reward, terminated, truncated, _ = env.step(a)
                actions.append(a)
                real_obses.append(next_obs)
                rewards.append(reward)
                if terminated or truncated:
                    break
                current_obs = next_obs
        return np.stack(real_obses), np.stack(rewards), np.stack(actions)

    @classmethod
    def make_env(
        cls,
        cfg,
    ) -> Tuple[gym.Env, Optional[Callable], Optional[Callable]]:
        """Create an env + termination_fn + reward_fn from cfg.overrides.

        cfg.overrides.env is either a known custom env name, a legacy
        ``gym___<EnvName>`` / ``dmcontrol___<domain>--<task>`` string, or a
        ``_target_`` env config node (cfg.overrides.env_cfg).
        """
        env_name = cfg.overrides.env
        term_fn = _lookup_fn(_term_fns, cfg.overrides.get("term_fn", None))
        reward_name = cfg.overrides.get("reward_fn", None) or cfg.overrides.get(
            "term_fn", None
        )
        reward_fn = _lookup_fn(_reward_fns, reward_name)

        env = make_env_from_name(cfg, env_name)
        learned_rewards = cfg.overrides.get("learned_rewards", True)
        if learned_rewards:
            reward_fn = None
        if cfg.overrides.get("trial_length", None):
            env = gym.wrappers.TimeLimit(
                env, max_episode_steps=cfg.overrides.trial_length
            )
        return env, term_fn, reward_fn


_CUSTOM_ENVS = {
    "cartpole_continuous": "CartPoleEnv",
    "pets_halfcheetah": "PetsHalfCheetahEnv",
    "pets_cartpole": "PetsCartPoleEnv",
    "cartpole_pets_version": "PetsCartPoleEnv",
    "ant_truncated_obs": "AntTruncatedObsEnv",
    "humanoid_truncated_obs": "HumanoidTruncatedObsEnv",
    "pets_pusher": "PetsPusherEnv",
    "pets_reacher": "PetsReacher3DEnv",
}


def make_env_from_name(cfg, env_name: str) -> gym.Env:
    if env_name in _CUSTOM_ENVS:
        return getattr(mbrl_tpu.envs, _CUSTOM_ENVS[env_name])()
    if "env_cfg" in cfg.overrides:
        from mbrl_tpu.config import instantiate

        return instantiate(cfg.overrides.env_cfg)
    if env_name.startswith("gym___"):
        return gym.make(env_name.split("___")[1])
    if env_name.startswith("dmcontrol___"):
        domain, task = env_name.split("___")[1].split("--")
        from mbrl_tpu.util.dmcontrol_wrapper import DmControlEnv

        return DmControlEnv(
            domain,
            task,
            from_pixels=cfg.overrides.get("from_pixels", False),
            frame_skip=cfg.overrides.get("frame_skip", 1),
            bit_depth=cfg.overrides.get("bit_depth", 8),
        )
    # custom env registered under mbrl_tpu.envs
    if hasattr(mbrl_tpu.envs, env_name):
        return getattr(mbrl_tpu.envs, env_name)()
    raise ValueError(f"Unknown environment {env_name!r}")


class GenericEnvHandler(EnvHandler):
    """Handler for plain gymnasium envs without physics state access."""

    class freeze(Freeze):  # noqa: N801 — context manager named like attribute
        def __init__(self, env):
            self.env = env
            self._state = None

        def __enter__(self):
            import copy

            env = self.env.unwrapped
            self._state = copy.deepcopy(env.__dict__)
            return self

        def __exit__(self, *args):
            self.env.unwrapped.__dict__.update(self._state)

    @staticmethod
    def is_correct_env_type(env) -> bool:
        return True

    @staticmethod
    def make_env_from_str(env_name: str) -> gym.Env:
        return gym.make(env_name)

    @staticmethod
    def get_current_state(env) -> Tuple:
        import copy

        return (copy.deepcopy(env.unwrapped.__dict__),)

    @staticmethod
    def set_env_state(state: Tuple, env) -> None:
        env.unwrapped.__dict__.update(state[0])


class MujocoEnvHandler(EnvHandler):
    """qpos/qvel get/set + elapsed-steps freeze for Gymnasium MuJoCo envs.
    Parity: reference mbrl/util/mujoco.py:24-136."""

    class freeze(Freeze):  # noqa: N801
        def __init__(self, env):
            self.env = env
            self._state = None
            self._elapsed_steps = 0

        def __enter__(self):
            self._state = MujocoEnvHandler.get_current_state(self.env)
            self._elapsed_steps = getattr(self.env, "_elapsed_steps", 0)
            return self

        def __exit__(self, *args):
            MujocoEnvHandler.set_env_state(self._state, self.env)
            if hasattr(self.env, "_elapsed_steps"):
                self.env._elapsed_steps = self._elapsed_steps

    @staticmethod
    def is_correct_env_type(env) -> bool:
        return hasattr(env.unwrapped, "data") and hasattr(env.unwrapped, "model")

    @staticmethod
    def make_env_from_str(env_name: str) -> gym.Env:
        return gym.make(env_name)

    @staticmethod
    def get_current_state(env) -> Tuple:
        unwrapped = env.unwrapped
        return (
            unwrapped.data.qpos.copy(),
            unwrapped.data.qvel.copy(),
        )

    @staticmethod
    def set_env_state(state: Tuple, env) -> None:
        qpos, qvel = state
        env.unwrapped.set_state(qpos, qvel)


class DmcontrolEnvHandler(EnvHandler):
    """physics.get_state/set_state freeze for dm_control-backed envs.
    Parity: reference mbrl/util/dmcontrol.py:18-103."""

    class freeze(Freeze):  # noqa: N801
        def __init__(self, env):
            self.env = env
            self._state = None

        def __enter__(self):
            self._state = DmcontrolEnvHandler.get_current_state(self.env)
            return self

        def __exit__(self, *args):
            DmcontrolEnvHandler.set_env_state(self._state, self.env)

    @staticmethod
    def is_correct_env_type(env) -> bool:
        return hasattr(env.unwrapped, "_env") and hasattr(
            getattr(env.unwrapped, "_env", None), "physics"
        )

    @staticmethod
    def make_env_from_str(env_name: str) -> gym.Env:
        domain, task = env_name.split("___")[1].split("--")
        from mbrl_tpu.util.dmcontrol_wrapper import DmControlEnv

        return DmControlEnv(domain, task)

    @staticmethod
    def get_current_state(env) -> Tuple:
        physics = env.unwrapped._env.physics
        return (physics.get_state().copy(),)

    @staticmethod
    def set_env_state(state: Tuple, env) -> None:
        physics = env.unwrapped._env.physics
        with physics.reset_context():
            physics.set_state(state[0])


def create_handler(cfg) -> EnvHandler:
    """Pick a handler from the env name in the config."""
    return create_handler_from_str(cfg.overrides.env)


def create_handler_from_str(env_name: str) -> EnvHandler:
    if env_name.startswith("dmcontrol___"):
        return DmcontrolEnvHandler()
    if env_name in ("pets_halfcheetah", "pets_cartpole", "cartpole_pets_version",
                    "pets_pusher", "pets_reacher", "ant_truncated_obs",
                    "humanoid_truncated_obs"):
        return MujocoEnvHandler()
    if env_name.startswith("gym___") and any(
        tok in env_name for tok in ("HalfCheetah", "Hopper", "Walker", "Ant", "Humanoid", "Inverted", "Reacher", "Pusher", "Swimmer")
    ):
        return MujocoEnvHandler()
    return GenericEnvHandler()
