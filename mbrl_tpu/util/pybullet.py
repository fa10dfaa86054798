"""PyBullet environment handler (gated on pybullet availability).

Capability parity with the reference ``mbrl/util/pybullet.py:31-245``
(PybulletEnvHandler: bullet saveState/saveBullet-based freeze, state get/set with a
special path for locomotion envs). PyBullet is an optional dependency; importing
this module without it installed raises a clear error at construction time.
"""
from __future__ import annotations

import tempfile
from typing import Tuple

import gymnasium as gym
import numpy as np

from mbrl_tpu.util.env import EnvHandler, Freeze


def _require_pybullet():
    try:
        import pybullet  # noqa: F401

        return pybullet
    except ImportError as e:  # pragma: no cover
        raise ImportError(
            "PybulletEnvHandler requires the 'pybullet' package "
            "(pip install pybullet pybullet-gym)."
        ) from e


class PybulletEnvHandler(EnvHandler):
    """State freeze/get/set for pybullet-backed gym envs."""

    class freeze(Freeze):  # noqa: N801
        def __init__(self, env):
            _require_pybullet()
            self.env = env
            self._state = None

        def __enter__(self):
            self._state = PybulletEnvHandler.get_current_state(self.env)
            return self

        def __exit__(self, *args):
            PybulletEnvHandler.set_env_state(self._state, self.env)

    @staticmethod
    def is_correct_env_type(env) -> bool:
        return "bullet" in type(env.unwrapped).__module__.lower()

    @staticmethod
    def make_env_from_str(env_name: str) -> gym.Env:
        _require_pybullet()
        import pybulletgym  # noqa: F401  (registers envs)

        return gym.make(env_name)

    @staticmethod
    def get_current_state(env) -> Tuple:
        p = _require_pybullet()
        unwrapped = env.unwrapped
        # locomotion envs carry python-side state that saveState misses; snapshot
        # via a bullet file plus a copy of the python attributes
        handle = tempfile.NamedTemporaryFile(suffix=".bullet", delete=False)
        p.saveBullet(handle.name)
        import copy

        return (handle.name, copy.deepcopy(unwrapped.__dict__))

    @staticmethod
    def set_env_state(state: Tuple, env) -> None:
        p = _require_pybullet()
        fname, attrs = state
        p.restoreState(fileName=fname)
        env.unwrapped.__dict__.update(attrs)
