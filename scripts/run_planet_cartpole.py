"""PlaNet parity run: dm_control cartpole-balance from pixels (reference
``conf/overrides/planet_cartpole_balance.yaml`` + ``mbrl/algorithms/planet.py``),
on the real TPU chip, with a FIXED work dir and episode-granular
checkpoint/resume so the session can run in bounded chunks across restarts.

Usage:  python scripts/run_planet_cartpole.py [extra k=v overrides ...]
"""
from __future__ import annotations

import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
os.environ.setdefault("MUJOCO_GL", "egl")

import time

import jax
import numpy as np
import yaml

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
if os.environ.get("MBRL_TPU_PLATFORM"):
    # the site customization pins JAX_PLATFORMS=axon; CPU smoke runs must
    # override inside Python
    jax.config.update("jax_platforms", os.environ["MBRL_TPU_PLATFORM"])

import mbrl_tpu.algorithms.planet as planet
from mbrl_tpu.config import load_config, to_dict
from mbrl_tpu.util.backend import wait_for_backend
from mbrl_tpu.util.env import create_handler

REPO = pathlib.Path(__file__).resolve().parent.parent
WORK_DIR = REPO / "exp" / os.environ.get("PLANET_WORK_DIR", "planet_cartpole_northstar")


def main() -> None:
    overrides = [
        "algorithm=planet",
        "dynamics_model=planet",
        "overrides=planet_cartpole_balance",
        "debug_mode=false",
        "checkpoint_every=1",
        "resume=true",
        "seed=0",
    ] + sys.argv[1:]
    cfg = load_config(REPO / "mbrl_tpu" / "examples" / "conf", "main", overrides=overrides)

    wait_for_backend()
    handler = create_handler(cfg)
    env, *_ = handler.make_env(cfg)
    np.random.seed(cfg.seed)

    WORK_DIR.mkdir(parents=True, exist_ok=True)
    with open(WORK_DIR / "config.yaml", "w") as f:
        yaml.safe_dump(to_dict(cfg), f)

    avg = planet.train(env, cfg, work_dir=str(WORK_DIR))
    print(f"DONE avg_reward={avg}")


if __name__ == "__main__":
    main()
