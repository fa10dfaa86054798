"""PETS parity run: mujoco HalfCheetah with the reference's tuned config
(``conf/overrides/pets_halfcheetah.yaml`` — 300k steps, CEM pop 400 x 5 iters,
horizon 30, E=7/5-elite 4x200 model, obs_process_fn + no_delta_list), on the
real TPU chip, with a FIXED work dir and checkpoint/resume so the session can
run in bounded chunks (reference loop: mbrl/algorithms/pets.py:24-145).

Usage:  python scripts/run_pets_halfcheetah.py [extra k=v overrides ...]
"""
from __future__ import annotations

import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
os.environ.setdefault("MUJOCO_GL", "egl")

import jax
import numpy as np
import yaml

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import os

if os.environ.get("MBRL_TPU_PLATFORM"):
    # site customization pins the tunneled TPU; CPU runs override in-process
    jax.config.update("jax_platforms", os.environ["MBRL_TPU_PLATFORM"])

from mbrl_tpu.util.backend import wait_for_backend
import mbrl_tpu.algorithms.pets as pets
from mbrl_tpu.config import load_config, to_dict
from mbrl_tpu.util.env import create_handler

REPO = pathlib.Path(__file__).resolve().parent.parent
WORK_DIR = REPO / "exp" / os.environ.get("PETS_WORK_DIR", "pets_halfcheetah_northstar")


def main() -> None:
    overrides = [
        "algorithm=pets",
        "overrides=pets_halfcheetah",
        "debug_mode=false",
        "checkpoint_every=1000",
        "resume=true",
        "seed=0",
    ] + sys.argv[1:]
    cfg = load_config(REPO / "mbrl_tpu" / "examples" / "conf", "main", overrides=overrides)

    wait_for_backend()
    handler = create_handler(cfg)
    env, term_fn, reward_fn = handler.make_env(cfg)
    np.random.seed(cfg.seed)

    WORK_DIR.mkdir(parents=True, exist_ok=True)
    with open(WORK_DIR / "config.yaml", "w") as f:
        yaml.safe_dump(to_dict(cfg), f)

    best = pets.train(env, term_fn, reward_fn, cfg, work_dir=str(WORK_DIR))
    print(f"DONE max_episode_reward={best}")


if __name__ == "__main__":
    main()
