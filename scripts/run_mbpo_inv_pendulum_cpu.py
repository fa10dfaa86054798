"""MBPO InvertedPendulum-v5 at the reference config, on host CPU — chip-free
evidence that the full MBPO stack (ensemble retraining, imagined rollouts into
the device SAC buffer, scanned SAC updates) learns a real mujoco benchmark.
Reference: mbrl/examples/conf/overrides/mbpo_inv_pendulum.yaml (20k steps).

Usage: python scripts/run_mbpo_inv_pendulum_cpu.py [extra overrides...]
"""
from __future__ import annotations

import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import numpy as np
import yaml

import mbrl_tpu.algorithms.mbpo as mbpo
from mbrl_tpu.config import load_config, to_dict
from mbrl_tpu.util.env import create_handler

REPO = pathlib.Path(__file__).resolve().parent.parent
# seed-variance runs (VERDICT r4 #10) point this at a per-seed work dir
WORK_DIR = pathlib.Path(
    os.environ.get("MBPO_INVPEND_WORK_DIR", REPO / "exp" / "mbpo_inv_pendulum_cpu")
)


def main() -> None:
    overrides = [
        "algorithm=mbpo",
        "overrides=mbpo_inv_pendulum",
        "debug_mode=false",
        "checkpoint_every=1000",
        "resume=true",
        "seed=0",
    ] + sys.argv[1:]
    cfg = load_config(REPO / "mbrl_tpu" / "examples" / "conf", "main", overrides=overrides)
    env, term_fn, _ = create_handler(cfg).make_env(cfg)
    test_env, *_ = create_handler(cfg).make_env(cfg)
    np.random.seed(cfg.seed)
    WORK_DIR.mkdir(parents=True, exist_ok=True)
    with open(WORK_DIR / "config.yaml", "w") as f:
        yaml.safe_dump(to_dict(cfg), f)
    best = mbpo.train(env, test_env, term_fn, cfg, work_dir=str(WORK_DIR))
    print(f"DONE best_eval_reward={best}")


if __name__ == "__main__":
    main()
