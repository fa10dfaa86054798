"""Second MBPO parity point: gym Hopper-v5 (reference
``mbrl/examples/conf/overrides/mbpo_hopper.yaml`` +
``mbrl/algorithms/mbpo.py:116-301``), on the real TPU chip.

Unlike the HalfCheetah north star this run exercises a real termination_fn
(hopper falls end episodes), so the imagined-rollout termination masking and
the SAC bootstrap mask see non-trivial ``done`` signals (VERDICT r3 #6).

Fixed work dir + full-state checkpoints every ``checkpoint_every`` steps, so
the run resumes across session restarts.

Usage:  python scripts/run_mbpo_hopper.py [extra k=v overrides ...]
"""
from __future__ import annotations

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import numpy as np
import yaml

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import os

if os.environ.get("MBRL_TPU_PLATFORM"):
    # site customization pins the tunneled TPU; CPU runs override in-process
    jax.config.update("jax_platforms", os.environ["MBRL_TPU_PLATFORM"])

from mbrl_tpu.util.backend import wait_for_backend
import mbrl_tpu.algorithms.mbpo as mbpo
from mbrl_tpu.config import load_config, to_dict
from mbrl_tpu.util.env import create_handler

REPO = pathlib.Path(__file__).resolve().parent.parent
# seed-variance runs (VERDICT r4 weak #5) point this at a per-seed work dir
WORK_DIR = pathlib.Path(
    os.environ.get("MBPO_HOPPER_WORK_DIR", REPO / "exp" / "mbpo_hopper_northstar")
)


def main() -> None:
    overrides = [
        "algorithm=mbpo",
        "overrides=mbpo_hopper",
        "debug_mode=true",
        "checkpoint_every=1000",
        "resume=true",
        "seed=0",
    ] + sys.argv[1:]
    cfg = load_config(REPO / "mbrl_tpu" / "examples" / "conf", "main", overrides=overrides)

    wait_for_backend()
    handler = create_handler(cfg)
    env, term_fn, _ = handler.make_env(cfg)
    test_env, *_ = create_handler(cfg).make_env(cfg)
    np.random.seed(cfg.seed)

    WORK_DIR.mkdir(parents=True, exist_ok=True)
    with open(WORK_DIR / "config.yaml", "w") as f:
        yaml.safe_dump(to_dict(cfg), f)

    best = mbpo.train(env, test_env, term_fn, cfg, work_dir=str(WORK_DIR))
    print(f"DONE best_eval_reward={best}")


if __name__ == "__main__":
    main()
