"""Deterministic N-episode re-evaluation of a saved agent checkpoint.

Makes every committed north-star number one-command reproducible (VERDICT r3
#8): point it at a results/work dir holding the run's composed ``config.yaml``
plus the agent checkpoint (``sac.pkl`` for MBPO, ``model.pkl`` for PETS
planners) and it rebuilds the env + agent through the same public factories
the training run used (``planning.load_agent``; reference analogue
``mbrl/planning/core.py:126-157``) and rolls deterministic episodes.

Usage: python scripts/eval_agent.py <results_dir> [episodes] [seed]
"""
from __future__ import annotations

import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
os.environ.setdefault("MUJOCO_GL", "egl")

import jax

if os.environ.get("MBRL_TPU_PLATFORM"):
    # site customization pins the tunneled TPU; CPU re-evals override in-process
    jax.config.update("jax_platforms", os.environ["MBRL_TPU_PLATFORM"])

import numpy as np
import yaml


def main() -> None:
    if len(sys.argv) < 2:
        sys.exit(__doc__)
    run_dir = pathlib.Path(sys.argv[1])
    episodes = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    seed = int(sys.argv[3]) if len(sys.argv) > 3 else 0

    from mbrl_tpu.config import Config
    from mbrl_tpu.planning.core import load_agent
    from mbrl_tpu.util.env import create_handler

    with open(run_dir / "config.yaml") as f:
        cfg = Config(yaml.safe_load(f))
    env, *_ = create_handler(cfg).make_env(cfg)
    agent = load_agent(run_dir, env)

    # episode cap: trial_length when the config has one, else a LAST-RESORT
    # hard cap — some envs (the no-TimeLimit halfcheetah variants) never
    # terminate on their own and the while-loop would not exit (ADVICE r4).
    # Deliberately NOT epoch_length: MBPO configs carry epoch_length=250 while
    # their gym envs have a 1000-step TimeLimit, and capping early would change
    # the committed re-eval numbers (e.g. InvertedPendulum 1000.0).
    trial_length = int(cfg.overrides.get("trial_length", 0) or 0) or 10_000
    returns = []
    for ep in range(episodes):
        obs, _ = env.reset(seed=seed + ep)
        if hasattr(agent, "reset"):
            agent.reset()
        done = False
        total, steps = 0.0, 0
        while not done:
            action = agent.act(obs, sample=False)
            obs, reward, terminated, truncated, _ = env.step(np.asarray(action))
            total += float(reward)
            steps += 1
            done = terminated or truncated or (
                trial_length and steps >= trial_length
            )
        returns.append(total)
        print(f"episode {ep}: return {total:.1f} ({steps} steps)", flush=True)
    returns = np.asarray(returns)
    print(
        f"RESULT dir={run_dir} episodes={episodes} seed={seed} "
        f"mean={returns.mean():.1f} std={returns.std():.1f} "
        f"min={returns.min():.1f} max={returns.max():.1f}"
    )


if __name__ == "__main__":
    main()
