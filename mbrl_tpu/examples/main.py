"""CLI entry point.

Capability parity with the reference ``mbrl/examples/main.py:16-31``:
``python -m mbrl_tpu.examples.main algorithm=pets overrides=pets_cartpole [k=v ...]``
composes the YAML config tree, creates the env + termination/reward fns, and
dispatches to the chosen algorithm. Results go to a timestamped run dir
(``<root_dir>/<algorithm>/<experiment>/<env>/<date>/<time>``), where the composed
config is saved as ``config.yaml`` for reconstruction by diagnostics.
"""
from __future__ import annotations

import datetime
import pathlib
import sys

import numpy as np
import yaml

from mbrl_tpu.config import load_config, to_dict
from mbrl_tpu.util.env import EnvHandler, create_handler

_CONF_DIR = pathlib.Path(__file__).parent / "conf"


def run(cfg) -> float:
    import mbrl_tpu.algorithms.pets as pets

    handler = create_handler(cfg)
    env, term_fn, reward_fn = handler.make_env(cfg)

    np.random.seed(cfg.seed)

    # run dir + config snapshot (diagnostics reload from here)
    now = datetime.datetime.now()
    work_dir = (
        pathlib.Path(cfg.root_dir)
        / cfg.algorithm.name
        / str(cfg.experiment)
        / str(cfg.overrides.env).replace("___", "-")
        / now.strftime("%Y.%m.%d")
        / now.strftime("%H%M%S")
    )
    work_dir.mkdir(parents=True, exist_ok=True)
    with open(work_dir / "config.yaml", "w") as f:
        yaml.safe_dump(to_dict(cfg), f)

    if cfg.algorithm.name == "pets":
        return float(
            pets.train(env, term_fn, reward_fn, cfg, work_dir=str(work_dir))
        )
    if cfg.algorithm.name == "mbpo":
        import mbrl_tpu.algorithms.mbpo as mbpo

        test_env, *_ = create_handler(cfg).make_env(cfg)
        return float(
            mbpo.train(env, test_env, term_fn, cfg, work_dir=str(work_dir))
        )
    if cfg.algorithm.name == "planet":
        import mbrl_tpu.algorithms.planet as planet

        return float(planet.train(env, cfg, work_dir=str(work_dir)))
    raise ValueError(f"Unknown algorithm {cfg.algorithm.name!r}")


def main() -> None:
    # multi-host: joins the JAX process group iff MBRL_TPU_COORDINATOR /
    # _NUM_PROCESSES / _PROCESS_ID are set (no-op on a single host) — must
    # happen before any device use
    from mbrl_tpu.parallel.multihost import maybe_initialize_distributed

    maybe_initialize_distributed()
    overrides = sys.argv[1:]
    cfg = load_config(_CONF_DIR, "main", overrides=overrides)
    run(cfg)


if __name__ == "__main__":
    main()
