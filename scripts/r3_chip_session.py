"""One-claim TPU session for the round's remaining chip work: PETS-HalfCheetah
parity chunk, then the rollout variant profile. The axon relay releases a dead
client's chip claim only after a long server-side timeout, so every extra
process restart costs 10-30 min of grant latency — this wrapper claims once
and runs the phases sequentially, each fenced so one failure doesn't lose the
session.

Usage: python scripts/r3_chip_session.py [pets_minutes]
"""
from __future__ import annotations

import os
import pathlib
import sys
import threading
import time
import traceback

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
os.environ.setdefault("MUJOCO_GL", "egl")

import jax
import numpy as np
import yaml

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

REPO = pathlib.Path(__file__).resolve().parent.parent
PETS_MINUTES = float(sys.argv[1]) if len(sys.argv) > 1 else 75.0


def phase_pets() -> None:
    import mbrl_tpu.algorithms.pets as pets
    from mbrl_tpu.config import load_config, to_dict
    from mbrl_tpu.util.env import create_handler

    work_dir = REPO / "exp" / "pets_halfcheetah_northstar"
    overrides = [
        "algorithm=pets",
        "overrides=pets_halfcheetah",
        "debug_mode=false",
        "checkpoint_every=1000",
        "resume=true",
        "seed=0",
    ]
    cfg = load_config(REPO / "mbrl_tpu" / "examples" / "conf", "main",
                      overrides=overrides)
    handler = create_handler(cfg)
    env, term_fn, reward_fn = handler.make_env(cfg)
    np.random.seed(cfg.seed)
    work_dir.mkdir(parents=True, exist_ok=True)
    with open(work_dir / "config.yaml", "w") as f:
        yaml.safe_dump(to_dict(cfg), f)

    # time-box: run in a worker thread; the loop checkpoints every 1000 env
    # steps, so letting the process exit at the deadline only loses the tail
    done = threading.Event()

    def run():
        try:
            best = pets.train(env, term_fn, reward_fn, cfg, work_dir=str(work_dir))
            print(f"PETS DONE max_episode_reward={best}", flush=True)
        except Exception:
            traceback.print_exc()
        finally:
            done.set()

    t = threading.Thread(target=run, daemon=True)
    t.start()
    done.wait(timeout=PETS_MINUTES * 60)
    if not done.is_set():
        print(f"PETS time box ({PETS_MINUTES} min) reached; proceeding "
              "(checkpoints cover progress)", flush=True)


def phase_profile() -> None:
    # in-process (same chip claim): run the rollout variant matrix directly
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "profile_rollout", REPO / "scripts" / "profile_rollout.py"
    )
    pr = importlib.util.module_from_spec(spec)
    saved_argv, sys.argv = sys.argv, ["profile_rollout.py", "SKIPMAIN"]
    try:
        spec.loader.exec_module(pr)
    finally:
        sys.argv = saved_argv
    key = jax.random.PRNGKey(1)
    pr.measure("A_einsum_threefry", *pr.build(), key)
    pr.measure("B_einsum_nosample", *pr.build(deterministic=True), key)
    env, state, seqs, obs0 = pr.build()
    pr.measure("C_einsum_rbg", env, state, seqs, obs0, jax.random.key(1, impl="rbg"))
    pr.measure("D_pallas_f32", *pr.build(use_pallas=True), key)
    pr.measure(
        "E_pallas_bf16", *pr.build(use_pallas=True, compute_dtype="bfloat16"), key
    )
    pr.measure("F_einsum_bf16", *pr.build(compute_dtype="bfloat16"), key)


def main() -> None:
    print(f"chip session start {time.strftime('%H:%M:%S')}", flush=True)
    print("devices:", jax.devices(), flush=True)
    for name, fn in [("pets", phase_pets), ("profile", phase_profile)]:
        try:
            fn()
        except Exception:
            print(f"phase {name} failed:", flush=True)
            traceback.print_exc()
    print(f"chip session end {time.strftime('%H:%M:%S')}", flush=True)


if __name__ == "__main__":
    main()
