"""One-claim TPU session for round 4's chip work, in value order:

  1. bench     — every bench measurement IN-PROCESS (one chip claim), results
                 persisted into .bench_state.json so any later bench.py run
                 (including the driver's end-of-round one) reports fresh
                 on-hardware numbers even if the pool dies again
  2. dispatch  — the single-env MPC dispatch breakdown
                 (scripts/profile_act_dispatch.py -> results/dispatch_breakdown.md)
  3. mesh      — `parallel=mesh` PETS cartpole on the real backend (1-chip
                 mesh): proves the config path compiles on hardware
  4. planet    — PlaNet cartpole-balance north star, resumed in EPISODE CHUNKS
                 (clean stop at the timebox; checkpoint/resume between chunks)
  5. pets_hc   — PETS HalfCheetah parity run in step chunks until the deadline

The axon relay releases a dead client's claim only after a long server-side
timeout, so this wrapper claims ONCE (wait_for_backend) and runs phases
sequentially in-process; each phase is fenced.

Usage: python scripts/r4_chip_session.py [phase ...]
Env:   R4_SESSION_MINUTES (default 300) — total budget from claim
       R4_PETS_MINUTES    (default 90)  — reserved for pets_hc at the tail
       MBRL_TPU_WAIT_MINUTES            — backend wait budget
"""
from __future__ import annotations

import contextlib
import io
import json
import os
import pathlib
import sys
import time
import traceback

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
os.environ.setdefault("MUJOCO_GL", "egl")

import jax
import numpy as np
import yaml

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

REPO = pathlib.Path(__file__).resolve().parent.parent
SESSION_MINUTES = float(os.environ.get("R4_SESSION_MINUTES", "300"))
PETS_MINUTES = float(os.environ.get("R4_PETS_MINUTES", "90"))
DEADLINE = [0.0]  # set after the claim


def remaining() -> float:
    return DEADLINE[0] - time.time()


def phase_bench() -> None:
    import bench as B

    for fn in (
        B._dispatch_child,
        B._cem_child,
        B._amortized_child,
        B._agent_act_child,
        B._pallas_child,
        B._closed_loop_child,
    ):
        if remaining() < 120:
            print("bench: out of time, stopping early", flush=True)
            break
        buf = io.StringIO()
        try:
            with contextlib.redirect_stdout(buf):
                fn()
        except Exception:
            print(f"bench piece {fn.__name__} failed:", flush=True)
            traceback.print_exc()
        state = B._load_state()
        for line in buf.getvalue().splitlines():
            try:
                state.update(json.loads(line))
            except json.JSONDecodeError:
                continue
        state["ts_session"] = time.strftime("%Y-%m-%dT%H:%M:%S")
        B._save_state(state)
        print(f"bench {fn.__name__}: {buf.getvalue().strip()}", flush=True)
    # device kind for the roofline
    import bench as B2

    state = B2._load_state()
    state["device_kind"] = jax.devices()[0].device_kind
    B2._save_state(state)


def phase_dispatch() -> None:
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "profile_act_dispatch", REPO / "scripts" / "profile_act_dispatch.py"
    )
    mod = importlib.util.module_from_spec(spec)
    saved, sys.argv = sys.argv, ["profile_act_dispatch.py", "12"]
    try:
        spec.loader.exec_module(mod)
        mod.main()
    finally:
        sys.argv = saved


def phase_mesh() -> None:
    import mbrl_tpu.algorithms.pets as pets
    from mbrl_tpu.config import load_config, to_dict
    from mbrl_tpu.util.env import create_handler

    work_dir = REPO / "exp" / "pets_mesh_r4"
    cfg = load_config(
        REPO / "mbrl_tpu" / "examples" / "conf",
        "main",
        overrides=[
            "algorithm=pets",
            "overrides=pets_cartpole",
            "parallel=mesh",
            "overrides.num_steps=1000",
            "debug_mode=false",
            "seed=0",
        ],
    )
    env, term_fn, reward_fn = create_handler(cfg).make_env(cfg)
    np.random.seed(cfg.seed)
    work_dir.mkdir(parents=True, exist_ok=True)
    with open(work_dir / "config.yaml", "w") as f:
        yaml.safe_dump(to_dict(cfg), f)
    best = pets.train(env, term_fn, reward_fn, cfg, work_dir=str(work_dir))
    print(f"mesh smoke best episode reward: {float(best)}", flush=True)
    # commit-able evidence
    dst = REPO / "results" / "pets" / "mesh_r4"
    dst.mkdir(parents=True, exist_ok=True)
    for name in ("results.csv", "model_train.csv", "config.yaml"):
        src = work_dir / name
        if src.exists():
            dst.joinpath(name).write_bytes(src.read_bytes())


def phase_planet() -> None:
    import mbrl_tpu.algorithms.planet as planet
    from mbrl_tpu.config import load_config, to_dict
    from mbrl_tpu.util.env import create_handler

    budget = remaining() - PETS_MINUTES * 60
    if budget < 600:
        print("planet: not enough budget, skipping", flush=True)
        return
    stop_at = time.time() + budget
    work_dir = REPO / "exp" / "planet_r3_northstar"  # continue the r3 session
    work_dir.mkdir(parents=True, exist_ok=True)
    chunk = 5
    import mbrl_tpu.util.checkpoint as ckpt

    while time.time() < stop_at:
        latest = ckpt.latest_checkpoint(str(work_dir))
        done = 0
        if latest is not None:
            try:
                # checkpoints store the NEXT episode index ("episode": ep+1)
                done = int(ckpt.restore_checkpoint(latest)["episode"])
            except Exception:
                done = 0
        target = done + chunk
        cfg = load_config(
            REPO / "mbrl_tpu" / "examples" / "conf",
            "main",
            overrides=[
                "algorithm=planet",
                "dynamics_model=planet",
                "overrides=planet_cartpole_balance",
                f"algorithm.num_episodes={target}",
                "checkpoint_every=1",
                "resume=true",
                "seed=0",
            ],
        )
        env, *_ = create_handler(cfg).make_env(cfg)
        with open(work_dir / "config.yaml", "w") as f:
            yaml.safe_dump(to_dict(cfg), f)
        print(f"planet chunk -> episode {target} "
              f"({remaining()/60:.0f} min left)", flush=True)
        planet.train(env, cfg, work_dir=str(work_dir))
    print("planet phase done", flush=True)


def phase_pets_hc() -> None:
    import mbrl_tpu.algorithms.pets as pets
    import mbrl_tpu.util.checkpoint as ckpt
    from mbrl_tpu.config import load_config, to_dict
    from mbrl_tpu.util.env import create_handler

    work_dir = REPO / "exp" / "pets_halfcheetah_northstar"
    work_dir.mkdir(parents=True, exist_ok=True)
    chunk_steps = 3000
    stop_at = time.time() + min(remaining() - 300, PETS_MINUTES * 60)
    while time.time() < stop_at:
        latest = ckpt.latest_checkpoint(str(work_dir))
        done = 0
        if latest is not None:
            try:
                done = int(ckpt.restore_checkpoint(latest)["env_steps"])
            except Exception:
                done = 0
        cfg = load_config(
            REPO / "mbrl_tpu" / "examples" / "conf",
            "main",
            overrides=[
                "algorithm=pets",
                "overrides=pets_halfcheetah",
                f"overrides.num_steps={done + chunk_steps}",
                "checkpoint_every=1000",
                "resume=true",
                "debug_mode=false",
                "seed=0",
            ],
        )
        env, term_fn, reward_fn = create_handler(cfg).make_env(cfg)
        np.random.seed(cfg.seed)
        with open(work_dir / "config.yaml", "w") as f:
            yaml.safe_dump(to_dict(cfg), f)
        print(f"pets_hc chunk -> step {done + chunk_steps} "
              f"({remaining()/60:.0f} min left)", flush=True)
        best = pets.train(env, term_fn, reward_fn, cfg, work_dir=str(work_dir))
        print(f"pets_hc chunk done, best={float(best)}", flush=True)
    print("pets_hc phase done", flush=True)


def phase_mbpo_hopper() -> None:
    """Continue the CPU-started hopper run on the chip (shared work dir +
    checkpoints: exp/mbpo_hopper_northstar), in step chunks."""
    import mbrl_tpu.algorithms.mbpo as mbpo
    import mbrl_tpu.util.checkpoint as ckpt
    from mbrl_tpu.config import load_config, to_dict
    from mbrl_tpu.util.env import create_handler

    work_dir = REPO / "exp" / "mbpo_hopper_northstar"
    work_dir.mkdir(parents=True, exist_ok=True)
    chunk_steps = 5000
    while remaining() > 300:
        latest = ckpt.latest_checkpoint(str(work_dir))
        done = 0
        if latest is not None:
            try:
                done = int(ckpt.restore_checkpoint(latest)["env_steps"])
            except Exception:
                done = 0
        cfg = load_config(
            REPO / "mbrl_tpu" / "examples" / "conf",
            "main",
            overrides=[
                "algorithm=mbpo",
                "overrides=mbpo_hopper",
                f"overrides.num_steps={done + chunk_steps}",
                "checkpoint_every=1000",
                "resume=true",
                "debug_mode=true",
                "seed=0",
            ],
        )
        env, term_fn, _ = create_handler(cfg).make_env(cfg)
        test_env, *_ = create_handler(cfg).make_env(cfg)
        np.random.seed(cfg.seed)
        with open(work_dir / "config.yaml", "w") as f:
            yaml.safe_dump(to_dict(cfg), f)
        print(f"mbpo_hopper chunk -> step {done + chunk_steps} "
              f"({remaining()/60:.0f} min left)", flush=True)
        best = mbpo.train(env, test_env, term_fn, cfg, work_dir=str(work_dir))
        print(f"mbpo_hopper chunk done, best={float(best)}", flush=True)
    print("mbpo_hopper phase done", flush=True)


PHASES = {
    "bench": phase_bench,
    "dispatch": phase_dispatch,
    "mesh": phase_mesh,
    "planet": phase_planet,
    "pets_hc": phase_pets_hc,
    "mbpo_hopper": phase_mbpo_hopper,
}


def main() -> None:
    from mbrl_tpu.util.backend import wait_for_backend

    names = [a for a in sys.argv[1:] if a in PHASES] or list(PHASES)
    print(f"r4 chip session: phases {names}", flush=True)
    wait_for_backend()
    DEADLINE[0] = time.time() + SESSION_MINUTES * 60
    print(f"claimed {jax.devices()} at {time.strftime('%H:%M:%S')}; "
          f"budget {SESSION_MINUTES:.0f} min", flush=True)
    for name in names:
        print(f"=== phase {name} ({remaining()/60:.0f} min left)", flush=True)
        try:
            PHASES[name]()
        except Exception:
            print(f"phase {name} failed:", flush=True)
            traceback.print_exc()
    print(f"r4 chip session end {time.strftime('%H:%M:%S')}", flush=True)


if __name__ == "__main__":
    main()
