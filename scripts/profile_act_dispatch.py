"""Break down the single-env MPC act() wall (VERDICT r3 weak #4 / next #5).

The amortized planner does ~372 plans/s but a real single-env PETS loop pays
per-dispatch costs every step. This script separates, on the real chip:

  1. pure program run time        — donated-args jitted CEM plan, device-timed
                                    via repeated block_until_ready batches
  2. +host obs upload             — fresh numpy obs each call
  3. +action readback             — np.asarray of the chosen action
  4. full agent.act()             — TrajectoryOptimizerAgent bookkeeping
  5. closed-loop driver           — K steps fused in ONE program (the ceiling)

The residual (4)-(1) is the host/tunnel dispatch tax; if (1) ~= (4) the wall
is the program itself and batched collection (act_batch) is the only lever.

Usage: python scripts/profile_act_dispatch.py [n_iters]
Writes a markdown breakdown to results/dispatch_breakdown.md.
"""
from __future__ import annotations

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from mbrl_tpu.util.backend import wait_for_backend

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import bench as B  # reuse the bench model/config (HalfCheetah shapes)


def timed(fn, n, warmup=2):
    for _ in range(warmup):
        fn()
    t0 = time.perf_counter()
    for _ in range(n):
        fn()
    return (time.perf_counter() - t0) / n


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    wait_for_backend()
    dev = jax.devices()[0]
    print("device:", dev.device_kind)

    from mbrl_tpu.planning import (
        CEMOptimizer,
        ClosedLoopDriver,
        TrajectoryOptimizerAgent,
        create_trajectory_optim_agent_for_model,
    )

    env, state, _, obs0 = B._build_env()
    cem = CEMOptimizer(
        5, 0.1, B.POPULATION,
        np.tile([-1.0] * B.ACT_DIM, (B.HORIZON, 1)).tolist(),
        np.tile([1.0] * B.ACT_DIM, (B.HORIZON, 1)).tolist(),
        alpha=0.1, return_mean_elites=True,
    )
    agent = TrajectoryOptimizerAgent(
        cem, action_lb=[-1.0] * B.ACT_DIM, action_ub=[1.0] * B.ACT_DIM,
        planning_horizon=B.HORIZON, replan_freq=1,
    )
    agent = create_trajectory_optim_agent_for_model(
        env, agent, num_particles=B.PARTICLES
    )
    agent.set_eval_state(state)

    rows = []

    # (1) pure program: optimize with device-resident obs, no readback
    import jax.numpy as jnp

    obs_dev = jax.device_put(jnp.zeros(B.OBS_DIM, jnp.float32))
    key = jax.random.PRNGKey(0)

    def obj(population, st, obs, k):
        return env._evaluate_impl(st, population, obs, k, num_particles=B.PARTICLES)

    x0 = jnp.zeros((B.HORIZON, B.ACT_DIM))
    k_holder = {"k": key}

    def pure_program():
        k_holder["k"], k1, k2 = jax.random.split(k_holder["k"], 3)
        sol, _ = cem.optimize(obj, x0, k1, obj_args=(state, obs_dev, k2))
        jax.block_until_ready(sol)

    t1 = timed(pure_program, n)
    rows.append(("pure jitted CEM program (device obs, no readback)", t1))

    # (2) + host obs upload each call
    def with_upload():
        k_holder["k"], k1, k2 = jax.random.split(k_holder["k"], 3)
        fresh = jnp.asarray(np.random.randn(B.OBS_DIM).astype(np.float32))
        sol, _ = cem.optimize(obj, x0, k1, obj_args=(state, fresh, k2))
        jax.block_until_ready(sol)

    t2 = timed(with_upload, n)
    rows.append(("+ fresh host obs upload", t2))

    # (3) + action readback to numpy
    def with_readback():
        k_holder["k"], k1, k2 = jax.random.split(k_holder["k"], 3)
        fresh = jnp.asarray(np.random.randn(B.OBS_DIM).astype(np.float32))
        sol, _ = cem.optimize(obj, x0, k1, obj_args=(state, fresh, k2))
        np.asarray(sol)

    t3 = timed(with_readback, n)
    rows.append(("+ action readback (np.asarray)", t3))

    # (4) the real public path
    obs_np = np.zeros(B.OBS_DIM, np.float32)

    def full_act():
        agent.act(obs_np)

    t4 = timed(full_act, n)
    rows.append(("full TrajectoryOptimizerAgent.act()", t4))

    # (5) fused closed loop (amortized ceiling)
    driver = ClosedLoopDriver(
        env, cem, horizon=B.HORIZON, act_dim=B.ACT_DIM, num_particles=B.PARTICLES
    )
    K = 16

    def fused():
        jax.block_until_ready(
            driver.run(state, obs0, jax.random.fold_in(key, 1), num_steps=K)
        )

    t5 = timed(fused, 3) / K
    rows.append(("fused closed-loop driver (per step, K=16)", t5))

    lines = [
        "# Single-env MPC dispatch breakdown",
        "",
        f"device: {dev.device_kind} | config: {B.POPULATION}x{B.PARTICLES}p "
        f"h{B.HORIZON} | n={n}",
        "",
        "| stage | ms/plan | plans/s |",
        "|---|---|---|",
    ]
    for name, t in rows:
        lines.append(f"| {name} | {t * 1e3:.2f} | {1.0 / t:.1f} |")
    lines += [
        "",
        f"dispatch tax (full act - pure program): {(t4 - t1) * 1e3:.2f} ms",
        f"host transfer tax (upload+readback): {(t3 - t1) * 1e3:.2f} ms",
    ]
    out = REPO / "results" / "dispatch_breakdown.md"
    out.write_text("\n".join(lines) + "\n")
    print("\n".join(lines))
    print(f"\nwrote {out}")


if __name__ == "__main__":
    main()
