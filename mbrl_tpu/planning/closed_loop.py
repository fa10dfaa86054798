"""On-device closed-loop MPC driver: plan -> act -> model-step, all in ONE program.

A real PETS control loop calls one plan per env step; when the environment is a
host process, every step pays a device round trip for the action (hundreds of ms
over a remote-device link — the dispatch wall BENCH_r01 measured at ~7.5
plans/s). For simulated / parity workloads the "real" environment can itself be
a model (or any jittable dynamics), so the WHOLE control loop — full CEM/iCEM/
MPPI optimization, first-action extraction with warm-started solution shifting,
surrogate env step, reward bookkeeping — scans on device and the host fetches
only the final trajectory. This is the speed-of-light MPC configuration
(reference control loop: mbrl/algorithms/pets.py:97-145 +
planning/trajectory_opt.py:655-716, one host round trip per step).

Also usable as a fast evaluation harness: rolling the planner in the learned
model measures planner quality without a simulator in the loop.
"""
from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp


class ClosedLoopDriver:
    """Runs K MPC steps (plan with ``optimizer`` over ``plan_env``, step
    ``act_env``) as one jitted program.

    plan_env / act_env are ModelEnv-like; they may be the same object (plan and
    act in the same learned model) or different (e.g. plan in a small model,
    act in a bigger "ground-truth" surrogate). Actions warm-start from the
    previous solution shifted by one step (reference trajectory_opt.py:563-567).
    """

    def __init__(
        self,
        plan_env,
        optimizer,
        horizon: int,
        act_dim: int,
        num_particles: int,
        act_env=None,
        sample_env_step: bool = True,
    ):
        self.plan_env = plan_env
        self.act_env = act_env if act_env is not None else plan_env
        self.optimizer = optimizer
        self.horizon = horizon
        self.act_dim = act_dim
        self.num_particles = num_particles
        self.sample_env_step = sample_env_step
        self._run = jax.jit(self._run_impl, static_argnames=("num_steps",))

    def _plan(self, state, obs, x0, opt_state, key):
        k_opt, k_obj = jax.random.split(key)

        def obj(population, st, o, k):
            return self.plan_env._evaluate_impl(
                st, population, o, k, num_particles=self.num_particles
            )

        # uniform traced protocol (solution, new_opt_state): CEM is stateless,
        # iCEM threads its kept-elite set, MPPI its persistent shifted mean
        return self.optimizer.optimize_traced(
            obj, x0, k_opt, opt_state, obj_args=(state, obs, k_obj)
        )

    def _run_impl(
        self,
        plan_state: Dict[str, Any],
        act_state: Dict[str, Any],
        obs0: jax.Array,  # (D,)
        key: jax.Array,
        num_steps: int,
    ):
        # the surrogate env steps a tiny batch; pad rows to the ensemble's
        # equal-shard requirement and read row 0
        model = getattr(self.act_env.dynamics_model, "model", None)
        n_rows = 1
        if model is not None and getattr(model, "ensemble_size", 1) > 1:
            params = act_state["params"]
            n_rows = (
                int(params["elite"].shape[0]) if "elite" in params
                else model.ensemble_size
            )

        key, k_reset = jax.random.split(key)
        obs_rows = jnp.broadcast_to(obs0, (n_rows,) + obs0.shape).astype(jnp.float32)
        env_state = self.act_env.reset(act_state, obs_rows, k_reset)

        def step(carry, _):
            obs_rows, env_state, prev_sol, opt_state, key = carry
            key, k_plan, k_step = jax.random.split(key, 3)
            # warm start: shift the previous solution left one step, zero tail.
            # (MPPI ignores x0 — it shifts its own persistent mean inside
            # optimize_traced, so there is no double shift.)
            x0 = jnp.concatenate(
                [prev_sol[1:], jnp.zeros((1, self.act_dim), prev_sol.dtype)]
            )
            sol, opt_state = self._plan(
                plan_state, obs_rows[0], x0, opt_state, k_plan
            )
            action = jnp.broadcast_to(sol[0], (n_rows, self.act_dim))
            next_obs, rewards, terminated, env_state = self.act_env._step_impl(
                act_state, action, env_state, k_step, sample=self.sample_env_step
            )
            out = (
                obs_rows[0],
                sol[0],
                jnp.reshape(rewards, (-1,))[0],
                jnp.reshape(terminated, (-1,))[0],
            )
            return (next_obs, env_state, sol, opt_state, key), out

        init = (
            obs_rows,
            env_state,
            jnp.zeros((self.horizon, self.act_dim), jnp.float32),
            self.optimizer.init_state(),
            key,
        )
        _, (obs_traj, actions, rewards, terminateds) = jax.lax.scan(
            step, init, None, length=num_steps
        )
        return obs_traj, actions, rewards, terminateds

    def run(
        self,
        plan_state: Dict[str, Any],
        obs0,
        key,
        num_steps: int,
        act_state: Optional[Dict[str, Any]] = None,
    ) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
        """K closed-loop MPC steps; returns (obs_traj, actions, rewards,
        terminateds), each with leading axis num_steps. ONE device dispatch."""
        if act_state is None:
            act_state = plan_state
        return self._run(
            plan_state, act_state, jnp.asarray(obs0, jnp.float32), key,
            num_steps=num_steps,
        )
