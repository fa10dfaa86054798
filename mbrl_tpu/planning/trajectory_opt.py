"""Sampling-based trajectory optimizers (CEM, iCEM, MPPI) and the MPC agent.

Capability parity with the reference ``mbrl/planning/trajectory_opt.py``
(CEMOptimizer :43-188, MPPIOptimizer :191-311, ICEMOptimizer :314-487,
TrajectoryOptimizer :490-572, TrajectoryOptimizerAgent :575-716,
create_trajectory_optim_agent_for_model :719-749).

TPU re-design:
  - each optimizer's ``optimize`` is ONE jitted program — generations are a
    ``lax.scan`` (CEM/MPPI) or a statically-unrolled loop (iCEM, whose per-iteration
    population sizes are static Python ints, sidestepping the reference's dynamic
    shapes — SURVEY.md §7 "hard parts");
  - persistent optimizer state (iCEM's kept elites, MPPI's shifted mean) is an
    explicit pytree threaded through calls instead of object attributes, so the whole
    planner remains functionally pure and shardable;
  - the objective function is a static callable; per-call data (model state, current
    observation, PRNG key) flows through as traced arguments, so re-planning every
    env step reuses ONE compiled program;
  - randomness is explicit `jax.random` keys.
"""
from __future__ import annotations

import time
from typing import Any, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from mbrl_tpu.ops.math import powerlaw_psd_gaussian
from mbrl_tpu.planning.core import Agent


def _nan_guard(values: jax.Array) -> jax.Array:
    return jnp.where(jnp.isnan(values), -1e-10, values)


class Optimizer:
    """Base: maximize obj_fun(population, *obj_args) over sequences of shape (H, A).

    ``init_state()`` returns the persistent cross-call state pytree (may be ());
    ``optimize`` returns (best_solution, new_state).
    """

    def init_state(self):
        return ()

    def reset_state(self, opt_state):
        return self.init_state()

    def optimize(self, obj_fun, x0, key, opt_state=(), obj_args=(), callback=None):
        raise NotImplementedError

    def optimize_traced(self, obj_fun, x0, key, opt_state, obj_args):
        """Jit-composable uniform protocol: (solution, new_opt_state), no host
        dispatch — for callers embedding the optimizer inside their own scan
        (e.g. ClosedLoopDriver). Stateless optimizers return opt_state
        unchanged; MPPI reads its persistent mean from opt_state (x0 is only
        the cold-start fallback), matching its public ``optimize``."""
        raise NotImplementedError


def _host_callback(callback, population, values, iteration):
    """Per-iteration diagnostics callback (reference trajectory_opt.py:174-175):
    ``callback(population, values, iteration)`` with host-side arrays. Runs as an
    ordered debug callback so it composes with the scanned/jitted optimize."""
    jax.debug.callback(callback, population, values, iteration, ordered=True)


class CEMOptimizer(Optimizer):
    """CEM_PETS: truncated-normal (or clipped-normal) population around a running
    (mu, dispersion), top-k elites, momentum updates, best-ever or elite-mean return."""

    def __init__(
        self,
        num_iterations: int,
        elite_ratio: float,
        population_size: int,
        lower_bound: Sequence[Sequence[float]],
        upper_bound: Sequence[Sequence[float]],
        alpha: float,
        return_mean_elites: bool = False,
        clipped_normal: bool = False,
    ):
        self.num_iterations = num_iterations
        self.population_size = population_size
        self.elite_num = int(np.ceil(population_size * elite_ratio))
        self.lower_bound = jnp.asarray(lower_bound, jnp.float32)
        self.upper_bound = jnp.asarray(upper_bound, jnp.float32)
        self.alpha = alpha
        self.return_mean_elites = return_mean_elites
        self.clipped_normal = clipped_normal
        self._jit_opt = jax.jit(
            self._optimize_impl, static_argnames=("obj_fun", "callback")
        )

    def _sample(self, key, mu, dispersion):
        shape = (self.population_size,) + mu.shape
        if self.clipped_normal:
            pop = mu + dispersion * jax.random.normal(key, shape)
            return jnp.clip(pop, self.lower_bound, self.upper_bound)
        lb_dist = mu - self.lower_bound
        ub_dist = self.upper_bound - mu
        mv = jnp.minimum(jnp.square(lb_dist / 2), jnp.square(ub_dist / 2))
        constrained_var = jnp.minimum(mv, dispersion)
        noise = jax.random.truncated_normal(key, -2.0, 2.0, shape)
        return noise * jnp.sqrt(constrained_var) + mu

    def _optimize_impl(self, obj_fun, x0, key, obj_args, callback=None):
        init_dispersion = (
            jnp.ones_like(x0)
            if self.clipped_normal
            else jnp.square(self.upper_bound - self.lower_bound) / 16.0
        )

        def iteration(carry, i):
            mu, dispersion, best_sol, best_val, key = carry
            key, k_sample = jax.random.split(key)
            population = self._sample(k_sample, mu, dispersion)
            values = _nan_guard(obj_fun(population, *obj_args))
            if callback is not None:
                _host_callback(callback, population, values, i)
            elite_values, elite_idx = jax.lax.top_k(values, self.elite_num)
            elite = population[elite_idx]
            new_mu = elite.mean(axis=0)
            new_disp = (
                elite.std(axis=0) if self.clipped_normal else elite.var(axis=0)
            )
            mu = self.alpha * mu + (1 - self.alpha) * new_mu
            dispersion = self.alpha * dispersion + (1 - self.alpha) * new_disp
            improved = elite_values[0] > best_val
            best_sol = jnp.where(improved, population[elite_idx[0]], best_sol)
            best_val = jnp.maximum(best_val, elite_values[0])
            return (mu, dispersion, best_sol, best_val, key), None

        init = (x0, init_dispersion, x0, jnp.float32(-jnp.inf), key)
        (mu, _, best_sol, _, _), _ = jax.lax.scan(
            iteration, init, jnp.arange(self.num_iterations)
        )
        return mu if self.return_mean_elites else best_sol

    def optimize(self, obj_fun, x0, key, opt_state=(), obj_args=(), callback=None):
        return (
            self._jit_opt(
                obj_fun, jnp.asarray(x0, jnp.float32), key, obj_args, callback
            ),
            (),
        )

    def optimize_traced(self, obj_fun, x0, key, opt_state, obj_args):
        return self._optimize_impl(obj_fun, x0, key, obj_args), opt_state


class MPPIOptimizer(Optimizer):
    """Model Predictive Path Integral: β-smoothed correlated noise, exponential
    reward weighting, persistent shifted mean across calls (carried as opt_state)."""

    def __init__(
        self,
        num_iterations: int,
        population_size: int,
        gamma: float,
        sigma: float,
        beta: float,
        lower_bound: Sequence[Sequence[float]],
        upper_bound: Sequence[Sequence[float]],
    ):
        self.refinements = num_iterations
        self.population_size = population_size
        self.gamma = gamma
        self.beta = beta
        self.lower_bound = jnp.asarray(lower_bound, jnp.float32)
        self.upper_bound = jnp.asarray(upper_bound, jnp.float32)
        self.horizon, self.action_dim = self.lower_bound.shape
        self.var = sigma**2 * jnp.ones_like(self.lower_bound)
        self._jit_opt = jax.jit(
            self._optimize_impl, static_argnames=("obj_fun", "callback")
        )

    def init_state(self):
        return jnp.zeros((self.horizon, self.action_dim), jnp.float32)

    def _optimize_impl(self, obj_fun, mean, key, obj_args, callback=None):
        past_action = mean[0]
        mean = jnp.concatenate([mean[1:], mean[-1:]], axis=0)

        def refinement(carry, k):
            mean, key = carry
            key, k_noise = jax.random.split(key)
            noise = jax.random.truncated_normal(
                k_noise,
                -2.0,
                2.0,
                (self.population_size, self.horizon, self.action_dim),
            )
            lb_dist = mean - self.lower_bound
            ub_dist = self.upper_bound - mean
            mv = jnp.minimum(jnp.square(lb_dist / 2), jnp.square(ub_dist / 2))
            constrained_var = jnp.minimum(mv, self.var)
            scaled = noise * jnp.sqrt(constrained_var)

            # β-smoothing across time: a_t = β(mean_t + n_t) + (1-β) a_{t-1}
            def smooth(prev, t):
                cur = self.beta * (mean[t] + noise[:, t, :]) + (1 - self.beta) * prev
                return cur, cur

            first = self.beta * (mean[0] + noise[:, 0, :]) + (1 - self.beta) * past_action
            _, rest = jax.lax.scan(
                smooth, first, jnp.arange(1, self.horizon)
            )
            population = jnp.concatenate(
                [first[:, None, :], jnp.swapaxes(rest, 0, 1)], axis=1
            )
            # unsmoothed scale applied only through noise term above; clip to bounds
            del scaled
            population = jnp.clip(population, self.lower_bound, self.upper_bound)

            values = _nan_guard(obj_fun(population, *obj_args))
            if callback is not None:
                _host_callback(callback, population, values, k)
            weights = jnp.exp(self.gamma * (values - values.max()))[:, None, None]
            norm = weights.sum() + 1e-10
            mean = (population * weights).sum(axis=0) / norm
            return (mean, key), None

        (mean, _), _ = jax.lax.scan(
            refinement, (mean, key), jnp.arange(self.refinements)
        )
        return mean

    def optimize(self, obj_fun, x0, key, opt_state=None, obj_args=(), callback=None):
        if opt_state is None or (isinstance(opt_state, tuple) and opt_state == ()):
            opt_state = self.init_state()
        mean = self._jit_opt(obj_fun, opt_state, key, obj_args, callback=callback)
        return mean, mean

    def optimize_traced(self, obj_fun, x0, key, opt_state, obj_args):
        # persistent mean comes from opt_state (shifted internally by
        # _optimize_impl); x0 is ignored — callers must NOT pre-shift
        mean = self._optimize_impl(obj_fun, opt_state, key, obj_args)
        return mean, mean


class ICEMOptimizer(Optimizer):
    """iCEM: colored-noise populations with exponentially decayed size, elite reuse
    across iterations and calls, mean appended at the last iteration.

    Population sizes per iteration are static, so the jitted program unrolls the
    (few) iterations with exact shapes instead of padding.
    """

    def __init__(
        self,
        num_iterations: int,
        elite_ratio: float,
        population_size: int,
        population_decay_factor: float,
        colored_noise_exponent: float,
        lower_bound: Sequence[Sequence[float]],
        upper_bound: Sequence[Sequence[float]],
        keep_elite_frac: float,
        alpha: float,
        return_mean_elites: bool = False,
        population_size_module: Optional[int] = None,
    ):
        self.num_iterations = num_iterations
        self.elite_num = int(np.ceil(population_size * elite_ratio))
        self.colored_noise_exponent = colored_noise_exponent
        self.lower_bound = jnp.asarray(lower_bound, jnp.float32)
        self.upper_bound = jnp.asarray(upper_bound, jnp.float32)
        self.initial_var = jnp.square(self.upper_bound - self.lower_bound) / 16.0
        self.alpha = alpha
        self.return_mean_elites = return_mean_elites
        self.horizon, self.action_dim = self.lower_bound.shape

        def round_up(value: int, module: Optional[int]) -> int:
            if not module or value % module == 0:
                return value
            return value + module - value % module

        self.keep_elite_size = round_up(
            int(np.ceil(keep_elite_frac * self.elite_num)), population_size_module
        )
        self.decay_population_sizes = [
            round_up(
                int(
                    np.ceil(
                        max(
                            population_size * population_decay_factor**-i,
                            2 * self.elite_num,
                        )
                    )
                ),
                population_size_module,
            )
            for i in range(num_iterations)
        ]
        self._jit_opt = jax.jit(
            self._optimize_impl, static_argnames=("obj_fun", "callback")
        )

    def init_state(self):
        # (elite set, valid flag). A zeroed elite set with valid=False reproduces the
        # reference's `self.elite is None` first-call behavior with static shapes.
        return {
            "elite": jnp.zeros((self.elite_num, self.horizon, self.action_dim)),
            "valid": jnp.zeros((), bool),
        }

    def _optimize_impl(self, obj_fun, x0, key, opt_state, obj_args, callback=None):
        mu = x0
        var = self.initial_var
        best_sol = x0
        best_val = jnp.float32(-jnp.inf)
        elite, elite_valid = opt_state["elite"], opt_state["valid"]

        for i, pop_size in enumerate(self.decay_population_sizes):
            key, k_noise, k_keep, k_end = jax.random.split(key, 4)
            # colored noise correlated along time (last axis of the generator)
            noise = powerlaw_psd_gaussian(
                k_noise,
                self.colored_noise_exponent,
                (pop_size, self.action_dim, self.horizon),
            )
            population = jnp.swapaxes(noise, 1, 2) * jnp.sqrt(var) + mu
            population = jnp.clip(population, self.lower_bound, self.upper_bound)

            # elite reuse: random subset of kept elites (zeros masked to mu when the
            # elite set is not yet valid)
            perm = jax.random.permutation(k_keep, self.elite_num)[: self.keep_elite_size]
            kept = elite[perm]
            if i == 0:
                end_action = mu[-1] + jnp.sqrt(var[-1]) * jax.random.normal(
                    k_end, (self.keep_elite_size, self.action_dim)
                )
                kept = jnp.concatenate([kept[:, 1:, :], end_action[:, None, :]], axis=1)
            elif i == self.num_iterations - 1:
                # the reference appends the running mean as a SINGLE candidate at
                # the last iteration (trajectory_opt.py:458-459); iterations are
                # statically unrolled so the smaller concat shape is fine
                kept = mu[None]
            kept = jnp.where(elite_valid, kept, jnp.broadcast_to(mu, kept.shape))
            population = jnp.concatenate([population, kept], axis=0)

            values = _nan_guard(obj_fun(population, *obj_args))
            if callback is not None:
                _host_callback(callback, population, values, i)
            elite_values, elite_idx = jax.lax.top_k(values, self.elite_num)
            elite = population[elite_idx]
            elite_valid = jnp.ones((), bool)

            new_mu = elite.mean(axis=0)
            new_var = elite.var(axis=0)
            mu = self.alpha * mu + (1 - self.alpha) * new_mu
            var = self.alpha * var + (1 - self.alpha) * new_var

            improved = elite_values[0] > best_val
            best_sol = jnp.where(improved, population[elite_idx[0]], best_sol)
            best_val = jnp.maximum(best_val, elite_values[0])

        out = mu if self.return_mean_elites else best_sol
        return out, {"elite": elite, "valid": elite_valid}

    def optimize(self, obj_fun, x0, key, opt_state=None, obj_args=(), callback=None):
        if opt_state is None or (isinstance(opt_state, tuple) and opt_state == ()):
            opt_state = self.init_state()
        return self._jit_opt(
            obj_fun,
            jnp.asarray(x0, jnp.float32),
            key,
            opt_state,
            obj_args,
            callback=callback,
        )

    def optimize_traced(self, obj_fun, x0, key, opt_state, obj_args):
        return self._optimize_impl(obj_fun, x0, key, opt_state, obj_args)


class TrajectoryOptimizer:
    """Shapes action-sequence optimization problems as (H, A) and warm-starts.

    Initial solution is the midpoint of the action bounds tiled over the horizon;
    after each plan the previous solution is shifted by ``replan_freq`` with the
    initial solution filling the tail (reference trajectory_opt.py:525-567).
    """

    def __init__(
        self,
        optimizer: Optimizer,
        action_lb: np.ndarray,
        action_ub: np.ndarray,
        planning_horizon: int,
        replan_freq: int = 1,
        keep_last_solution: bool = True,
    ):
        self.optimizer = optimizer
        self.horizon = planning_horizon
        self.replan_freq = replan_freq
        self.keep_last_solution = keep_last_solution
        mid = (np.asarray(action_lb, np.float32) + np.asarray(action_ub, np.float32)) / 2
        self.initial_solution = jnp.tile(jnp.asarray(mid), (planning_horizon, 1))
        self.previous_solution = self.initial_solution
        self.opt_state = optimizer.init_state()

    def optimize(self, obj_fun, key, obj_args=(), callback=None) -> np.ndarray:
        solution, self.opt_state = self.optimizer.optimize(
            obj_fun,
            self.previous_solution,
            key,
            self.opt_state,
            obj_args,
            callback=callback,
        )
        if self.keep_last_solution:
            shifted = jnp.roll(solution, -self.replan_freq, axis=0)
            shifted = shifted.at[-self.replan_freq :].set(self.initial_solution[0])
            self.previous_solution = shifted
        return np.asarray(solution)

    def reset(self):
        self.previous_solution = self.initial_solution
        self.opt_state = self.optimizer.reset_state(self.opt_state)


class TrajectoryOptimizerAgent(Agent):
    """MPC agent: plans a horizon, caches ``replan_freq`` actions, re-plans when the
    cache empties. The trajectory evaluation function is set post-construction (so
    agents remain config-instantiable, reference trajectory_opt.py:596-640)."""

    def __init__(
        self,
        optimizer: Optimizer,
        action_lb: Sequence[float],
        action_ub: Sequence[float],
        planning_horizon: int = 1,
        replan_freq: int = 1,
        verbose: bool = False,
        keep_last_solution: bool = True,
        seed: int = 0,
    ):
        self.optimizer = TrajectoryOptimizer(
            optimizer,
            np.asarray(action_lb),
            np.asarray(action_ub),
            planning_horizon=planning_horizon,
            replan_freq=replan_freq,
            keep_last_solution=keep_last_solution,
        )
        self.trajectory_eval_fn = None
        self._eval_state: Any = None
        self.actions_to_use: List[np.ndarray] = []
        self.replan_freq = replan_freq
        self.verbose = verbose
        self._seed = seed
        self._key = jax.random.PRNGKey(seed)
        # fused single-dispatch act path (see _fused_act_program)
        self._act_prog = None
        self._dev_prev_sol = None
        self._dev_opt_state = None
        self._act_counter = 0
        # batched act path (one program plans for W envs; see act_batch)
        self._act_batch_prog = None
        self._batch_state = None  # (W, prev_sols, opt_states, cache)

    def set_trajectory_eval_fn(self, trajectory_eval_fn) -> None:
        """trajectory_eval_fn(action_sequences, eval_state, obs, key) -> values
        (the optimizer calls obj_fun(population, *obj_args))."""
        self.trajectory_eval_fn = trajectory_eval_fn
        self._act_prog = None
        self._act_batch_prog = None

    def set_eval_state(self, eval_state) -> None:
        """Update the pytree closed over by the eval fn (e.g. trained model state)."""
        self._eval_state = eval_state

    def reset(self, planning_horizon: Optional[int] = None) -> None:
        if planning_horizon:
            self.optimizer = TrajectoryOptimizer(
                self.optimizer.optimizer,
                np.asarray(self.optimizer.initial_solution[0]),
                np.asarray(self.optimizer.initial_solution[0]),
                planning_horizon=planning_horizon,
                replan_freq=self.replan_freq,
            )
            self._act_prog = None
        self.optimizer.reset()
        self.actions_to_use = []
        self._dev_prev_sol = None
        self._dev_opt_state = None
        self._batch_state = None

    def use_prng_impl(self, impl: str) -> None:
        """Re-seed the agent's PRNG with a specific implementation (e.g.
        "rbg": TPU-cheap counter-based bits vs the default threefry, whose
        generation cost is a measured ~12% of a rollout step — switching to
        rbg recovers about half of that; see docs/PERF_NOTES.md, r5c
        decomposition). All keys split from this one inherit the impl
        through the whole planning program."""
        self._key = jax.random.key(self._seed, impl=impl)
        self._act_prog = None
        self._act_batch_prog = None
        self._dev_prev_sol = None
        self._batch_state = None

    def _next_key(self) -> jax.Array:
        self._key, sub = jax.random.split(self._key)
        return sub

    def _fused_act_program(self):
        """ONE jitted program per plan: fold the plan counter into the PRNG key,
        run the optimizer, shift the warm-start solution — all on device. The
        reference's act() (trajectory_opt.py:655-694) costs several host<->device
        round trips per plan (key splits, solution download, warm-start
        re-upload); over a remote-device tunnel that dispatch wall dominated
        BENCH_r02's real-env planning at ~89 ms/plan. Here only the observation
        goes up and the `replan_freq` cached actions come down; the previous
        solution and optimizer state stay device-resident between plans."""
        if self._act_prog is None:
            traj_opt = self.optimizer
            opt = traj_opt.optimizer
            eval_fn = self.trajectory_eval_fn
            init_sol = traj_opt.initial_solution
            keep = traj_opt.keep_last_solution
            rf = traj_opt.replan_freq

            def prog(prev_sol, opt_state, eval_state, obs, key, counter):
                k = jax.random.fold_in(key, counter)
                k_opt, k_obj = jax.random.split(k)
                sol, opt_state = opt.optimize_traced(
                    eval_fn, prev_sol, k_opt, opt_state, (eval_state, obs, k_obj)
                )
                if keep:
                    shifted = jnp.roll(sol, -rf, axis=0)
                    shifted = shifted.at[-rf:].set(init_sol[0])
                else:
                    shifted = init_sol
                return sol[:rf], shifted, opt_state

            self._act_prog = jax.jit(prog)
        return self._act_prog

    def act(
        self, obs: np.ndarray, optimizer_callback=None, **_kwargs
    ) -> np.ndarray:
        if self.trajectory_eval_fn is None:
            raise RuntimeError(
                "Call set_trajectory_eval_fn() before using TrajectoryOptimizerAgent"
            )
        if _kwargs.get("batched"):
            return self.act_batch(obs, reset_mask=_kwargs.get("reset_mask"))
        import os

        if optimizer_callback is not None or os.environ.get(
            "MBRL_TPU_DISABLE_FUSED_ACT"
        ):
            return self._act_host(obs, optimizer_callback)
        plan_time = 0.0
        if not self.actions_to_use:
            start = time.time()
            if self._dev_prev_sol is None:
                self._dev_prev_sol = self.optimizer.previous_solution
                self._dev_opt_state = self.optimizer.opt_state
            actions, self._dev_prev_sol, self._dev_opt_state = (
                self._fused_act_program()(
                    self._dev_prev_sol,
                    self._dev_opt_state,
                    self._eval_state,
                    jnp.asarray(obs, jnp.float32),
                    self._key,
                    jnp.int32(self._act_counter),
                )
            )
            self._act_counter += 1
            self.actions_to_use.extend(list(np.asarray(actions)))
            plan_time = time.time() - start
        action = self.actions_to_use.pop(0)
        if self.verbose:
            print(f"Planning time: {plan_time:.3f}")
        return action

    def _fused_act_batch_program(self):
        """vmap of the fused act program over W environments: ONE device
        program plans W independent MPC actions (each with its own warm-start
        solution, optimizer state, and PRNG stream). This is what lets a
        planner agent feed an EnvWorkerPool the way SAC does — the reference
        has no batched-planning concept at all (its agent plans one obs at a
        time, trajectory_opt.py:655-716)."""
        if self._act_batch_prog is None:
            traj_opt = self.optimizer
            opt = traj_opt.optimizer
            eval_fn = self.trajectory_eval_fn
            init_sol = traj_opt.initial_solution
            keep = traj_opt.keep_last_solution
            rf = traj_opt.replan_freq

            def single(prev_sol, opt_state, eval_state, obs, key, counter, wid):
                k = jax.random.fold_in(jax.random.fold_in(key, counter), wid)
                k_opt, k_obj = jax.random.split(k)
                sol, opt_state = opt.optimize_traced(
                    eval_fn, prev_sol, k_opt, opt_state, (eval_state, obs, k_obj)
                )
                if keep:
                    shifted = jnp.roll(sol, -rf, axis=0)
                    shifted = shifted.at[-rf:].set(init_sol[0])
                else:
                    shifted = init_sol
                return sol[:rf], shifted, opt_state

            self._act_batch_prog = jax.jit(
                jax.vmap(single, in_axes=(0, 0, None, 0, None, None, 0))
            )
        return self._act_batch_prog

    def act_batch(
        self, obs_batch: np.ndarray, reset_mask: Optional[np.ndarray] = None
    ) -> np.ndarray:
        """MPC actions for a batch of W observations in ONE device dispatch.

        Per-env warm starts and optimizer states persist across calls;
        ``reset_mask[w]=True`` resets env w's planner state (episode
        boundary). Caches ``replan_freq`` actions per env like :meth:`act`.
        """
        if self.trajectory_eval_fn is None:
            raise RuntimeError(
                "Call set_trajectory_eval_fn() before using TrajectoryOptimizerAgent"
            )
        obs_batch = jnp.asarray(obs_batch, jnp.float32)
        w = obs_batch.shape[0]
        traj_opt = self.optimizer
        st = self._batch_state
        if st is None or st["w"] != w:
            st = {
                "w": w,
                "prev_sol": jnp.broadcast_to(
                    traj_opt.initial_solution, (w,) + traj_opt.initial_solution.shape
                ),
                "opt_state": jax.tree_util.tree_map(
                    lambda x: jnp.broadcast_to(jnp.asarray(x), (w,) + jnp.shape(x)),
                    traj_opt.optimizer.init_state(),
                ),
                "cache": [],  # list of (W, A) action rows
                "counter": 0,
            }
            self._batch_state = st
        if reset_mask is not None and np.any(reset_mask):
            mask = jnp.asarray(reset_mask, bool)

            def reset_rows(x, init):
                m = mask.reshape((w,) + (1,) * (x.ndim - 1))
                return jnp.where(m, jnp.asarray(init), x)

            st["prev_sol"] = reset_rows(st["prev_sol"], traj_opt.initial_solution)
            st["opt_state"] = jax.tree_util.tree_map(
                lambda x, i: reset_rows(x, i),
                st["opt_state"],
                jax.tree_util.tree_map(
                    jnp.asarray, traj_opt.optimizer.init_state()
                ),
            )
            st["cache"] = []  # replan everyone at a boundary
        if not st["cache"]:
            actions, st["prev_sol"], st["opt_state"] = (
                self._fused_act_batch_program()(
                    st["prev_sol"],
                    st["opt_state"],
                    self._eval_state,
                    obs_batch,
                    self._key,
                    jnp.int32(st["counter"]),
                    jnp.arange(w, dtype=jnp.int32),
                )
            )
            st["counter"] += 1
            host = np.asarray(actions)  # (W, rf, A)
            st["cache"] = [host[:, i] for i in range(host.shape[1])]
        return st["cache"].pop(0)

    def _act_host(self, obs: np.ndarray, optimizer_callback) -> np.ndarray:
        """Host-loop act path (used when a per-iteration diagnostics callback
        needs the population/values on host, reference trajectory_opt.py:674)."""
        plan_time = 0.0
        if not self.actions_to_use:
            start = time.time()
            obj_args = (
                self._eval_state,
                jnp.asarray(obs, jnp.float32),
                self._next_key(),
            )
            plan = self.optimizer.optimize(
                self.trajectory_eval_fn,
                self._next_key(),
                obj_args=obj_args,
                callback=optimizer_callback,
            )
            plan_time = time.time() - start
            self.actions_to_use.extend(list(plan[: self.replan_freq]))
        action = self.actions_to_use.pop(0)
        if self.verbose:
            print(f"Planning time: {plan_time:.3f}")
        return action

    def plan(
        self, obs: np.ndarray, optimizer_callback=None, **_kwargs
    ) -> np.ndarray:
        if self.trajectory_eval_fn is None:
            raise RuntimeError(
                "Call set_trajectory_eval_fn() before using TrajectoryOptimizerAgent"
            )
        obj_args = (self._eval_state, jnp.asarray(obs, jnp.float32), self._next_key())
        return self.optimizer.optimize(
            self.trajectory_eval_fn,
            self._next_key(),
            obj_args=obj_args,
            callback=optimizer_callback,
        )


def create_trajectory_optim_agent_for_model(
    model_env,
    agent: TrajectoryOptimizerAgent,
    num_particles: int = 1,
) -> TrajectoryOptimizerAgent:
    """Bind an agent's objective to ModelEnv.evaluate_action_sequences.

    The bound objective has the static callable + traced data split: the model's
    wrapper state is passed via ``set_eval_state`` (call again after retraining)."""

    def trajectory_eval_fn(action_sequences, eval_state, obs, key):
        return model_env.evaluate_action_sequences(
            eval_state, action_sequences, obs, key, num_particles=num_particles
        )

    agent.set_trajectory_eval_fn(trajectory_eval_fn)
    return agent
