"""True-dynamics trajectory optimization over a pool of real-env workers.

Capability parity with the reference ``mbrl/diagnostics/control_env.py`` (the repo's
only multiprocess code: an mp.Pool with a per-worker global env :25-35, CEM/iCEM/MPPI
planning where every candidate action sequence is evaluated on the REAL environment
via state set/rollout/restore :38-61, pool at :145-147).

Design note: the on-device optimizers in ``mbrl_tpu.planning`` jit their objective;
a real-simulator objective cannot be traced, so this tool ships a host-side CEM with
the same update rule (truncated-normal population, top-k elites, momentum) driving
the worker pool. On a multi-host TPU system the same pattern scales by placing
workers on TPU hosts and the optimizer on the learner host.
"""
from __future__ import annotations

import argparse
import multiprocessing as mp
import time
from typing import Optional, Tuple

import numpy as np

from mbrl_tpu.util.env import EnvHandler, create_handler_from_str, make_env_from_name

env__: object = None
handler__: EnvHandler = None


def init_worker(env_name: str, seed: int):
    """Initialize a per-worker global environment."""
    global env__, handler__
    try:
        # true-dynamics workers step host simulators only; a fresh
        # forkserver/spawn child must not claim the remote TPU backend
        import jax

        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass
    from mbrl_tpu.config import Config

    handler__ = create_handler_from_str(env_name)
    cfg = Config({"overrides": {"env": env_name}})
    env__ = make_env_from_name(cfg, env_name)
    env__.reset(seed=seed)


def evaluate_sequence_fn(args) -> float:
    """Evaluate one action sequence from a given env state on the real dynamics."""
    action_sequence, current_state = args
    global env__, handler__
    handler__.set_env_state(current_state, env__)
    total = 0.0
    for action in action_sequence:
        _, reward, terminated, truncated, _ = env__.step(action)
        total += reward
        if terminated or truncated:
            break
    return total


class TrueDynamicsController:
    """CEM planning against the real environment via a worker pool."""

    def __init__(
        self,
        env_name: str,
        horizon: int,
        population_size: int,
        num_iterations: int,
        elite_ratio: float = 0.1,
        alpha: float = 0.1,
        num_workers: int = 4,
        seed: int = 0,
    ):
        self.env_name = env_name
        self.horizon = horizon
        self.population_size = population_size
        self.num_iterations = num_iterations
        self.elite_num = max(1, int(np.ceil(population_size * elite_ratio)))
        self.alpha = alpha
        self.rng = np.random.default_rng(seed)

        self.handler = create_handler_from_str(env_name)
        from mbrl_tpu.config import Config

        self.env = make_env_from_name(Config({"overrides": {"env": env_name}}), env_name)
        self.env.reset(seed=seed)
        self.action_lb = self.env.action_space.low
        self.action_ub = self.env.action_space.high

        # forkserver: the parent has live JAX threads by now, so forking it
        # directly risks deadlocks in inherited locks (same fix as
        # parallel/env_workers.py)
        try:
            _ctx = mp.get_context("forkserver")
        except ValueError:  # pragma: no cover - non-POSIX fallback
            _ctx = mp.get_context("spawn")
        self.pool = _ctx.Pool(
            processes=num_workers, initializer=init_worker, initargs=(env_name, seed)
        )

        # ONE CEM implementation for the whole framework: the shared
        # planning.CEMOptimizer update rule, with the real-env worker pool as a
        # host objective behind jax.pure_callback (reference duplicated the CEM
        # equations here, mbrl/diagnostics/control_env.py:38-61; drift risk).
        import jax
        import jax.numpy as jnp

        from mbrl_tpu.planning import CEMOptimizer

        lb = np.tile(self.action_lb, (horizon, 1)).tolist()
        ub = np.tile(self.action_ub, (horizon, 1)).tolist()
        self._cem = CEMOptimizer(
            num_iterations=num_iterations,
            elite_ratio=elite_ratio,
            population_size=population_size,
            lower_bound=lb,
            upper_bound=ub,
            alpha=alpha,
            return_mean_elites=False,  # best-ever sequence, as before
        )
        self._current_state = None
        self._key = jax.random.PRNGKey(seed)
        act_dim = self.action_lb.shape[0]
        self._x0 = jnp.asarray(
            np.tile((self.action_lb + self.action_ub) / 2, (horizon, 1)),
            jnp.float32,
        )

        def _host_eval(pop: np.ndarray) -> np.ndarray:
            pop = np.asarray(pop, np.float64)
            return np.asarray(
                self.pool.map(
                    evaluate_sequence_fn,
                    [(seq, self._current_state) for seq in pop],
                ),
                np.float32,
            )

        def _objective(population, *args):
            return jax.pure_callback(
                _host_eval,
                jax.ShapeDtypeStruct((population.shape[0],), jnp.float32),
                population,
            )

        self._objective = _objective  # stable identity: one jit trace total

    def plan(self, current_state) -> np.ndarray:
        """One CEM plan with every candidate evaluated on the real env."""
        import jax

        self._current_state = current_state
        self._key, k = jax.random.split(self._key)
        sol, _ = self._cem.optimize(self._objective, self._x0, k)
        return np.asarray(sol)

    def run_episode(self, max_steps: int = 200, verbose: bool = False) -> float:
        obs, _ = self.env.reset()
        total_reward = 0.0
        for step in range(max_steps):
            t0 = time.time()
            state = self.handler.get_current_state(self.env)
            plan = self.plan(state)
            obs, reward, terminated, truncated, _ = self.env.step(plan[0])
            total_reward += reward
            if verbose:
                print(f"step {step}: reward {reward:.3f} plan_time {time.time()-t0:.2f}s")
            if terminated or truncated:
                break
        return total_reward

    def close(self):
        self.pool.close()
        self.pool.join()


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--env", type=str, default="cartpole_continuous")
    parser.add_argument("--horizon", type=int, default=15)
    parser.add_argument("--population", type=int, default=64)
    parser.add_argument("--iterations", type=int, default=3)
    parser.add_argument("--workers", type=int, default=4)
    parser.add_argument("--steps", type=int, default=100)
    args = parser.parse_args()
    controller = TrueDynamicsController(
        args.env, args.horizon, args.population, args.iterations,
        num_workers=args.workers,
    )
    reward = controller.run_episode(args.steps, verbose=True)
    print(f"episode reward: {reward}")
    controller.close()
