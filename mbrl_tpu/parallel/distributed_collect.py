"""Multi-host real-env collection: each process owns a slice of the global
worker pool and collects into its own host-local replay-buffer shard.

This is the piece BASELINE.md's scaling story calls "env workers sharded over
hosts feeding the learner" (the reference's closest analogue is the
diagnostics-only mp.Pool, mbrl/diagnostics/control_env.py:145-147; its
training loops are strictly single-env). The topology is share-nothing on the
collection side: process p steps workers ``local_worker_slice(W)`` and writes
their transitions into its local buffer; the learner then consumes all shards
through the data-parallel input pipeline (each process feeds its own rows of
the mesh's data axis — ``ModelTrainer``'s sharded stacked batches / the
device dataset shard).

Usable single-host too (process count 1): it degrades to a plain batched
worker pool, which already amortizes one batched-policy dispatch over W envs.
"""
from __future__ import annotations

from typing import Callable, List, Optional

import numpy as np

from mbrl_tpu.parallel.env_workers import EnvWorkerPool
from mbrl_tpu.parallel.multihost import local_worker_slice, process_info


class DistributedCollector:
    """This process's shard of a ``num_workers_total``-wide env worker pool.

    Worker seeds are derived from the GLOBAL worker id, so the same total pool
    produces the same env streams regardless of how many processes shard it.
    """

    def __init__(self, env_ctor: Callable, num_workers_total: int, seed: int = 0):
        self.num_workers_total = num_workers_total
        self.worker_ids = local_worker_slice(num_workers_total)
        if len(self.worker_ids) == 0:
            raise ValueError(
                f"process {process_info()[0]} got 0 of {num_workers_total} env "
                "workers; use at least one worker per process"
            )
        self.pool = EnvWorkerPool(
            env_ctor, len(self.worker_ids), seed=seed + self.worker_ids.start
        )

    @property
    def num_local_workers(self) -> int:
        return self.pool.num_workers

    @property
    def current_obs(self) -> np.ndarray:
        return self.pool.current_obs

    def step(self, actions: np.ndarray):
        return self.pool.step(actions)

    def reset_workers(self, indices, seed=None):
        return self.pool.reset_workers(indices, seed=seed)

    def collect(
        self,
        agent,
        num_steps: int,
        replay_buffer=None,
        sample: bool = True,
    ) -> List[float]:
        """``num_steps`` batched steps into the local buffer shard; returns
        completed-episode rewards (local workers only)."""
        return self.pool.collect(
            agent, num_steps, replay_buffer=replay_buffer, sample=sample
        )

    def collect_random(self, action_space, num_steps: int, replay_buffer=None):
        """Seed-data collection with uniform random actions (the reference's
        RandomAgent exploration phase, batched over the local workers)."""

        class _RandomBatchAgent:
            def __init__(self, space, n):
                self.space = space
                self.n = n

            def act(self, obs, sample=True, batched=True):
                return np.stack([self.space.sample() for _ in range(self.n)])

        return self.pool.collect(
            _RandomBatchAgent(action_space, self.pool.num_workers),
            num_steps,
            replay_buffer=replay_buffer,
        )

    def close(self) -> None:
        self.pool.close()


class _ConfigEnvCtor:
    """Top-level picklable env constructor: forkserver/spawn workers receive
    this object (cfg rides along via Config.__getstate__) and build the env
    inside the child, importing only what the env needs."""

    def __init__(self, cfg):
        self.cfg = cfg

    def __call__(self):
        from mbrl_tpu.util.env import create_handler

        env, *_ = create_handler(self.cfg).make_env(self.cfg)
        return env


def make_env_ctor(cfg):
    """Picklable env constructor from a config (same factory path as the
    algorithms' own env, util/env.py)."""
    return _ConfigEnvCtor(cfg)


def maybe_make_collector(cfg, seed: int = 0) -> Optional[DistributedCollector]:
    """Build this process's collector iff ``overrides.num_env_workers`` > 0."""
    num_workers = int(cfg.overrides.get("num_env_workers", 0) or 0)
    if num_workers <= 0:
        return None
    return DistributedCollector(make_env_ctor(cfg), num_workers, seed=seed)
