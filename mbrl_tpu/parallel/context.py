"""User-facing sharding context: the bridge from the ``parallel:`` config group
to the mesh utilities in :mod:`mbrl_tpu.parallel.mesh`.

The reference has no distributed backend (SURVEY.md §2.15); this is the
TPU-native scale-out surface. Algorithms (PETS/MBPO) consume a ``ParallelContext``
built from config:

  - ensemble params shard over the mesh's ``model`` axis (the EP/TP-like axis);
  - rollout particles / batch rows shard over the ``data`` axis (the DP axis);
  - XLA GSPMD partitions every jitted program touching these arrays and inserts
    the psum/all-gather collectives over ICI — no hand-written comms.

Select with ``parallel=mesh`` on the CLI (config group
``examples/conf/parallel/``), or construct directly for library use.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax
from jax.sharding import NamedSharding, PartitionSpec as P

from mbrl_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS, make_mesh


class ParallelContext:
    """Holds the device mesh and the sharding policy knobs from config."""

    def __init__(
        self,
        mesh,
        shard_particles: bool = True,
        shard_training: bool = True,
    ):
        self.mesh = mesh
        self.shard_particles = shard_particles
        self.shard_training = shard_training

    # ------------------------------------------------------------------ #
    def particle_sharding(self) -> Optional[NamedSharding]:
        """Sharding for the flat particle/population batch axis of planning and
        imagined rollouts (ModelEnv's ``particle_sharding``)."""
        if not self.shard_particles:
            return None
        return NamedSharding(self.mesh, P(DATA_AXIS))

    def row_sharding(self) -> NamedSharding:
        """(N, ...) row batches shard over the data axis."""
        return NamedSharding(self.mesh, P(DATA_AXIS))

    def member_batch_sharding(self) -> NamedSharding:
        """(E, B, ...) bootstrapped batches: members over model, rows over data."""
        return NamedSharding(self.mesh, P(MODEL_AXIS, DATA_AXIS))

    def replicated(self) -> NamedSharding:
        return NamedSharding(self.mesh, P())

    # ------------------------------------------------------------------ #
    def shard_model_state(
        self, ensemble_size: int, state: Dict[str, Any]
    ) -> Dict[str, Any]:
        """Place a TransitionRewardModel state: stacked-ensemble params shard over
        the model axis, normalizer stats replicate. Cheap no-op when already
        placed; call after init and after every retraining."""
        from mbrl_tpu.parallel.mesh import ensemble_param_sharding

        rule = ensemble_param_sharding(self.mesh, ensemble_size)
        params = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, rule(x)), state["params"]
        )
        out = {**state, "params": params}
        if state.get("normalizer") is not None:
            out["normalizer"] = jax.tree_util.tree_map(
                lambda x: jax.device_put(x, self.replicated()),
                state["normalizer"],
            )
        return out

    def shard_dataset(self, dataset) -> None:
        """Re-place a DeviceTransitionDataset's rows over the data axis (in
        place), so on-device training programs partition over the mesh."""
        if not self.shard_training or dataset.data is None:
            return
        sh = self.row_sharding()
        dataset.data = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, sh), dataset.data
        )


def make_parallel_context(cfg) -> Optional[ParallelContext]:
    """Build a ParallelContext from the ``parallel:`` config group (None when the
    group is absent or disabled)."""
    pcfg = cfg.get("parallel", None) if hasattr(cfg, "get") else None
    if pcfg is None or not pcfg.get("enable", False):
        return None
    mesh = make_mesh(model_axis_size=pcfg.get("model_axis_size", None))
    return ParallelContext(
        mesh,
        shard_particles=bool(pcfg.get("shard_particles", True)),
        shard_training=bool(pcfg.get("shard_training", True)),
    )
