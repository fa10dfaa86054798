"""mbrl_tpu — a TPU-native model-based reinforcement learning framework.

Built from scratch in JAX/XLA (jit, vmap, lax.scan, shard_map, Pallas) with the
capabilities of facebookresearch/mbrl-lib (reference: mbrl/__init__.py:5): probabilistic
ensemble dynamics models, a batched model-as-environment, sampling-based trajectory
optimizers (CEM/iCEM/MPPI), and the PETS / MBPO / PlaNet algorithms — all expressed as
pure functional programs over explicit pytree state so every hot loop compiles to a
single XLA program per device.

Design stance (vs. the reference):
  - every per-planning-step / per-gradient-step computation is ONE jitted program
    (no host round-trips inside hot loops);
  - ensemble members are a vmapped leading axis, shardable across a device mesh;
  - rollout particles/population are a batch axis, shardable across a device mesh;
  - randomness is explicit `jax.random` key threading;
  - all mutable state (normalizer stats, CEM mean/var, model propagation state,
    replay positions) is carried explicitly as pytrees.
"""

__version__ = "0.1.0"

from . import ops, types

__all__ = ["ops", "types", "__version__"]
