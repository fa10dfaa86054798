from .context import ParallelContext, make_parallel_context
from .env_workers import EnvWorkerPool
from .multihost import (
    global_mesh,
    local_worker_slice,
    maybe_initialize_distributed,
    process_info,
    run_multihost_dryrun,
)
from .mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    ensemble_param_sharding,
    make_mesh,
    replicate,
    shard_ensemble_params,
    shard_member_batch,
    shard_particles,
)

__all__ = [
    "MODEL_AXIS",
    "DATA_AXIS",
    "make_mesh",
    "ensemble_param_sharding",
    "shard_ensemble_params",
    "shard_member_batch",
    "shard_particles",
    "replicate",
    "EnvWorkerPool",
    "ParallelContext",
    "make_parallel_context",
    "maybe_initialize_distributed",
    "process_info",
    "global_mesh",
    "local_worker_slice",
    "run_multihost_dryrun",
]
