"""Multi-host (multi-process) scaffolding: DCN-coordinated process groups.

The reference is single-process (SURVEY.md §2.15/§5.8 — no distributed backend
exists). This module is the TPU-native multi-host surface specified by
BASELINE.md's scaling north star:

  - each HOST runs one process owning its local chips and a shard of the real
    env workers; the learner's arrays shard over the GLOBAL mesh (ICI within a
    host/slice, DCN across); XLA inserts the collectives.
  - initialization is env-var gated (``maybe_initialize_distributed``) so the
    same entry point (``examples/main.py``) runs unchanged on one host.

Env vars (standard JAX coordinator protocol):
  MBRL_TPU_COORDINATOR   host:port of process 0 (presence enables multi-host)
  MBRL_TPU_NUM_PROCESSES total number of processes
  MBRL_TPU_PROCESS_ID    this process's id in [0, num_processes)

Real >=2-host runs need hardware this build environment doesn't have; the
correctness path is proven by ``run_multihost_dryrun`` (scripts/
dryrun_multihost.py): N local processes x M virtual CPU devices each form one
global mesh, run a psum across all N*M devices and one sharded ensemble train
step, and check the results agree across processes.
"""
from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import numpy as np

_COORD = "MBRL_TPU_COORDINATOR"
_NPROC = "MBRL_TPU_NUM_PROCESSES"
_PID = "MBRL_TPU_PROCESS_ID"


def maybe_initialize_distributed() -> bool:
    """Join the process group iff the coordinator env vars are set (no-op and
    False otherwise). Call once, before any other jax API touches devices."""
    coord = os.environ.get(_COORD)
    if not coord:
        return False
    num_processes = int(os.environ[_NPROC])
    process_id = int(os.environ[_PID])
    jax.distributed.initialize(
        coordinator_address=coord,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def process_info() -> Tuple[int, int]:
    """(process_id, num_processes) — (0, 1) when not distributed."""
    return jax.process_index(), jax.process_count()


def global_mesh(model_axis_size: Optional[int] = None):
    """(model, data) mesh over ALL processes' devices. The data (DP) axis spans
    hosts — gradient/score reductions across it ride DCN; the model (EP) axis
    is laid out within a host's devices so ensemble all-gathers stay on ICI."""
    from mbrl_tpu.parallel.mesh import make_mesh

    return make_mesh(jax.devices(), model_axis_size=model_axis_size)


def local_worker_slice(num_workers_total: int) -> range:
    """This process's contiguous share of the real-env worker pool: worker i is
    owned by process i * num_processes // num_workers_total's inverse mapping —
    each process feeds its own buffer shard (share-nothing, SURVEY §2.15)."""
    pid, nproc = process_info()
    per = num_workers_total // nproc
    extra = num_workers_total % nproc
    start = pid * per + min(pid, extra)
    stop = start + per + (1 if pid < extra else 0)
    return range(start, stop)


def psum_check(mesh=None) -> float:
    """All-device psum of ones — returns the global device count when the
    process group and mesh are correctly wired."""
    from jax.experimental.shard_map import shard_map
    from jax.sharding import NamedSharding, PartitionSpec as P

    from mbrl_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS

    if mesh is None:
        mesh = global_mesh()
    n = mesh.shape[MODEL_AXIS] * mesh.shape[DATA_AXIS]
    ones = jax.device_put(
        np.ones((n,), np.float32),
        NamedSharding(mesh, P((MODEL_AXIS, DATA_AXIS))),
    )

    def f(x):
        return jax.lax.psum(x.sum(), (MODEL_AXIS, DATA_AXIS))

    out = jax.jit(
        shard_map(
            f,
            mesh=mesh,
            in_specs=P((MODEL_AXIS, DATA_AXIS)),
            out_specs=P(),
        )
    )(ones)
    return float(np.asarray(out))


def run_multihost_dryrun(
    num_processes: int = 2, devices_per_process: int = 4, timeout_s: int = 300
) -> None:
    """Spawn ``num_processes`` local CPU processes that form one JAX process
    group and validate initialization, a global-mesh psum, and one sharded
    ensemble train step. See scripts/dryrun_multihost.py for the child body."""
    import pathlib
    import subprocess
    import sys

    script = (
        pathlib.Path(__file__).resolve().parent.parent.parent
        / "scripts"
        / "dryrun_multihost.py"
    )
    port = 12765 + (os.getpid() % 1000)
    procs = []
    for pid in range(num_processes):
        env = dict(os.environ)
        env.update(
            {
                _COORD: f"127.0.0.1:{port}",
                _NPROC: str(num_processes),
                _PID: str(pid),
                "JAX_PLATFORMS": "cpu",
                "XLA_FLAGS": (
                    f"--xla_force_host_platform_device_count={devices_per_process}"
                ),
                "PYTHONPATH": str(script.parent.parent),
            }
        )
        procs.append(
            subprocess.Popen(
                [sys.executable, "-u", str(script)],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
            )
        )
    outputs = []
    for p in procs:
        out, _ = p.communicate(timeout=timeout_s)
        outputs.append(out)
        if p.returncode != 0:
            raise RuntimeError(f"multihost child failed:\n{out}")
    for pid, out in enumerate(outputs):
        expected = num_processes * devices_per_process
        assert f"psum={expected}" in out, (pid, out)
        assert "MULTIHOST OK" in out, (pid, out)
    print(
        f"run_multihost_dryrun OK: {num_processes} processes x "
        f"{devices_per_process} devices, psum + sharded train step validated"
    )
