"""Advisory per-work-dir run lock: refuse two concurrent trainers on one dir.

Motivation (round 5): two resumed continuation processes of the same run
briefly trained into one work dir, interleaving ``results.csv`` rows and
checkpoints from two diverging policy lineages. Checkpoint/resume makes such
double-starts easy to trigger operationally, and nothing in the algorithms
guarded against it — the reference has no equivalent (its runs are one-shot
Hydra jobs), but a resumable framework needs one.

``run_lock(work_dir)`` is a context manager used by the PETS/MBPO/PlaNet
``train()`` entry points:

- writes ``<work_dir>/.run_lock`` with this process's pid via O_EXCL;
- if the file exists and its pid is a LIVE process, raises
  ``RunLockedError`` (the second trainer stops before touching any artifact);
- if the pid is dead (crash/kill), the stale lock is stolen — checkpointed
  resumes keep their one-command workflow;
- the lock is removed on context exit (including on training exceptions).

The lock is advisory and per-host (pid semantics); multi-host runs coordinate
through the distributed backend instead (parallel/multihost.py).
"""
from __future__ import annotations

import contextlib
import errno
import os
import pathlib
from typing import Iterator, Union


class RunLockedError(RuntimeError):
    """Another live process is already training into this work dir."""


def _pid_alive(pid: int) -> bool:
    if pid <= 0:
        return False
    try:
        os.kill(pid, 0)
    except ProcessLookupError:
        return False
    except PermissionError:
        return True
    return True


def _read_pid(path: pathlib.Path) -> int:
    try:
        return int(path.read_text().strip() or "0")
    except (OSError, ValueError):
        return 0


@contextlib.contextmanager
def run_lock(work_dir: Union[str, os.PathLike]) -> Iterator[None]:
    """Hold the advisory lock on ``work_dir`` for the duration of a training
    run; raise :class:`RunLockedError` if a live process already holds it."""
    work_dir = pathlib.Path(work_dir)
    work_dir.mkdir(parents=True, exist_ok=True)
    path = work_dir / ".run_lock"
    me = os.getpid()
    for _attempt in range(2):
        try:
            fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            with os.fdopen(fd, "w") as f:
                f.write(str(me))
            break
        except OSError as e:
            if e.errno != errno.EEXIST:
                raise
            holder = _read_pid(path)
            if holder == me:
                break  # re-entrant within one process (e.g. chunked resumes)
            if _pid_alive(holder):
                raise RunLockedError(
                    f"work dir {work_dir} is locked by live pid {holder} "
                    f"({path}); a second concurrent trainer would interleave "
                    "its checkpoints and results.csv rows with the first — "
                    "stop that process (or wait for it) before resuming here"
                ) from None
            # stale lock from a dead process: steal it
            with contextlib.suppress(OSError):
                path.unlink()
    try:
        yield
    finally:
        # only the holder removes its own lock (steal-then-crash races leave
        # at worst a stale file that the next acquisition reclaims)
        if _read_pid(path) == me:
            with contextlib.suppress(OSError):
                path.unlink()
