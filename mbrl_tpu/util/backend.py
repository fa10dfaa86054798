"""Backend acquisition helpers for remote-attached accelerators.

Remote TPU relays (tunnel-attached chips) grant a dead client's chip claim
only after a long server-side timeout, and report UNAVAILABLE while the pool
recovers; a long-running session should retry initialization in-process
instead of paying a fresh process's claim latency per attempt.
"""
from __future__ import annotations

import time

import jax


def wait_for_backend(max_minutes: float = 180.0, retry_s: float = 60.0) -> None:
    """Block until ``jax.devices()`` succeeds, retrying failed initialization
    (clearing cached backend state between attempts); raises the last error
    once ``max_minutes`` is exhausted. ``MBRL_TPU_WAIT_MINUTES`` overrides the
    budget (long unattended sessions ride out multi-hour pool outages)."""
    import os

    max_minutes = float(os.environ.get("MBRL_TPU_WAIT_MINUTES", max_minutes))
    deadline = time.time() + max_minutes * 60
    attempt = 0
    while True:
        attempt += 1
        try:
            print(f"[attempt {attempt}] devices: {jax.devices()}", flush=True)
            return
        except RuntimeError as e:
            if time.time() > deadline:
                raise
            print(
                f"[attempt {attempt}] backend unavailable ({e}); "
                f"retrying in {retry_s:.0f}s",
                flush=True,
            )
            try:
                jax.extend.backend.clear_backends()
            except Exception:
                pass
            time.sleep(retry_s)
