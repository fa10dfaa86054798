"""Checkpoint/resume and profiling utility tests."""
import jax
import jax.numpy as jnp
import numpy as np

from mbrl_tpu.util.checkpoint import latest_checkpoint, restore_checkpoint, save_checkpoint
from mbrl_tpu.util.profiling import StepTimer, annotate


def test_checkpoint_roundtrip_and_pruning(tmp_path):
    state = {
        "params": {"w": jnp.arange(6.0).reshape(2, 3), "b": jnp.zeros(3)},
        "opt": {"count": jnp.zeros((), jnp.int32)},
        "key": jax.random.PRNGKey(7),
        "env_steps": 1234,
    }
    for step in (100, 200, 300, 400):
        save_checkpoint(tmp_path, {**state, "env_steps": step}, step, keep=2)
    latest = latest_checkpoint(tmp_path)
    assert latest is not None and "400" in latest.name
    # only 2 kept
    ckpts = [p for p in latest.parent.iterdir() if p.name.startswith("step_")]
    assert len(ckpts) == 2

    restored = restore_checkpoint(latest)
    assert restored["env_steps"] == 400
    np.testing.assert_array_equal(np.asarray(restored["params"]["w"]), np.arange(6.0).reshape(2, 3))
    np.testing.assert_array_equal(np.asarray(restored["key"]), np.asarray(state["key"]))
    # restored params usable in jit
    out = jax.jit(lambda p: p["w"].sum())(restored["params"])
    assert float(out) == 15.0


def test_step_timer():
    timer = StepTimer()
    x = jnp.ones((100, 100))
    for _ in range(3):
        with timer.phase("matmul", block=None):
            y = x @ x
        jax.block_until_ready(y)
    with timer.phase("noop"):
        pass
    summary = timer.summary()
    assert summary["matmul"]["count"] == 3
    assert summary["matmul"]["total_s"] >= 0
    report = timer.report()
    assert "matmul" in report and "noop" in report
    timer.clear()
    assert timer.summary() == {}


def test_trace_annotation_compiles():
    with annotate("test-phase"):
        y = jnp.ones(4) * 2
    assert float(y.sum()) == 8.0


def test_checkpoint_sentinel_none_allowed_inf_rejected(tmp_path):
    """Counters that legitimately start at -inf are checkpointed as None (the
    r4 hopper crash: the first checkpoint fired before any eval and the
    validator refused the -inf best-reward sentinel); raw non-finite floats
    still refuse to persist."""
    import numpy as np
    import pytest

    from mbrl_tpu.util import checkpoint as ckpt

    ckpt.save_checkpoint(tmp_path, {"x": np.ones(3), "best": None}, step=1)
    restored = ckpt.restore_checkpoint(ckpt.latest_checkpoint(tmp_path))
    assert restored["best"] is None

    with pytest.raises(ckpt.NonFiniteCheckpointError):
        ckpt.save_checkpoint(tmp_path, {"x": np.float32(-np.inf)}, step=2)
