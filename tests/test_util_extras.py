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


class TestRunLock:
    """Advisory per-work-dir trainer lock (util/runlock.py): a second live
    trainer must be refused before it touches any artifact; stale locks from
    dead processes are stolen so checkpointed resumes stay one-command."""

    def test_second_acquisition_by_live_holder_refused(self, tmp_path):
        from mbrl_tpu.util.runlock import RunLockedError, run_lock

        (tmp_path / ".run_lock").write_text("1")  # pid 1: always alive
        import pytest

        with pytest.raises(RunLockedError, match="locked by live pid 1"):
            with run_lock(tmp_path):
                pass

    def test_stale_lock_is_stolen_and_released(self, tmp_path):
        import os

        from mbrl_tpu.util.runlock import run_lock

        (tmp_path / ".run_lock").write_text("999999999")  # dead pid
        with run_lock(tmp_path):
            assert (tmp_path / ".run_lock").read_text() == str(os.getpid())
        assert not (tmp_path / ".run_lock").exists()

    def test_reentrant_within_one_process(self, tmp_path):
        import os

        from mbrl_tpu.util.runlock import run_lock

        with run_lock(tmp_path):
            with run_lock(tmp_path):  # chunked resumes in one process
                pass
            # the INNER exit must not unlock the still-training outer context
            # (a second process could otherwise sneak in mid-run)
            assert (tmp_path / ".run_lock").read_text() == str(os.getpid())
        assert not (tmp_path / ".run_lock").exists()

    def test_lock_file_is_never_observably_empty(self, tmp_path):
        """The atomic temp+link create means a concurrent reader can never
        see an empty lock file (whose pid-0 parse made live locks stealable)."""
        from mbrl_tpu.util import runlock

        created = runlock._try_create(tmp_path / ".run_lock", 4242)
        assert created
        assert (tmp_path / ".run_lock").read_text() == "4242"
        assert not runlock._try_create(tmp_path / ".run_lock", 77)

    def test_unstealable_lock_refuses_rather_than_running_unguarded(
        self, tmp_path, monkeypatch
    ):
        import pytest

        from mbrl_tpu.util import runlock

        (tmp_path / ".run_lock").write_text("999999999")  # dead pid
        monkeypatch.setattr(runlock, "_try_create", lambda *a: False)
        with pytest.raises(runlock.RunLockedError, match="refusing to train"):
            with runlock.run_lock(tmp_path):
                pass

    def test_released_on_training_exception(self, tmp_path):
        import pytest

        from mbrl_tpu.util.runlock import run_lock

        with pytest.raises(ValueError):
            with run_lock(tmp_path):
                raise ValueError("training blew up")
        assert not (tmp_path / ".run_lock").exists()

    def test_algorithm_entry_points_guarded(self, tmp_path):
        """All three train() wrappers refuse a locked work dir BEFORE touching
        env/cfg (so the guard runs first — args can be None here)."""
        import pytest

        import mbrl_tpu.algorithms.mbpo as mbpo
        import mbrl_tpu.algorithms.pets as pets
        import mbrl_tpu.algorithms.planet as planet
        from mbrl_tpu.util.runlock import RunLockedError

        (tmp_path / ".run_lock").write_text("1")
        with pytest.raises(RunLockedError):
            pets.train(None, None, None, None, work_dir=str(tmp_path))
        with pytest.raises(RunLockedError):
            mbpo.train(None, None, None, None, work_dir=str(tmp_path))
        with pytest.raises(RunLockedError):
            planet.train(None, None, work_dir=str(tmp_path))
