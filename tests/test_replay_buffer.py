"""Replay buffer semantics tests — ports the coverage of the reference's
tests/core/test_replay_buffer.py (ring wraparound, batched add across the boundary,
trajectory bookkeeping + overlap eviction, bootstrap/sequence iterators)."""
import numpy as np
import pytest

from mbrl_tpu.types import TransitionBatch
from mbrl_tpu.util import (
    BootstrapIterator,
    ReplayBuffer,
    SequenceTransitionIterator,
    SequenceTransitionSampler,
    TransitionIterator,
    stack_iterator,
)


def _make_buffer(capacity, obs_dim=1, act_dim=1, **kw):
    return ReplayBuffer(capacity, (obs_dim,), (act_dim,), **kw)


def _fill(buf, n, start=0):
    for i in range(start, start + n):
        buf.add(np.array([i]), np.array([i]), np.array([i + 1]), i, False, False)


def test_ring_wraparound():
    buf = _make_buffer(5)
    _fill(buf, 3)
    assert len(buf) == 3 and buf.cur_idx == 3
    _fill(buf, 4, start=3)
    assert len(buf) == 5 and buf.cur_idx == 2
    # oldest entries (0,1) were overwritten by (5,6)
    got = sorted(buf.obs[:5, 0].tolist())
    assert got == [2, 3, 4, 5, 6]


def test_add_batch_wraps_boundary():
    buf = _make_buffer(6)
    _fill(buf, 4)
    arr = np.arange(100, 105, dtype=np.float32)
    buf.add_batch(
        arr[:, None], arr[:, None], arr[:, None] + 1, arr, np.zeros(5, bool), np.zeros(5, bool)
    )
    assert len(buf) == 6
    assert buf.cur_idx == 3
    # positions 4,5 then wrap to 0,1,2
    np.testing.assert_array_equal(buf.obs[4:, 0], [100, 101])
    np.testing.assert_array_equal(buf.obs[:3, 0], [102, 103, 104])
    np.testing.assert_array_equal(buf.obs[3, 0], [3])


def test_sample_and_get_all():
    buf = _make_buffer(10)
    _fill(buf, 8)
    batch = buf.sample(20)
    assert isinstance(batch, TransitionBatch) and len(batch) == 20
    assert set(batch.obs[:, 0].astype(int).tolist()) <= set(range(8))
    all_data = buf.get_all()
    assert len(all_data) == 8
    shuffled = buf.get_all(shuffle=True)
    assert sorted(shuffled.obs[:, 0].tolist()) == sorted(all_data.obs[:, 0].tolist())
    # consistency: rewards follow obs
    np.testing.assert_array_equal(shuffled.rewards, shuffled.obs[:, 0])


def test_trajectory_bookkeeping_and_eviction():
    buf = _make_buffer(10, max_trajectory_length=5)
    assert buf.stores_trajectories
    # two trajectories of lengths 4 and 3
    for i in range(4):
        buf.add(np.array([i]), np.array([0]), np.array([i + 1]), 0, i == 3, False)
    for i in range(3):
        buf.add(np.array([10 + i]), np.array([0]), np.array([11 + i]), 0, i == 2, False)
    assert buf.trajectory_indices == [(0, 4), (4, 7)]
    assert len(buf) == 7
    traj = buf.sample_trajectory()
    assert len(traj) in (3, 4)

    # keep adding until wraparound evicts the first trajectory
    for i in range(5):
        buf.add(np.array([20 + i]), np.array([0]), np.array([21 + i]), 0, i == 4, False)
    # 3rd trajectory [7, 12) extends into padding; cur_idx should reset to 0 region
    assert (7, 12) in buf.trajectory_indices
    for i in range(4):
        buf.add(np.array([30 + i]), np.array([0]), np.array([31 + i]), 0, i == 3, False)
    # new trajectory [0,4) overlaps old (0,4): evicted
    assert buf.trajectory_indices[-1] == (0, 4)
    assert (0, 4) == buf.trajectory_indices[-1]
    assert all(not (s == 0 and e == 4) for (s, e) in buf.trajectory_indices[:-1])


def test_save_load_roundtrip(tmp_path):
    buf = _make_buffer(10)
    _fill(buf, 7)
    buf.save(tmp_path)
    buf2 = _make_buffer(10)
    buf2.load(tmp_path)
    assert len(buf2) == 7
    np.testing.assert_array_equal(buf2.obs[:7], buf.obs[:7])
    np.testing.assert_array_equal(buf2.reward[:7], buf.reward[:7])


def _transitions(n, d=2):
    x = np.arange(n, dtype=np.float32)
    obs = np.stack([x] * d, axis=1)
    return TransitionBatch(
        obs, x[:, None], obs + 1, x, np.zeros(n, bool), np.zeros(n, bool)
    )


def test_transition_iterator_epochs():
    tr = _transitions(10)
    it = TransitionIterator(tr, batch_size=4)
    batches = list(it)
    assert [len(b) for b in batches] == [4, 4, 2]
    assert len(it) == 3
    # order deterministic without shuffle
    np.testing.assert_array_equal(batches[0].obs[:, 0], [0, 1, 2, 3])

    it2 = TransitionIterator(tr, 4, shuffle_each_epoch=True, rng=np.random.default_rng(0))
    e1 = np.concatenate([b.obs[:, 0] for b in it2])
    e2 = np.concatenate([b.obs[:, 0] for b in it2])
    assert sorted(e1.tolist()) == list(range(10))
    assert not np.array_equal(e1, e2)


def test_bootstrap_iterator():
    tr = _transitions(12)
    it = BootstrapIterator(tr, batch_size=4, ensemble_size=3, rng=np.random.default_rng(0))
    batch = next(iter(it))
    assert batch.obs.shape == (3, 4, 2)
    assert batch.act.shape == (3, 4, 1)
    # each member sees a permutation of the full dataset across the epoch
    per_member = [[] for _ in range(3)]
    for b in it:
        for e in range(3):
            per_member[e].extend(b.obs[e, :, 0].tolist())
    for e in range(3):
        assert sorted(per_member[e]) == list(range(12))

    it.toggle_bootstrap()
    plain = next(iter(it))
    assert plain.obs.shape == (4, 2)
    it.toggle_bootstrap()
    assert next(iter(it)).obs.shape == (3, 4, 2)


def test_bootstrap_resample_mode():
    tr = _transitions(50)
    it = BootstrapIterator(
        tr, 10, ensemble_size=2, permute_indices=False, rng=np.random.default_rng(0)
    )
    seen = []
    for b in it:
        seen.extend(b.obs[0, :, 0].tolist())
    # with-replacement: some duplicates expected over a full epoch
    assert len(set(seen)) < 50


def test_sequence_iterator():
    tr = _transitions(20)
    trajectories = [(0, 10), (10, 13), (13, 20)]
    it = SequenceTransitionIterator(
        tr, trajectories, batch_size=4, sequence_length=5, ensemble_size=2,
        rng=np.random.default_rng(0),
    )
    batch = next(iter(it))
    assert batch.obs.shape == (2, 4, 5, 2)
    # windows must be contiguous and within one trajectory
    for e in range(2):
        for b in range(4):
            seq = batch.obs[e, b, :, 0]
            np.testing.assert_array_equal(seq, np.arange(seq[0], seq[0] + 5))
            start = int(seq[0])
            assert any(lo <= start and start + 5 <= hi for lo, hi in trajectories)
    # trajectory (10,13) is too short: starts 10,11,12 excluded
    starts = set(it._valid_starts.tolist())
    assert not starts & {10, 11, 12}

    it_max = SequenceTransitionIterator(
        tr, trajectories, 4, 5, 1, max_batches_per_loop=2, rng=np.random.default_rng(0)
    )
    assert len(list(it_max)) == 2


def test_sequence_iterator_warns_when_too_short():
    tr = _transitions(6)
    with pytest.warns(UserWarning, match="discarded"):
        SequenceTransitionIterator(tr, [(0, 2), (2, 4)], 2, 5, 1)


def test_sequence_sampler():
    tr = _transitions(30)
    it = SequenceTransitionSampler(
        tr, [(0, 30)], batch_size=8, sequence_length=6, batches_per_loop=3,
        rng=np.random.default_rng(0),
    )
    batches = list(it)
    assert len(batches) == 3 and len(it) == 3
    for b in batches:
        assert b.obs.shape == (8, 6, 2)
        for i in range(8):
            seq = b.obs[i, :, 0]
            np.testing.assert_array_equal(seq, np.arange(seq[0], seq[0] + 6))


def test_stack_iterator():
    tr = _transitions(10)
    it = TransitionIterator(tr, 4)
    stacked = stack_iterator(it)
    # ragged final batch dropped: 2 full batches of 4
    assert stacked.obs.shape == (2, 4, 2)
    itb = BootstrapIterator(_transitions(12), 4, ensemble_size=3)
    stacked_b = stack_iterator(itb)
    assert stacked_b.obs.shape == (3, 3, 4, 2)
