"""Device-resident replay buffer (jnp ring) for high-frequency learner loops.

The reference's MBPO stores imagined rollouts in a host numpy buffer and re-uploads
batches per SAC update (mbrl/algorithms/mbpo.py:54-61, third_party sac.py:89-93 —
the host round-trip SURVEY.md §3.2 calls out). Here the buffer IS device memory:

  - state is a pytree of preallocated jnp arrays + integer cursor;
  - `add_batch` is a jitted donated ring-write (scatter at wrapped positions);
  - `sample`/`sample_many` are jitted gathers by random indices, so imagined-rollout
    generation, buffer writes, and thousands of SAC updates compose into on-device
    programs with zero host transfers.
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct


@struct.dataclass
class DeviceBufferState:
    obs: jax.Array
    act: jax.Array
    next_obs: jax.Array
    reward: jax.Array
    mask: jax.Array  # 1.0 - terminated (SAC convention)
    cur_idx: jax.Array  # int32 scalar
    num_stored: jax.Array  # int32 scalar


class DeviceReplayBuffer:
    """Fixed-capacity device ring buffer of (obs, act, next_obs, reward, mask)."""

    def __init__(self, capacity: int, obs_dim: int, act_dim: int):
        self.capacity = capacity
        self.obs_dim = obs_dim
        self.act_dim = act_dim
        self._add = jax.jit(self._add_impl, donate_argnums=(0,))
        self._sample = jax.jit(self._sample_impl, static_argnames=("batch_size",))
        self._sample_many = jax.jit(
            self._sample_many_impl, static_argnames=("num_batches", "batch_size")
        )

    def init(self) -> DeviceBufferState:
        # one extra scratch row at index `capacity`: masked-out writes land there
        c = self.capacity + 1
        return DeviceBufferState(
            obs=jnp.zeros((c, self.obs_dim), jnp.float32),
            act=jnp.zeros((c, self.act_dim), jnp.float32),
            next_obs=jnp.zeros((c, self.obs_dim), jnp.float32),
            reward=jnp.zeros((c, 1), jnp.float32),
            mask=jnp.ones((c, 1), jnp.float32),
            cur_idx=jnp.zeros((), jnp.int32),
            num_stored=jnp.zeros((), jnp.int32),
        )

    # ------------------------------------------------------------------ #
    def _add_impl(self, state: DeviceBufferState, obs, act, next_obs, reward, mask):
        n = obs.shape[0]
        positions = (state.cur_idx + jnp.arange(n, dtype=jnp.int32)) % self.capacity
        return state.replace(
            obs=state.obs.at[positions].set(obs),
            act=state.act.at[positions].set(act),
            next_obs=state.next_obs.at[positions].set(next_obs),
            reward=state.reward.at[positions].set(reward),
            mask=state.mask.at[positions].set(mask),
            cur_idx=(state.cur_idx + n) % self.capacity,
            num_stored=jnp.minimum(state.num_stored + n, self.capacity),
        )

    def add_batch(
        self, state: DeviceBufferState, obs, act, next_obs, reward, mask
    ) -> DeviceBufferState:
        """Ring-write a batch (donated: reuses the buffer's device memory)."""
        return self._add(
            state,
            jnp.asarray(obs, jnp.float32),
            jnp.asarray(act, jnp.float32),
            jnp.asarray(next_obs, jnp.float32),
            jnp.reshape(jnp.asarray(reward, jnp.float32), (-1, 1)),
            jnp.reshape(jnp.asarray(mask, jnp.float32), (-1, 1)),
        )

    def add_batch_masked(
        self, state: DeviceBufferState, obs, act, next_obs, reward, mask, valid
    ) -> DeviceBufferState:
        """Ring-write only rows with ``valid``=True, preserving static shapes:
        valid rows pack into consecutive ring slots; invalid rows are routed to the
        scratch slot at index ``capacity``. jit-composable (used inside the MBPO
        imagined-rollout scan, where particles die as they terminate)."""
        valid = jnp.reshape(valid, (-1,)).astype(jnp.int32)
        offsets = jnp.cumsum(valid) - 1
        n_valid = valid.sum()
        positions = jnp.where(
            valid.astype(bool),
            (state.cur_idx + offsets) % self.capacity,
            self.capacity,  # scratch row
        )
        reward = jnp.reshape(jnp.asarray(reward, jnp.float32), (-1, 1))
        mask = jnp.reshape(jnp.asarray(mask, jnp.float32), (-1, 1))
        return state.replace(
            obs=state.obs.at[positions].set(obs),
            act=state.act.at[positions].set(act),
            next_obs=state.next_obs.at[positions].set(next_obs),
            reward=state.reward.at[positions].set(reward),
            mask=state.mask.at[positions].set(mask),
            cur_idx=(state.cur_idx + n_valid) % self.capacity,
            num_stored=jnp.minimum(state.num_stored + n_valid, self.capacity),
        )

    # ------------------------------------------------------------------ #
    def _gather(self, state: DeviceBufferState, idx):
        return (
            state.obs[idx],
            state.act[idx],
            state.next_obs[idx],
            state.reward[idx],
            state.mask[idx],
        )

    def _sample_impl(self, state: DeviceBufferState, key, batch_size: int):
        idx = jax.random.randint(key, (batch_size,), 0, jnp.maximum(state.num_stored, 1))
        return self._gather(state, idx)

    def sample(self, state: DeviceBufferState, key, batch_size: int):
        """Uniform batch as a (obs, act, next_obs, reward, mask) tuple."""
        return self._sample(state, key, batch_size=batch_size)

    def _sample_many_impl(
        self, state: DeviceBufferState, key, num_batches: int, batch_size: int
    ):
        idx = jax.random.randint(
            key, (num_batches, batch_size), 0, jnp.maximum(state.num_stored, 1)
        )
        return self._gather(state, idx)

    def sample_many(
        self, state: DeviceBufferState, key, num_batches: int, batch_size: int
    ):
        """Stacked batches (N, B, ...) for scanned multi-update programs."""
        return self._sample_many(
            state, key, num_batches=num_batches, batch_size=batch_size
        )

    def resize(self, state: DeviceBufferState, new_capacity: int) -> "Tuple[DeviceReplayBuffer, DeviceBufferState]":
        """Grow/shrink capacity keeping the most recent transitions (parity with
        MBPO's maybe_replace_sac_buffer, reference mbpo.py:88-113)."""
        new_buf = DeviceReplayBuffer(new_capacity, self.obs_dim, self.act_dim)
        new_state = new_buf.init()
        n = int(state.num_stored)
        if n == 0:
            return new_buf, new_state
        keep = min(n, new_capacity)
        # most recent `keep` entries in chronological order
        end = int(state.cur_idx)
        start = (end - keep) % self.capacity if n == self.capacity else max(0, n - keep)
        if n == self.capacity:
            idx = (jnp.arange(keep) + start) % self.capacity
        else:
            idx = jnp.arange(start, start + keep)
        obs, act, next_obs, reward, mask = self._gather(state, idx)
        new_state = new_buf.add_batch(new_state, obs, act, next_obs, reward, mask)
        return new_buf, new_state

    def __len__(self):
        raise TypeError("DeviceReplayBuffer is stateless; use int(state.num_stored)")


class DeviceTransitionDataset:
    """Incrementally-synced device mirror of a host replay buffer, for fully
    on-device model training (``ModelTrainer.train_device``).

    The reference re-uploads the whole (growing) dataset every epoch through its
    host iterators; over a remote-device link that upload dominates training. Here
    the device holds the dataset once: each sync uploads ONLY the new transitions
    (one small H2D per model retraining), and capacity grows in geometric buckets
    (default x1.25, rounded to 256) so downstream jitted programs — whose shapes
    depend on the capacity, not the row count — recompile O(log n) times instead of
    every retrain.
    """

    def __init__(self, obs_dim, act_dim: int, min_capacity: int = 4096,
                 growth: float = 1.25, obs_dtype=jnp.float32):
        # obs_dim: feature count for 1-D observations, or a full obs shape
        # tuple (e.g. pixel (C, H, W)); obs_dtype uint8 keeps pixel datasets at
        # 1 byte/texel on device (PlaNet's quantized frames)
        self.obs_shape = (
            tuple(obs_dim) if isinstance(obs_dim, (tuple, list)) else (int(obs_dim),)
        )
        self.obs_dim = obs_dim
        self.act_dim = act_dim
        self.obs_dtype = obs_dtype
        self.min_capacity = min_capacity
        self.growth = growth
        self.capacity = 0
        self.num_stored = 0
        self.data = None  # TransitionBatch of device arrays, capacity rows

    def _bucket(self, needed: int) -> int:
        cap = max(self.min_capacity, 256)
        while cap < needed:
            cap = int(-(-cap * self.growth // 256) * 256)  # ceil to 256 multiple
        return cap

    def _alloc(self, capacity: int):
        from mbrl_tpu.types import TransitionBatch

        z = lambda shape, dt=jnp.float32: jnp.zeros(shape, dt)
        old, old_n = self.data, self.num_stored
        self.data = TransitionBatch(
            obs=z((capacity, *self.obs_shape), self.obs_dtype),
            act=z((capacity, self.act_dim)),
            next_obs=z((capacity, *self.obs_shape), self.obs_dtype),
            rewards=z((capacity,)),
            terminateds=jnp.zeros((capacity,), bool),
            truncateds=jnp.zeros((capacity,), bool),
        )
        self.capacity = capacity
        if old is not None and old_n:
            self.data = jax.tree_util.tree_map(
                lambda dst, src: jax.lax.dynamic_update_slice_in_dim(
                    dst, src[:old_n], 0, axis=0
                ),
                self.data,
                old,
            )

    def append(self, batch) -> None:
        """Append host transitions (TransitionBatch of numpy arrays) at the tail;
        grows the device allocation to the next bucket when needed."""
        k = int(np.shape(batch.obs)[0])
        if k == 0:
            return
        if self.num_stored + k > self.capacity:
            self._alloc(self._bucket(self.num_stored + k))
        start = self.num_stored

        def put(dst, src):
            src = jnp.asarray(np.asarray(src), dst.dtype)
            return jax.lax.dynamic_update_slice_in_dim(dst, src, start, axis=0)

        self.data = jax.tree_util.tree_map(put, self.data, batch)
        self.num_stored += k

    def overwrite(self, start: int, batch) -> None:
        """Overwrite rows [start, start+k) in place (post-wrap ring updates)."""
        k = int(np.shape(batch.obs)[0])
        if k == 0:
            return

        def put(dst, src):
            src = jnp.asarray(np.asarray(src), dst.dtype)
            return jax.lax.dynamic_update_slice_in_dim(dst, src, start, axis=0)

        self.data = jax.tree_util.tree_map(put, self.data, batch)

    def sync_from(self, replay_buffer) -> None:
        """Mirror a host ReplayBuffer's physical rows, uploading only the rows
        written since the last sync (pre-wrap: a tail append; post-wrap: at most
        two contiguous overwritten slices of the ring)."""
        n, cur = replay_buffer.num_stored, int(replay_buffer.cur_idx)
        prev_cur = getattr(self, "_last_cur", 0)
        total = getattr(replay_buffer, "total_added", None)
        prev_total = getattr(self, "_last_total", 0)
        if n < self.num_stored:  # host buffer was reset/reloaded: mirror afresh
            self.capacity = 0
            self.num_stored = 0
            self.data = None
            prev_cur = 0
        elif (
            total is not None
            and self.num_stored
            and total - prev_total >= replay_buffer.num_stored
            and not (n > self.num_stored and cur == n)
        ):
            # a full buffer's worth (or more) of writes landed since the last
            # sync AND the ring wrapped: the [cur, prev_cur) region the
            # incremental path would skip was overwritten too — or cur lapped
            # back to prev_cur exactly, which the "nothing new" shortcut would
            # silently treat as stale. Re-mirror everything (ADVICE r2:
            # silent-data-corruption guard).
            self._last_total = total
            self._last_cur = cur
            if n > self.num_stored:
                self.append(replay_buffer.get_range(self.num_stored, n))
            self.overwrite(0, replay_buffer.get_range(0, n))
            return
        if total is not None:
            self._last_total = total
        if n > self.num_stored and cur == n:
            # un-wrapped ring: new rows are a pure tail append
            self.append(replay_buffer.get_range(self.num_stored, n))
        elif n == self.num_stored and cur == prev_cur:
            pass  # nothing new
        else:
            # wrapped ring: physical rows [prev_cur, cur) (mod capacity) changed
            if self.num_stored < n:
                self.append(replay_buffer.get_range(self.num_stored, n))
            if cur >= prev_cur:
                self.overwrite(prev_cur, replay_buffer.get_range(prev_cur, cur))
            else:
                self.overwrite(
                    prev_cur, replay_buffer.get_range(prev_cur, n)
                )
                self.overwrite(0, replay_buffer.get_range(0, cur))
        self._last_cur = cur
