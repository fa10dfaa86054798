"""Reproduce / diagnose the round-2 on-chip PlaNet NaN (VERDICT weak #1).

Stages:
  1. QR sanity on the chip (orthogonal GRU init uses jnp.linalg.qr).
  2. Init the reference-config PlaNet model; check every param leaf is finite.
  3. One loss+grad eval on random uint8 data; check finiteness.
  4. 100 grad updates via train_device_sequences; print loss trace.
Run with PLANET_PRECISION=default|highest to compare matmul precision.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

print("devices:", jax.devices())

# ---------------- stage 1: QR on chip ----------------
key = jax.random.PRNGKey(0)
a = jax.random.normal(key, (200, 200))
q, r = jnp.linalg.qr(a)
print("QR finite:", bool(jnp.isfinite(q).all()), bool(jnp.isfinite(r).all()))
print("QR orthonormality err:", float(jnp.abs(q.T @ q - jnp.eye(200)).max()))

# ---------------- stage 2: model init ----------------
from mbrl_tpu.models.planet import PlaNetModel

model = PlaNetModel(
    obs_shape=(3, 64, 64),
    obs_encoding_size=1024,
    encoder_config=[[3, 32, 4, 2], [32, 64, 4, 2], [64, 128, 4, 2], [128, 256, 4, 2]],
    decoder_config=[
        [1024, 1, 1],
        [[1024, 128, 5, 2], [128, 64, 5, 2], [64, 32, 6, 2], [32, 3, 6, 2]],
    ],
    latent_state_size=30,
    action_size=1,
    belief_size=200,
    hidden_size_fcs=200,
    matmul_precision=os.environ.get("PLANET_PRECISION", "highest"),
)
print("matmul_precision:", model.matmul_precision)
state = model.init(jax.random.PRNGKey(1))
leaves = jax.tree_util.tree_leaves(state["params"])
bad = [i for i, l in enumerate(leaves) if not bool(jnp.isfinite(l).all())]
print(f"init leaves: {len(leaves)}, non-finite: {bad}")

# ---------------- stage 3: one loss+grad ----------------
from mbrl_tpu.types import TransitionBatch

B, L = 8, 50
rng = np.random.default_rng(0)
batch = TransitionBatch(
    obs=rng.integers(0, 255, (B, L, 3, 64, 64), dtype=np.uint8),
    act=rng.uniform(-1, 1, (B, L, 1)).astype(np.float32),
    next_obs=np.zeros((B, L, 1), np.float32),
    rewards=rng.uniform(0, 1, (B, L)).astype(np.float32),
    terminateds=np.zeros((B, L), bool),
    truncateds=np.zeros((B, L), bool),
)

def loss_fn(params, key):
    loss, meta = model.loss({"params": params, "normalizer": None}, batch, key=key)
    return loss, meta

(loss, meta), grads = jax.jit(jax.value_and_grad(loss_fn, has_aux=True))(
    state["params"], jax.random.PRNGKey(2)
)
import optax
gn = optax.global_norm(grads)
print(f"loss={float(loss):.3f} meta={ {k: float(v) for k, v in meta.items()} } grad_norm={float(gn):.3f}")
gbad = [p for p, l in zip(range(len(leaves)), jax.tree_util.tree_leaves(grads)) if not bool(jnp.isfinite(l).all())]
print("non-finite grad leaves:", gbad)

# ---------------- stage 4: 100 updates ----------------
from mbrl_tpu.models.trainer import ModelTrainer
from mbrl_tpu.util.device_buffer import DeviceTransitionDataset

n_rows = 1000
ds = DeviceTransitionDataset((3, 64, 64), 1, obs_dtype=np.uint8)


from mbrl_tpu.types import TransitionBatch as TB


class FakeBuffer:
    num_stored = n_rows
    cur_idx = n_rows
    total_added = n_rows
    obs = rng.integers(0, 255, (n_rows, 3, 64, 64), dtype=np.uint8)
    action = rng.uniform(-1, 1, (n_rows, 1)).astype(np.float32)
    next_obs = np.zeros((n_rows, 3, 64, 64), np.uint8)
    reward = rng.uniform(0, 1, n_rows).astype(np.float32)
    terminated = np.zeros(n_rows, bool)
    truncated = np.zeros(n_rows, bool)

    def get_range(self, start, end):
        s = slice(start, end)
        return TB(
            obs=self.obs[s], act=self.action[s], next_obs=self.next_obs[s],
            rewards=self.reward[s], terminateds=self.terminated[s],
            truncateds=self.truncated[s],
        )


ds.sync_from(FakeBuffer())
starts = np.arange(0, n_rows - 50, dtype=np.int32)
trainer = ModelTrainer(model, optim_lr=1e-3, optim_eps=1e-4)
from mbrl_tpu.models.trainer import DivergenceError

st = state
for it in range(5):
    try:
        st, losses = trainer.train_device_sequences(
            st, ds, starts, num_updates=20, batch_size=8, seq_len=50,
            key=jax.random.PRNGKey(100 + it),
        )
    except DivergenceError as e:
        print(f"iter {it}: DIVERGED: {e}")
        sys.exit(1)
    print(
        f"iter {it}: losses[{losses[0]:.2f} .. {losses[-1]:.2f}] "
        f"finite={all(np.isfinite(losses))}",
        flush=True,
    )
print("OK: no NaN in this repro")
