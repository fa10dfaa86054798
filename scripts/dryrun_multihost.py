"""Child body of the multi-host dry run (see parallel/multihost.py).

Each process joins the JAX process group from the MBRL_TPU_* env vars, builds
the GLOBAL (model, data) mesh over all processes' devices, and validates:
  1. a psum across every device (== global device count);
  2. one ensemble train step with params sharded over the model axis and the
     bootstrapped batch sharded over (model, data) — the data axis spans
     processes, so the gradient reduction crosses the process boundary (DCN on
     real hardware);
  3. the resulting loss agrees across processes (replicated output).

Run via ``python -c "from mbrl_tpu.parallel.multihost import run_multihost_dryrun;
run_multihost_dryrun()"`` — not directly.
"""
import os
import sys

import jax

from mbrl_tpu.parallel.multihost import (
    global_mesh,
    maybe_initialize_distributed,
    process_info,
    psum_check,
)


def main() -> None:
    assert maybe_initialize_distributed(), "coordinator env vars missing"
    pid, nproc = process_info()
    n_global = len(jax.devices())
    n_local = len(jax.local_devices())
    print(f"process {pid}/{nproc}: {n_local} local / {n_global} global devices")

    mesh = global_mesh()
    total = psum_check(mesh)
    print(f"psum={int(total)}")

    # sharded ensemble train step across the global mesh
    import numpy as np
    import optax

    from mbrl_tpu.models import GaussianMLP, TransitionRewardModel
    from mbrl_tpu.ops.tree import combine_params, partition_params
    from mbrl_tpu.parallel import mesh as pmesh
    from mbrl_tpu.types import TransitionBatch

    E = 2 * mesh.shape[pmesh.MODEL_AXIS]
    B = 4 * mesh.shape[pmesh.DATA_AXIS]
    obs_dim, act_dim = 4, 2
    model = GaussianMLP(
        in_size=obs_dim + act_dim, out_size=obs_dim + 1, num_layers=2,
        ensemble_size=E, hid_size=16,
    )
    wrapper = TransitionRewardModel(
        model, target_is_delta=True, normalize=False, learned_rewards=True
    )
    state = wrapper.init(jax.random.PRNGKey(0))
    params = pmesh.shard_ensemble_params(state["params"], mesh, E)
    rng = np.random.default_rng(0)  # same data in every process
    batch = TransitionBatch(
        obs=rng.standard_normal((E, B, obs_dim)).astype(np.float32),
        act=rng.standard_normal((E, B, act_dim)).astype(np.float32),
        next_obs=rng.standard_normal((E, B, obs_dim)).astype(np.float32),
        rewards=rng.standard_normal((E, B, 1)).astype(np.float32),
        terminateds=np.zeros((E, B, 1), bool),
        truncateds=np.zeros((E, B, 1), bool),
    )
    batch = pmesh.shard_member_batch(batch, mesh)
    optimizer = optax.adam(1e-3)
    diff0, static0 = partition_params(params)
    opt_state = optimizer.init(diff0)

    @jax.jit
    def train_step(diff, opt_state, batch):
        def loss_fn(d):
            full = combine_params(d, static0)
            loss, _ = wrapper.loss({"params": full, "normalizer": None}, batch)
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(diff)
        updates, opt_state = optimizer.update(grads, opt_state)
        diff = optax.apply_updates(diff, updates)
        return diff, opt_state, loss

    with mesh:
        _, _, loss = train_step(diff0, opt_state, batch)
    loss = float(jax.device_get(loss))
    assert loss == loss, "NaN loss"
    print(f"sharded train step loss={loss:.5f}")
    print("MULTIHOST OK")


if __name__ == "__main__":
    sys.exit(main())
