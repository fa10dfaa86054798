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

    # 4. one COLLECTION round: this process's slice of an 4-wide global env
    #    worker pool steps real envs into a local buffer shard, then the shard
    #    feeds a sharded retraining batch (collect -> train across processes)
    from mbrl_tpu.parallel.distributed_collect import DistributedCollector
    from mbrl_tpu.util.replay_buffer import ReplayBuffer

    # the class itself is the (picklable) env ctor — forkserver workers
    # unpickle it by import path
    from mbrl_tpu.envs.cartpole_continuous import CartPoleEnv as _env_ctor

    W = 4
    collector = DistributedCollector(_env_ctor, W, seed=7)
    local_w = collector.num_local_workers
    assert 0 < local_w <= W
    shard_buffer = ReplayBuffer(256, (4,), (1,), rng=rng)
    env0 = _env_ctor()
    collector.collect_random(env0.action_space, 20, replay_buffer=shard_buffer)
    collector.close()
    assert shard_buffer.num_stored == 20 * local_w
    print(f"collected {shard_buffer.num_stored} rows on {local_w}/{W} workers")

    # each process contributes ITS OWN collected rows to a GLOBAL data-sharded
    # batch (make_array_from_process_local_data over a 1-D data mesh spanning
    # every process's devices), then one retraining step reduces gradients
    # across the process boundary — the full collect -> train loop shape.
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    rows_local = 2 * n_local  # divisible by the local device count
    rows = jax.tree_util.tree_map(
        lambda a: np.asarray(a)[:rows_local], shard_buffer.get_all()
    )
    # cartpole actions are 1-D; zero-pad to the model's act_dim
    act_pad = np.zeros((rows_local, act_dim), np.float32)
    act_pad[:, : rows.act.shape[1]] = rows.act
    rows = rows.replace(act=act_pad) if hasattr(rows, "replace") else rows._replace(act=act_pad)
    local = TransitionBatch(
        obs=np.broadcast_to(
            rows.obs, (E,) + rows.obs.shape
        ).astype(np.float32),
        act=np.broadcast_to(rows.act, (E,) + rows.act.shape).astype(np.float32),
        next_obs=np.broadcast_to(
            rows.next_obs, (E,) + rows.next_obs.shape
        ).astype(np.float32),
        rewards=np.broadcast_to(
            rows.rewards.reshape(-1, 1), (E, rows_local, 1)
        ).astype(np.float32),
        terminateds=np.zeros((E, rows_local, 1), bool),
        truncateds=np.zeros((E, rows_local, 1), bool),
    )
    data_mesh = Mesh(np.asarray(jax.devices()), ("data",))
    row_sharding = NamedSharding(data_mesh, P(None, "data"))
    collected = jax.tree_util.tree_map(
        lambda a: jax.make_array_from_process_local_data(row_sharding, a), local
    )
    rep = NamedSharding(data_mesh, P())
    # re-replicate from the (identical-per-process) unsharded init, NOT from the
    # mesh-sharded copies (those span non-addressable devices)
    diff_u, static_u = partition_params(state["params"])
    diff_r = jax.device_put(jax.device_get(diff_u), rep)
    static_r = jax.device_put(jax.device_get(static_u), rep)
    opt_r = optimizer.init(diff_r)

    @jax.jit
    def train_step_collected(diff, opt_state, batch):
        def loss_fn(d):
            full = combine_params(d, static_r)
            loss, _ = wrapper.loss({"params": full, "normalizer": None}, batch)
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(diff)
        updates, opt_state = optimizer.update(grads, opt_state)
        diff = optax.apply_updates(diff, updates)
        return diff, opt_state, loss

    _, _, loss2 = train_step_collected(diff_r, opt_r, collected)
    loss2 = float(jax.device_get(loss2))
    assert loss2 == loss2, "NaN loss on collected data"
    print(f"collect->train loss={loss2:.5f} over {int(collected.obs.shape[1])} global rows")
    print("MULTIHOST OK")


if __name__ == "__main__":
    sys.exit(main())
