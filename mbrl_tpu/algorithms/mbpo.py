"""MBPO: Model-Based Policy Optimization (Janner et al., 2019).

Capability parity with the reference ``mbrl/algorithms/mbpo.py:31-301``: SAC learner
on branched imagined rollouts from an ensemble model, rollout horizon scheduled by
``truncated_linear``, SAC buffer capacity recomputed per epoch, mixed real/imagined
update batches by ``real_data_ratio``, per-epoch evaluation with best-checkpoint.

TPU re-design (eliminating the reference's host round-trips, SURVEY.md §3.2):
  - the imagined-rollout generation (policy act -> model step -> masked buffer
    write, for the whole horizon) is ONE jitted ``lax.scan`` writing directly into
    a device-resident SAC buffer;
  - each env step's ``num_sac_updates_per_step`` SAC updates run as ONE scanned
    program over pre-sampled stacked batches (mixing real/imagined sources on
    device);
  - the real replay buffer stays host-side (it absorbs single env transitions) and
    is snapshotted to device once per model retraining for mixed-batch sampling.
"""
from __future__ import annotations

import os
import pathlib
from typing import Any, Dict, Optional, cast

import gymnasium as gym
import jax
import jax.numpy as jnp
import numpy as np

import mbrl_tpu.constants
from mbrl_tpu.config import Config, complete_agent_cfg, create_one_dim_tr_model
from mbrl_tpu.models import ModelEnv, ModelTrainer
from mbrl_tpu.ops.math import truncated_linear
from mbrl_tpu.parallel import make_parallel_context
from mbrl_tpu.planning import RandomAgent
from mbrl_tpu.planning.sac import SAC, SACAgent
from mbrl_tpu.util import checkpoint as ckpt
from mbrl_tpu.util import common as util_common
from mbrl_tpu.util.device_buffer import DeviceReplayBuffer, DeviceTransitionDataset
from mbrl_tpu.util.logger import Logger
from mbrl_tpu.util.video import VideoRecorder
from mbrl_tpu.util.runlock import run_lock

MBPO_LOG_FORMAT = mbrl_tpu.constants.EVAL_LOG_FORMAT + [
    ("epoch", "E", "int"),
    ("rollout_length", "RL", "int"),
]


class _ImaginedRolloutProgram:
    """Jitted: branched model rollouts from real states into the device SAC buffer."""

    def __init__(self, model_env: ModelEnv, sac: SAC, sac_buffer: DeviceReplayBuffer,
                 sac_samples_action: bool):
        self.model_env = model_env
        self.sac = sac
        self.sac_buffer = sac_buffer
        self.sac_samples_action = sac_samples_action
        self._run = jax.jit(self._impl, static_argnames=("horizon",))

    def _impl(self, model_wrapper_state, policy_params, buf_state, initial_obs, key,
              horizon: int):
        key, k_reset, k_prep = jax.random.split(key, 3)
        model_state = self.model_env.dynamics_model.reset(
            model_wrapper_state, initial_obs, k_reset
        )
        prepare = getattr(self.model_env.dynamics_model, "prepare_rollout", None)
        if prepare is not None:
            # batch the per-step TS1 permutation sorts before the scan
            model_state = prepare(model_wrapper_state, model_state, horizon, k_prep)
        batch = initial_obs.shape[0]

        def step(carry, _):
            model_state, buf_state, obs, alive, key = carry
            key, k_act, k_model = jax.random.split(key, 3)
            if self.sac_samples_action:
                action, _, _ = self.sac._sample_action(policy_params, obs, k_act)
            else:
                _, _, action = self.sac._sample_action(policy_params, obs, k_act)
            next_obs, rewards, terminated, model_state = self.model_env._step_impl(
                model_wrapper_state, action, model_state, k_model, sample=True
            )
            terminated = jnp.reshape(terminated, (batch,))
            buf_state = self.sac_buffer.add_batch_masked(
                buf_state,
                obs,
                action,
                next_obs,
                jnp.reshape(rewards, (batch,)),
                1.0 - terminated.astype(jnp.float32),  # SAC mask convention
                valid=alive,
            )
            alive = jnp.logical_and(alive, jnp.logical_not(terminated))
            return (model_state, buf_state, next_obs, alive, key), None

        init = (model_state, buf_state, initial_obs, jnp.ones((batch,), bool), key)
        (model_state, buf_state, *_), _ = jax.lax.scan(
            step, init, None, length=horizon
        )
        return buf_state

    def run(self, model_wrapper_state, policy_params, buf_state, initial_obs, key,
            horizon: int):
        return self._run(
            model_wrapper_state, policy_params, buf_state,
            jnp.asarray(initial_obs, jnp.float32), key, horizon=horizon,
        )


def rollout_model_and_populate_sac_buffer(
    model_env: ModelEnv,
    model_state,
    replay_buffer,
    sac: SAC,
    sac_state,
    sac_buffer: DeviceReplayBuffer,
    sac_buf_state,
    sac_samples_action: bool,
    rollout_horizon: int,
    batch_size: int,
    key,
):
    """Branched imagined rollouts from replay-sampled states into the device SAC
    buffer (reference mbpo.py:31-63), as one jitted program. Returns the new
    device-buffer state. (The training loop keeps a cached _ImaginedRolloutProgram
    instead of rebuilding one per call.)"""
    prog = _ImaginedRolloutProgram(model_env, sac, sac_buffer, sac_samples_action)
    initial_obs = replay_buffer.sample(batch_size).obs
    return prog.run(
        model_state, sac_state.policy, sac_buf_state, initial_obs, key, rollout_horizon
    )


def maybe_replace_sac_buffer(
    sac_buffer, sac_buf_state, obs_dim: int, act_dim: int, new_capacity: int
):
    """Recreate the device SAC buffer at a new capacity, migrating the newest
    contents (reference mbpo.py:88-113)."""
    if sac_buffer is None:
        buf = DeviceReplayBuffer(new_capacity, obs_dim, act_dim)
        return buf, buf.init()
    if sac_buffer.capacity == new_capacity:
        return sac_buffer, sac_buf_state
    return sac_buffer.resize(sac_buf_state, new_capacity)


def evaluate(env, agent: SACAgent, num_episodes: int, video_recorder=None) -> float:
    avg_episode_reward = 0.0
    for episode in range(num_episodes):
        obs, _ = env.reset()
        if video_recorder is not None:
            video_recorder.init(enabled=(episode == 0))
        terminated = truncated = False
        episode_reward = 0.0
        while not terminated and not truncated:
            action = agent.act(obs)
            obs, reward, terminated, truncated, _ = env.step(action)
            if video_recorder is not None:
                video_recorder.record(env)
            episode_reward += reward
        avg_episode_reward += episode_reward
    return avg_episode_reward / num_episodes


def train(
    env: gym.Env,
    test_env: gym.Env,
    termination_fn,
    cfg: Config,
    silent: bool = False,
    work_dir: Optional[str] = None,
) -> np.float32:
    # one trainer per work dir (util/runlock.py)
    with run_lock(work_dir or os.getcwd()):
        return _train_impl(env, test_env, termination_fn, cfg, silent, work_dir)


def _train_impl(
    env: gym.Env,
    test_env: gym.Env,
    termination_fn,
    cfg: Config,
    silent: bool = False,
    work_dir: Optional[str] = None,
) -> np.float32:
    debug_mode = cfg.get("debug_mode", False)
    obs_shape = env.observation_space.shape
    act_shape = env.action_space.shape
    obs_dim, act_dim = obs_shape[0], act_shape[0]

    key = jax.random.PRNGKey(cfg.seed or 0)
    rng = np.random.default_rng(seed=cfg.seed)

    # ----------------- SAC agent -----------------
    sac = SAC(
        num_inputs=obs_dim,
        action_space=env.action_space,
        gamma=cfg.overrides.sac_gamma,
        tau=cfg.overrides.sac_tau,
        alpha=cfg.overrides.sac_alpha,
        policy=cfg.overrides.sac_policy,
        target_update_interval=cfg.overrides.sac_target_update_interval,
        automatic_entropy_tuning=cfg.overrides.sac_automatic_entropy_tuning,
        hidden_size=cfg.overrides.sac_hidden_size,
        lr=cfg.overrides.sac_lr,
        target_entropy=cfg.overrides.get("sac_target_entropy", None),
    )
    key, k_sac = jax.random.split(key)
    sac_state = sac.init(k_sac)
    agent = SACAgent(
        sac,
        sac_state,
        seed=(cfg.seed or 0) + 3,
        refresh_age=cfg.algorithm.get("actor_refresh_age", 1),
    )

    work_dir = work_dir or os.getcwd()
    logger = None
    if not silent:
        logger = Logger(work_dir, enable_back_compat=True)
        logger.register_group(
            mbrl_tpu.constants.RESULTS_LOG_NAME, MBPO_LOG_FORMAT, color="green"
        )
    # per-epoch eval videos (reference mbrl/algorithms/mbpo.py:137-147)
    video_recorder = (
        VideoRecorder(work_dir) if cfg.get("save_video", False) else None
    )

    # ----------------- model + real buffer -----------------
    dynamics_model = create_one_dim_tr_model(cfg, obs_shape, act_shape)
    key, k_model = jax.random.split(key)
    model_state = dynamics_model.init(k_model)
    use_double = cfg.algorithm.get("normalize_double_precision", False)
    dtype = np.double if use_double else np.float32
    replay_buffer = util_common.create_replay_buffer(
        cfg, obs_shape, act_shape, rng=rng,
        obs_type=dtype, action_type=dtype, reward_type=dtype,
    )
    # optional multi-host/batched env collection: this process's slice of the
    # global worker pool (parallel/distributed_collect.py); None -> reference
    # single-env semantics
    from mbrl_tpu.parallel.distributed_collect import maybe_make_collector

    # reject pools wider than the retrain cadence BEFORE spawning workers
    # (a batched step would cross freq_train_model more than once)
    _wg = int(cfg.overrides.get("num_env_workers", 0) or 0)
    if _wg > int(cfg.overrides.freq_train_model):
        raise ValueError(
            f"num_env_workers={_wg} exceeds freq_train_model="
            f"{cfg.overrides.freq_train_model}: one batched step would cross "
            "the retrain cadence more than once; lower the pool width"
        )
    collector = maybe_make_collector(cfg, seed=(cfg.seed or 0) + 100)

    resume_snap = None
    if cfg.get("resume", False):
        latest = ckpt.latest_checkpoint(work_dir)
        if latest is not None:
            resume_snap = ckpt.restore_checkpoint(latest)
            replay_buffer.load(work_dir)
            print(f"Resuming from {latest}; skipping initial exploration.")
    if resume_snap is None:
        random_explore = cfg.algorithm.random_initial_explore
        if collector is not None and random_explore:
            # divide the GLOBAL exploration budget by the GLOBAL pool width:
            # every process runs the same number of batched steps, so the
            # all-process total matches the reference budget (r3 advice)
            collector.collect_random(
                env.action_space,
                -(-cfg.algorithm.initial_exploration_steps
                  // collector.num_workers_total),
                replay_buffer=replay_buffer,
            )
        else:
            util_common.rollout_agent_trajectories(
                env,
                cfg.algorithm.initial_exploration_steps,
                RandomAgent(env) if random_explore else agent,
                {} if random_explore else {"sample": True, "batched": False},
                replay_buffer=replay_buffer,
            )

    # optional mesh sharding from the `parallel:` config group: ensemble params
    # over the model axis, imagined-rollout particles + training rows over the
    # data axis; SAC state/buffers replicate so every program sees one device set
    pctx = make_parallel_context(cfg)

    def _rep(tree):
        return jax.device_put(tree, pctx.replicated()) if pctx is not None else tree

    if pctx is not None:
        model_state = pctx.shard_model_state(len(dynamics_model), model_state)
        sac_state = _rep(sac_state)
        agent.set_state(sac_state)
    model_env = ModelEnv(
        dynamics_model,
        termination_fn,
        None,
        particle_sharding=pctx.particle_sharding() if pctx else None,
    )
    model_trainer = ModelTrainer(
        dynamics_model,
        optim_lr=cfg.overrides.model_lr,
        weight_decay=cfg.overrides.model_wd,
        logger=logger,
        parallel_ctx=pctx,
    )

    # ----------------- loop -----------------
    # NOTE: read freq_train_model from overrides (the interpolation source) so
    # post-load override changes stay consistent with the retraining trigger below
    rollout_batch_size = (
        cfg.overrides.effective_model_rollouts_per_step
        * cfg.overrides.freq_train_model
    )
    trains_per_epoch = int(
        np.ceil(cfg.overrides.epoch_length / cfg.overrides.freq_train_model)
    )
    updates_made = 0
    env_steps = 0
    best_eval_reward = -np.inf
    epoch = 0
    sac_buffer: Optional[DeviceReplayBuffer] = None
    sac_buf_state = None
    rollout_prog: Optional[_ImaginedRolloutProgram] = None
    real_snapshot = None  # device copy of the real buffer for mixed batches
    real_ratio = cfg.algorithm.get("real_data_ratio", 0.0)
    sac_batch_size = cfg.overrides.sac_batch_size
    num_sac_updates = cfg.overrides.num_sac_updates_per_step
    checkpoint_every = cfg.get("checkpoint_every", 0)
    # Fully on-device model training (ModelTrainer.train_device): ONE dispatch
    # per retraining against an incrementally-synced device dataset, instead of
    # re-uploading the whole buffer every epoch. Default on; the host-iterator
    # path remains for debugging/parity checks.
    device_training = cfg.algorithm.get("device_model_training", True)
    device_dataset = (
        DeviceTransitionDataset(obs_dim, act_dim) if device_training else None
    )
    # Host-tracked LOWER BOUND on the device SAC buffer's row count (the exact
    # count lives on device; fetching it would sync every step). The first step
    # of every imagined rollout writes all `rollout_batch_size` rows (all
    # particles start alive), so this bound certifies `enough_data` without a
    # device round trip.
    sac_buf_known_min = 0
    # device-resident PRNG key for the fused sample+update program (carried and
    # returned on device, so the update path is pure enqueue)
    key, k_upd_init = jax.random.split(key)
    upd_key = _rep(k_upd_init)

    if resume_snap is not None:
        model_state = resume_snap["model_state"]
        sac_state = _rep(resume_snap["sac_state"])
        if pctx is not None:
            model_state = pctx.shard_model_state(len(dynamics_model), model_state)
        agent.set_state(sac_state)
        key = resume_snap["key"]
        upd_key = resume_snap.get("upd_key", upd_key)
        env_steps = int(resume_snap["env_steps"])
        epoch = int(resume_snap["epoch"])
        updates_made = int(resume_snap["updates_made"])
        _ber = resume_snap["best_eval_reward"]
        best_eval_reward = -np.inf if _ber is None else float(_ber)
        print(f"Resumed at env step {env_steps} (epoch {epoch}).")

    while env_steps < cfg.overrides.num_steps:
        rollout_length = int(
            truncated_linear(*(list(cfg.overrides.rollout_schedule) + [epoch + 1]))
        )
        sac_buffer_capacity = (
            rollout_length * rollout_batch_size * trains_per_epoch
            * cfg.overrides.num_epochs_to_retain_sac_buffer
        )
        if sac_buffer is None or sac_buffer.capacity != sac_buffer_capacity:
            sac_buffer, sac_buf_state = maybe_replace_sac_buffer(
                sac_buffer, sac_buf_state, obs_dim, act_dim, sac_buffer_capacity
            )
            sac_buf_known_min = min(sac_buf_known_min, sac_buffer.capacity)
            sac_buf_state = _rep(sac_buf_state)
            rollout_prog = _ImaginedRolloutProgram(
                model_env, sac, sac_buffer, cfg.algorithm.sac_samples_action
            )

        obs = None
        terminated = truncated = False
        steps_epoch = 0
        while steps_epoch < cfg.overrides.epoch_length:
            if collector is None:
                if steps_epoch == 0 or terminated or truncated:
                    obs, _ = env.reset()
                    terminated = truncated = False
                next_obs, reward, terminated, truncated, _ = (
                    util_common.step_env_and_add_to_buffer(
                        env, obs, agent, {"sample": True}, replay_buffer
                    )
                )
                step_delta = 1
            else:
                # batched collection: one policy dispatch steps this process's
                # whole worker slice; transitions land in the local shard
                w_actions = np.atleast_2d(
                    np.asarray(
                        agent.act(collector.current_obs, sample=True, batched=True)
                    )
                )
                w_obs, w_next, w_rew, w_term, w_trunc = collector.step(w_actions)
                replay_buffer.add_batch(
                    w_obs, w_actions, w_next, w_rew, w_term, w_trunc
                )
                next_obs = None
                # env_steps advances by the GLOBAL pool width: every process
                # runs the same batched step, so budgets/cadences stay
                # process-count invariant (r3 advice)
                step_delta = collector.num_workers_total

            def _crosses(freq: int) -> bool:
                # cadence check that stays correct when a batched step advances
                # env_steps by more than 1
                return (env_steps + step_delta) // freq > env_steps // freq

            # --------------- model training + imagined rollouts ---------------
            if _crosses(cfg.overrides.freq_train_model):
                if device_training:
                    model_state = dynamics_model.update_normalizer_host(
                        model_state, replay_buffer.get_all()
                    )
                    device_dataset.sync_from(replay_buffer)
                    if pctx is not None:
                        pctx.shard_dataset(device_dataset)
                    model_state, _, _ = model_trainer.train_device(
                        model_state,
                        device_dataset,
                        batch_size=cfg.overrides.model_batch_size,
                        val_ratio=cfg.overrides.validation_ratio,
                        num_epochs=cfg.overrides.get("num_epochs_train_model", None),
                        patience=cfg.overrides.get("patience", 1),
                        improvement_threshold=cfg.overrides.get(
                            "improvement_threshold", 0.01
                        ),
                    )
                else:
                    model_state = util_common.train_model_and_save_model_and_data(
                        dynamics_model, model_state, model_trainer,
                        cfg.overrides, replay_buffer, work_dir=work_dir,
                    )
                if device_training and pctx is not None:
                    model_state = pctx.shard_model_state(
                        len(dynamics_model), model_state
                    )
                initial_obs = jnp.asarray(
                    replay_buffer.sample(rollout_batch_size).obs, jnp.float32
                )
                key, k_roll = jax.random.split(key)
                if pctx is not None:
                    if rollout_batch_size % pctx.mesh.shape["data"] == 0:
                        initial_obs = jax.device_put(
                            initial_obs, pctx.row_sharding()
                        )
                    k_roll = _rep(k_roll)
                sac_buf_state = rollout_prog.run(
                    model_state, sac_state.policy, sac_buf_state,
                    initial_obs, k_roll, rollout_length,
                )
                sac_buf_known_min = min(
                    sac_buffer.capacity, sac_buf_known_min + rollout_batch_size
                )
                if real_ratio > 0:
                    all_real = replay_buffer.get_all()
                    real_snapshot = (
                        jnp.asarray(all_real.obs, jnp.float32),
                        jnp.asarray(all_real.act, jnp.float32),
                        jnp.asarray(all_real.next_obs, jnp.float32),
                        jnp.asarray(all_real.rewards, jnp.float32).reshape(-1, 1),
                        1.0 - jnp.asarray(all_real.terminateds, jnp.float32).reshape(-1, 1),
                    )
                if checkpoint_every and _crosses(checkpoint_every):
                    ckpt.save_checkpoint(
                        work_dir,
                        {
                            "model_state": model_state,
                            "sac_state": sac_state,
                            "key": key,
                            "upd_key": upd_key,
                            "env_steps": env_steps,
                            "epoch": epoch,
                            "updates_made": updates_made,
                            # None before the first eval: the NaN-refusing
                            # validator must not mistake the -inf sentinel
                            # for divergence
                            "best_eval_reward": (
                                float(best_eval_reward)
                                if np.isfinite(best_eval_reward)
                                else None
                            ),
                        },
                        step=env_steps,
                    )
                    if device_training:
                        # the host path saves per retraining inside
                        # train_model_and_save_model_and_data; here model +
                        # buffer snapshots ride the checkpoint cadence instead
                        dynamics_model.save(model_state, str(work_dir))
                        replay_buffer.save(work_dir)
                if debug_mode:
                    print(
                        f"Epoch: {epoch}. SAC buffer: {int(sac_buf_state.num_stored)}. "
                        f"Rollout length: {rollout_length}. Steps: {env_steps}"
                    )

            # --------------- SAC updates (one enqueued program) ---------------
            enough_data = sac_buf_known_min >= sac_batch_size
            upd_freq = cfg.overrides.sac_updates_every_steps
            # batched collection parity: a W-wide step crosses the update
            # cadence up to W/upd_freq times; run that many update bundles so
            # updates-per-env-step matches the reference's single-env loop
            n_crossings = (env_steps + step_delta) // upd_freq - env_steps // upd_freq
            n_updates_now = num_sac_updates * n_crossings
            if num_sac_updates > 0 and n_crossings > 0 and enough_data:
                if real_ratio > 0 and real_snapshot is not None:
                    key, k_batches, k_real, k_mix = jax.random.split(key, 4)
                    batches = sac_buffer.sample_many(
                        sac_buf_state, k_batches, n_updates_now, sac_batch_size
                    )
                    n_real = real_snapshot[0].shape[0]
                    ridx = jax.random.randint(
                        k_real, (n_updates_now, sac_batch_size), 0, n_real
                    )
                    real_batches = tuple(arr[ridx] for arr in real_snapshot)
                    use_real = (
                        jax.random.uniform(k_mix, (n_updates_now,)) < real_ratio
                    )
                    sel = use_real[:, None, None]
                    batches = tuple(
                        jnp.where(sel, rb, ib) for rb, ib in zip(real_batches, batches)
                    )
                    key, k_upd = jax.random.split(key)
                    sac_state, metrics = sac.update_many(sac_state, batches, k_upd)
                else:
                    # fused sample+update: ONE device call, no host round trips
                    # (the PRNG key is carried on device)
                    sac_state, upd_key, _ = sac.update_from_buffer(
                        sac_state, sac_buf_state, upd_key,
                        num_updates=n_updates_now, batch_size=sac_batch_size,
                    )
                agent.set_state(sac_state)
                updates_made += n_updates_now
                if logger is not None and updates_made % cfg.log_frequency_agent < n_updates_now:
                    logger.dump(updates_made, save=True)

            # --------------- epoch end: evaluate + checkpoint ---------------
            if _crosses(cfg.overrides.epoch_length):
                avg_reward = evaluate(
                    test_env, agent, cfg.algorithm.num_eval_episodes,
                    video_recorder=video_recorder,
                )
                if video_recorder is not None:
                    video_recorder.save(f"{epoch}.mp4")
                if logger is not None:
                    logger.log_data(
                        mbrl_tpu.constants.RESULTS_LOG_NAME,
                        {
                            "epoch": epoch,
                            "env_step": env_steps,
                            "episode_reward": avg_reward,
                            "rollout_length": rollout_length,
                        },
                    )
                if avg_reward > best_eval_reward:
                    best_eval_reward = avg_reward
                    sac.save_checkpoint(
                        sac_state, os.path.join(work_dir, "sac.pkl")
                    )
                epoch += 1

            env_steps += step_delta
            steps_epoch += step_delta
            obs = next_obs
    if collector is not None:
        collector.close()
    return np.float32(best_eval_reward)
