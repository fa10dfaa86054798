"""PETS: Probabilistic Ensembles with Trajectory Sampling (Chua et al., 2018).

Capability parity with the reference ``mbrl/algorithms/pets.py:24-145``: seed the
buffer with random exploration, then loop — retrain the ensemble every
``freq_train_model`` env steps, and act via CEM/iCEM/MPPI MPC over the learned
model's imagined rollouts. Returns the maximum episode reward observed.

TPU re-design: all per-step planning compute (the full CEM loop over imagined
rollouts) is one jitted on-device program; the host loop only steps the real env and
feeds the replay buffer. The agent's objective closes over the model wrapper STATE
pytree, refreshed via ``set_eval_state`` after each retraining.
"""
from __future__ import annotations

import os
import pathlib
from typing import Optional

import jax
import numpy as np

import mbrl_tpu.constants
from mbrl_tpu.config import Config, complete_agent_cfg, create_one_dim_tr_model, instantiate
from mbrl_tpu.util import checkpoint as ckpt
from mbrl_tpu.models import ModelEnv, ModelTrainer
from mbrl_tpu.parallel import make_parallel_context
from mbrl_tpu.planning import RandomAgent, create_trajectory_optim_agent_for_model
from mbrl_tpu.util import common as util_common
from mbrl_tpu.util.logger import Logger
from mbrl_tpu.util.runlock import run_lock

EVAL_LOG_FORMAT = mbrl_tpu.constants.EVAL_LOG_FORMAT


def train(
    env,
    termination_fn,
    reward_fn,
    cfg: Config,
    silent: bool = False,
    work_dir: Optional[str] = None,
) -> np.float32:
    # one trainer per work dir: a second concurrent process would interleave
    # checkpoints/results rows from a diverging lineage (util/runlock.py)
    with run_lock(work_dir or os.getcwd()):
        return _train_impl(env, termination_fn, reward_fn, cfg, silent, work_dir)


def _train_impl(
    env,
    termination_fn,
    reward_fn,
    cfg: Config,
    silent: bool = False,
    work_dir: Optional[str] = None,
) -> np.float32:
    debug_mode = cfg.get("debug_mode", False)

    obs_shape = env.observation_space.shape
    act_shape = env.action_space.shape

    rng = np.random.default_rng(seed=cfg.seed)
    key = jax.random.PRNGKey(cfg.seed or 0)

    work_dir = work_dir or os.getcwd()
    logger = None
    if not silent:
        print(f"Results will be saved at {work_dir}.")
        logger = Logger(work_dir)
        logger.register_group(
            mbrl_tpu.constants.RESULTS_LOG_NAME, EVAL_LOG_FORMAT, color="green"
        )

    # -------- Create and populate initial env dataset --------
    dynamics_model = create_one_dim_tr_model(cfg, obs_shape, act_shape)
    key, k_init = jax.random.split(key)
    model_state = dynamics_model.init(k_init)
    use_double_dtype = cfg.algorithm.get("normalize_double_precision", False)
    dtype = np.double if use_double_dtype else np.float32
    replay_buffer = util_common.create_replay_buffer(
        cfg,
        obs_shape,
        act_shape,
        rng=rng,
        obs_type=dtype,
        action_type=dtype,
        reward_type=dtype,
    )
    resume_snap = None
    if cfg.get("resume", False):
        latest = ckpt.latest_checkpoint(work_dir)
        if latest is not None:
            resume_snap = ckpt.restore_checkpoint(latest)
            replay_buffer.load(work_dir)
            print(f"Resuming from {latest}; skipping initial exploration.")
    if resume_snap is None:
        util_common.rollout_agent_trajectories(
            env,
            cfg.algorithm.initial_exploration_steps,
            RandomAgent(env),
            {},
            replay_buffer=replay_buffer,
        )
        replay_buffer.save(work_dir)

    # ---------- Create model environment and agent -----------
    # optional mesh sharding from the `parallel:` config group: ensemble params
    # over the model axis, planning particles + training rows over the data axis
    pctx = make_parallel_context(cfg)
    if pctx is not None:
        model_state = pctx.shard_model_state(len(dynamics_model), model_state)
    model_env = ModelEnv(
        dynamics_model,
        termination_fn,
        reward_fn,
        particle_sharding=pctx.particle_sharding() if pctx else None,
    )
    model_trainer = ModelTrainer(
        dynamics_model,
        optim_lr=cfg.overrides.model_lr,
        weight_decay=cfg.overrides.model_wd,
        logger=logger,
        parallel_ctx=pctx,
    )
    agent_cfg = complete_agent_cfg(env, cfg.algorithm.agent)
    agent = instantiate(agent_cfg, seed=(cfg.seed or 0) + 1)
    agent = create_trajectory_optim_agent_for_model(
        model_env, agent, num_particles=cfg.algorithm.num_particles
    )
    agent.set_eval_state(model_state)
    # TPU perf knob: planning PRNG implementation ("rbg" = cheap counter-based
    # bits; threefry sampling is a measured ~45% of a rollout step)
    prng_impl = cfg.algorithm.get("planning_prng_impl", None)
    if prng_impl:
        agent.use_prng_impl(prng_impl)

    # Fully on-device model retraining (ModelTrainer.train_device): ONE
    # dispatch per retraining against an incrementally-synced device dataset
    # (same path MBPO uses) — the host-iterator path re-uploads the growing
    # buffer every epoch, which dominates over a remote-device link.
    device_training = cfg.algorithm.get("device_model_training", True)
    device_dataset = None
    if device_training:
        from mbrl_tpu.util.device_buffer import DeviceTransitionDataset

        device_dataset = DeviceTransitionDataset(obs_shape[0], act_shape[0])

    def retrain_model(model_state):
        if not device_training:
            return util_common.train_model_and_save_model_and_data(
                dynamics_model, model_state, model_trainer,
                cfg.overrides, replay_buffer, work_dir=work_dir,
            )
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
            improvement_threshold=cfg.overrides.get("improvement_threshold", 0.01),
        )
        if pctx is not None:
            model_state = pctx.shard_model_state(len(dynamics_model), model_state)
        dynamics_model.save(model_state, str(work_dir))
        replay_buffer.save(work_dir)
        return model_state

    # optional batched/multi-host collection: this process's slice of the env
    # worker pool, fed by BATCHED MPC planning (act_batch — one program plans
    # all local workers' actions; the reference plans one obs at a time)
    from mbrl_tpu.parallel.distributed_collect import maybe_make_collector

    # reject pools wider than the retrain cadence BEFORE spawning workers
    # (a batched step would cross freq_train_model more than once)
    _wg = int(cfg.overrides.get("num_env_workers", 0) or 0)
    if _wg > cfg.algorithm.freq_train_model:
        raise ValueError(
            f"num_env_workers={_wg} exceeds freq_train_model="
            f"{cfg.algorithm.freq_train_model}: a single batched step would "
            "cross the retrain cadence more than once; lower the pool width"
        )
    collector = maybe_make_collector(cfg, seed=(cfg.seed or 0) + 100)

    # --------------------- Training Loop ---------------------
    env_steps = 0
    current_trial = 0
    max_total_reward = -np.inf

    # mid-run resume: restore model/planner state + counters from the newest
    # checkpoint in the work dir (reference has no mid-run resume; SURVEY.md §5.4)
    if resume_snap is not None:
        model_state = resume_snap["model_state"]
        if pctx is not None:
            model_state = pctx.shard_model_state(len(dynamics_model), model_state)
        key = resume_snap["key"]
        env_steps = int(resume_snap["env_steps"])
        current_trial = int(resume_snap["current_trial"])
        _mtr = resume_snap["max_total_reward"]
        max_total_reward = -np.inf if _mtr is None else float(_mtr)
        agent.set_eval_state(model_state)
        print(f"Resumed at env step {env_steps}.")
    checkpoint_every = cfg.get("checkpoint_every", 0)

    if collector is not None:
        # ---------------- batched worker-pool collection ----------------
        # W parallel trials; retraining triggers on env-step cadence crossings.
        # env_steps counts GLOBAL steps (every process's workers) so step
        # budgets and cadences are invariant to the process count (r3 advice).
        w = collector.num_local_workers
        wg = collector.num_workers_total
        # the single-env loop truncates trials at overrides.trial_length; the
        # batched loop must too — shipped configs (pets_halfcheetah etc.) have
        # no TimeLimit wrapper and never terminate on their own (r3 advice)
        trial_length = int(cfg.overrides.get("trial_length", 0) or 0)
        rewards_acc = np.zeros(w)
        steps_in_trial = np.zeros(w, np.int64)
        dones_mask = np.ones(w, bool)  # replan everyone on the first step
        while env_steps < cfg.overrides.num_steps:
            if (env_steps // cfg.algorithm.freq_train_model) != (
                (env_steps + wg) // cfg.algorithm.freq_train_model
            ) or env_steps == 0:
                model_state = retrain_model(model_state)
                agent.set_eval_state(model_state)
            # checkpoint crossings are independent of retrain crossings
            if checkpoint_every and env_steps and (
                (env_steps // checkpoint_every)
                != ((env_steps + wg) // checkpoint_every)
            ):
                ckpt.save_checkpoint(
                    work_dir,
                    {
                        "model_state": model_state,
                        "key": key,
                        "env_steps": env_steps,
                        "current_trial": current_trial,
                        # None while no episode has finished: the
                        # NaN-refusing validator must not mistake the
                        # -inf sentinel for divergence
                        "max_total_reward": (
                            float(max_total_reward)
                            if np.isfinite(max_total_reward)
                            else None
                        ),
                    },
                    step=env_steps,
                )
            actions = agent.act(
                collector.current_obs, batched=True, reset_mask=dones_mask
            )
            obs_b, next_b, rew_b, term_b, trunc_b = collector.step(actions)
            steps_in_trial += 1
            if trial_length:
                timeout = (steps_in_trial >= trial_length) & ~(term_b | trunc_b)
                if timeout.any():
                    trunc_b = trunc_b | timeout
                    collector.reset_workers(np.flatnonzero(timeout))
            replay_buffer.add_batch(obs_b, actions, next_b, rew_b, term_b, trunc_b)
            rewards_acc += rew_b
            dones_mask = term_b | trunc_b
            steps_in_trial[dones_mask] = 0
            for i in np.flatnonzero(dones_mask):
                total_reward = float(rewards_acc[i])
                rewards_acc[i] = 0.0
                current_trial += 1
                max_total_reward = max(max_total_reward, total_reward)
                if logger is not None:
                    logger.log_data(
                        mbrl_tpu.constants.RESULTS_LOG_NAME,
                        {"env_step": env_steps, "episode_reward": total_reward},
                    )
            env_steps += wg
        collector.close()
        return np.float32(max_total_reward)

    while env_steps < cfg.overrides.num_steps:
        obs, _ = env.reset()
        agent.reset()
        terminated = False
        truncated = False
        total_reward = 0.0
        steps_trial = 0
        while not terminated and not truncated:
            if env_steps % cfg.algorithm.freq_train_model == 0:
                model_state = retrain_model(model_state)
                if pctx is not None and not device_training:
                    model_state = pctx.shard_model_state(
                        len(dynamics_model), model_state
                    )
                agent.set_eval_state(model_state)
            # checkpoint cadence is independent of the retrain cadence
            if checkpoint_every and env_steps and env_steps % checkpoint_every == 0:
                ckpt.save_checkpoint(
                    work_dir,
                    {
                        "model_state": model_state,
                        "key": key,
                        "env_steps": env_steps,
                        "current_trial": current_trial,
                        # None while no episode has finished: the
                        # NaN-refusing validator must not mistake the
                        # -inf sentinel for divergence
                        "max_total_reward": (
                            float(max_total_reward)
                            if np.isfinite(max_total_reward)
                            else None
                        ),
                    },
                    step=env_steps,
                )

            next_obs, reward, terminated, truncated, _ = (
                util_common.step_env_and_add_to_buffer(
                    env, obs, agent, {}, replay_buffer
                )
            )
            obs = next_obs
            total_reward += reward
            steps_trial += 1
            env_steps += 1
            if cfg.overrides.get("trial_length", None) and steps_trial >= cfg.overrides.trial_length:
                truncated = True
            if debug_mode:
                print(f"Step {env_steps}: Reward {reward:.3f}.")
        if logger is not None:
            logger.log_data(
                mbrl_tpu.constants.RESULTS_LOG_NAME,
                {"env_step": env_steps, "episode_reward": total_reward},
            )
        current_trial += 1
        if debug_mode:
            print(f"Trial: {current_trial}, reward: {total_reward}.")
        max_total_reward = max(max_total_reward, total_reward)

    return np.float32(max_total_reward)
