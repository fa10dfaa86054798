"""PlaNet training loop (Hafner et al., 2019).

Capability parity with the reference ``mbrl/algorithms/planet.py:35-194``: collect
initial random trajectories -> per episode: train the RSSM for ``num_grad_updates``
sequence batches (B=50, L=50 in the paper config) -> collect one episode acting with
CEM in latent space, updating the model's posterior each real step and adding
exploration noise except on test episodes.

TPU notes: the per-episode training epoch is one jitted scan over stacked sequence
batches (ModelTrainer); latent CEM planning is the jitted ModelEnv program; only the
env stepping and posterior bookkeeping run per-step on the host.
"""
from __future__ import annotations

import os
import pathlib
from typing import List, Optional, Union

import gymnasium as gym
import jax
import numpy as np

import mbrl_tpu.constants
from mbrl_tpu.config import Config, complete_agent_cfg, instantiate
from mbrl_tpu.envs.termination_fns import no_termination
from mbrl_tpu.models import ModelEnv, ModelTrainer
from mbrl_tpu.planning import RandomAgent, create_trajectory_optim_agent_for_model
from mbrl_tpu.util import checkpoint as ckpt
from mbrl_tpu.util import common as util_common
from mbrl_tpu.util.logger import Logger
from mbrl_tpu.util.runlock import run_lock

METRICS_LOG_FORMAT = [
    ("observations_loss", "OL", "float"),
    ("reward_loss", "RL", "float"),
    ("gradient_norm", "GN", "float"),
    ("kl_loss", "KL", "float"),
]


def train(
    env: gym.Env,
    cfg: Config,
    silent: bool = False,
    work_dir: Union[Optional[str], pathlib.Path] = None,
) -> np.float32:
    # one trainer per work dir (util/runlock.py)
    with run_lock(work_dir if work_dir is not None else os.getcwd()):
        return _train_impl(env, cfg, silent, work_dir)


def _train_impl(
    env: gym.Env,
    cfg: Config,
    silent: bool = False,
    work_dir: Union[Optional[str], pathlib.Path] = None,
) -> np.float32:
    debug_mode = cfg.get("debug_mode", False)

    if work_dir is None:
        work_dir = os.getcwd()
    work_dir = pathlib.Path(work_dir)

    logger = None
    if not silent:
        print(f"Results will be saved at {work_dir}.")
        logger = Logger(work_dir)
        logger.register_group("metrics", METRICS_LOG_FORMAT, color="yellow")
        logger.register_group(
            mbrl_tpu.constants.RESULTS_LOG_NAME,
            [
                ("env_step", "S", "int"),
                ("train_episode_reward", "RT", "float"),
                ("episode_reward", "ET", "float"),
            ],
            color="green",
        )

    key = jax.random.PRNGKey(cfg.seed or 0)
    np_rng = np.random.default_rng(seed=cfg.seed)

    # Replay buffer with trajectory tracking + initial random data
    replay_buffer = util_common.create_replay_buffer(
        cfg,
        env.observation_space.shape,
        env.action_space.shape,
        obs_type=np.uint8 if len(env.observation_space.shape) == 3 else np.float32,
        collect_trajectories=True,
        rng=np_rng,
    )
    # mid-run resume (PETS/MBPO-style full-state checkpoints; the reference has
    # no mid-run resume at all, SURVEY.md §5.4)
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
            cfg.algorithm.num_initial_trajectories,
            RandomAgent(env),
            agent_kwargs={},
            replay_buffer=replay_buffer,
            collect_full_trajectories=True,
            trial_length=cfg.overrides.trial_length,
            agent_uses_low_dim_obs=False,
        )

    # PlaNet model
    cfg.dynamics_model["action_size"] = env.action_space.shape[0]
    planet = instantiate(cfg.dynamics_model)
    key, k_init = jax.random.split(key)
    planet_state = planet.init(k_init)
    # optional mesh sharding (`parallel=mesh`): RSSM params replicate (E=1; use
    # parallel.model_axis_size=1 so the data axis gets every chip), training
    # window rows and latent planning particles shard over the data axis
    from mbrl_tpu.parallel import make_parallel_context

    pctx = make_parallel_context(cfg)
    if pctx is not None:
        planet_state = {
            **planet_state,
            "params": jax.device_put(planet_state["params"], pctx.replicated()),
        }
    model_env = ModelEnv(
        planet,
        no_termination,
        None,
        particle_sharding=pctx.particle_sharding() if pctx else None,
    )
    trainer = ModelTrainer(
        planet, logger=logger, optim_lr=1e-3, optim_eps=1e-4, parallel_ctx=pctx
    )

    # Latent-space CEM agent
    agent_cfg = complete_agent_cfg(env, cfg.algorithm.agent)
    agent = instantiate(agent_cfg, seed=(cfg.seed or 0) + 1)
    agent = create_trajectory_optim_agent_for_model(model_env, agent)
    agent.set_eval_state(planet_state)

    # Metric accumulation via trainer batch callback
    rec_losses: List[float] = []
    reward_losses: List[float] = []
    kl_losses: List[float] = []
    grad_norms: List[float] = []

    def batch_callback(_epoch, _loss, meta, _mode):
        if meta:
            rec_losses.append(float(meta["observations_loss"]))
            reward_losses.append(float(meta["reward_loss"]))
            kl_losses.append(float(meta["kl_loss"]))
            grad_norms.append(float(meta.get("grad_norm", 0.0)))

    def is_test_episode(episode):
        return episode % cfg.algorithm.test_frequency == 0

    # fully on-device RSSM training: device-resident uint8 pixel dataset with
    # window sampling INSIDE the jitted program. The host-iterator path stacks
    # all num_grad_updates (B, L, C, H, W) batches on device up front (~12 GB at
    # the reference config — past a v5e's HBM); here only the 1-byte/texel
    # dataset plus one batch's float pixels are ever live.
    device_training = cfg.algorithm.get("device_model_training", True)
    obs_shape = env.observation_space.shape
    device_dataset = None
    if device_training:
        from mbrl_tpu.util.device_buffer import DeviceTransitionDataset

        device_dataset = DeviceTransitionDataset(
            obs_shape,
            env.action_space.shape[0],
            obs_dtype=(np.uint8 if len(obs_shape) == 3 else np.float32),
        )

    def _valid_window_starts(seq_len: int) -> np.ndarray:
        spans = replay_buffer.trajectory_indices or []
        starts = [
            np.arange(lo, hi - seq_len + 1, dtype=np.int32)
            for lo, hi in spans
            if hi - lo >= seq_len
        ]
        return (
            np.concatenate(starts) if starts else np.zeros((0,), np.int32)
        )

    step = replay_buffer.num_stored
    total_rewards = 0.0
    start_episode = 0
    if resume_snap is not None:
        planet_state = resume_snap["planet_state"]
        key = resume_snap["key"]
        start_episode = int(resume_snap["episode"])
        step = int(resume_snap["step"])
        total_rewards = float(resume_snap["total_rewards"])
        agent.set_eval_state(planet_state)
        print(f"Resumed at episode {start_episode} (env step {step}).")
    checkpoint_every = int(cfg.get("checkpoint_every", 0))
    for episode in range(start_episode, cfg.algorithm.num_episodes):
        # --------------- train the RSSM ---------------
        key, k_train = jax.random.split(key)
        if device_training:
            device_dataset.sync_from(replay_buffer)
            if pctx is not None:
                # dataset rows replicate (windows gather across row shards);
                # the gathered batch is row-sharded inside the program
                device_dataset.data = jax.device_put(
                    device_dataset.data, pctx.replicated()
                )
            starts = _valid_window_starts(cfg.overrides.sequence_length)
            planet_state, _ = trainer.train_device_sequences(
                planet_state,
                device_dataset,
                starts,
                num_updates=cfg.overrides.num_grad_updates,
                batch_size=cfg.overrides.batch_size,
                seq_len=cfg.overrides.sequence_length,
                key=k_train,
                batch_callback=batch_callback,
            )
        else:
            dataset, _ = util_common.get_sequence_buffer_iterator(
                replay_buffer,
                cfg.overrides.batch_size,
                0,  # no validation data
                cfg.overrides.sequence_length,
                max_batches_per_loop_train=cfg.overrides.num_grad_updates,
                use_simple_sampler=True,
            )
            planet_state, _, _ = trainer.train(
                planet_state,
                dataset,
                num_epochs=1,
                batch_callback=batch_callback,
                evaluate=False,
                key=k_train,
            )
        agent.set_eval_state(planet_state)
        if not silent:
            print(f"episode {episode}: RSSM trained", flush=True)
        planet.save(planet_state, work_dir)
        if not silent:
            print(f"episode {episode}: params saved", flush=True)
        if cfg.overrides.get("save_replay_buffer", False):
            replay_buffer.save(work_dir)
        if logger is not None:
            logger.log_data(
                "metrics",
                {
                    "observations_loss": float(np.mean(rec_losses)) if rec_losses else 0,
                    "reward_loss": float(np.mean(reward_losses)) if reward_losses else 0,
                    "gradient_norm": float(np.mean(grad_norms)) if grad_norms else 0,
                    "kl_loss": float(np.mean(kl_losses)) if kl_losses else 0,
                },
            )
        for c in (rec_losses, reward_losses, kl_losses, grad_norms):
            c.clear()

        # --------------- collect one episode ---------------
        episode_reward = 0.0
        if not silent:
            import time as _time

            _ep_t0 = _time.time()
        obs, _ = env.reset()
        agent.reset()
        planet_state = planet.reset_posterior(planet_state)
        action = None
        terminated = truncated = False
        steps_in_trial = 0
        while not terminated and not truncated:
            key, k_post = jax.random.split(key)
            planet_state = planet.update_posterior(
                planet_state, obs, action=action, key=k_post
            )
            agent.set_eval_state(planet_state)
            action_noise = (
                0
                if is_test_episode(episode)
                else cfg.algorithm.action_noise_std
                * np_rng.standard_normal(env.action_space.shape[0])
            )
            action = agent.act(obs) + action_noise
            action = np.clip(action, -1.0, 1.0).astype(env.action_space.dtype)
            next_obs, reward, terminated, truncated, _ = env.step(action)
            # manual trial-length truncation must be stored WITH the transition so
            # the trajectory-tracking buffer closes the segment
            trial_length = cfg.overrides.get("trial_length", None)
            if trial_length and steps_in_trial + 1 >= trial_length:
                truncated = True
            replay_buffer.add(obs, action, next_obs, reward, terminated, truncated)
            episode_reward += reward
            obs = next_obs
            if debug_mode:
                print(f"step: {step}, reward: {reward}.")
            step += 1
            steps_in_trial += 1
        total_rewards += episode_reward
        if not silent:
            print(
                f"episode {episode}: reward {episode_reward:.1f} "
                f"({_time.time() - _ep_t0:.1f}s, step {step})",
                flush=True,
            )
        if logger is not None:
            logger.log_data(
                mbrl_tpu.constants.RESULTS_LOG_NAME,
                {
                    "episode_reward": episode_reward * is_test_episode(episode),
                    "train_episode_reward": episode_reward
                    * (1 - is_test_episode(episode)),
                    "env_step": step,
                },
            )
        if checkpoint_every and (episode + 1) % checkpoint_every == 0:
            ckpt.save_checkpoint(
                work_dir,
                {
                    "planet_state": planet_state,
                    "key": key,
                    "episode": episode + 1,
                    "step": step,
                    "total_rewards": total_rewards,
                },
                step=episode + 1,
            )
            replay_buffer.save(work_dir)

    return np.float32(total_rewards / cfg.algorithm.num_episodes)
