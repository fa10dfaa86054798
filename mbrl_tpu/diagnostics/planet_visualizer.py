"""PlaNet visualizer: side-by-side video of real pixels vs. open-loop RSSM predictions.

Capability parity with the reference ``mbrl/diagnostics/planet_visualizer.py``
(PlanetVisualizer:23-184): load a trained PlaNet run, act in the real env with the
latent CEM agent for ``start_step + lookahead`` steps, then replay the recorded
action sequence open-loop through the learned PRIOR starting from the posterior at
``start_step``, decode every imagined latent to pixels, and write a
``pred | true`` comparison GIF plus the true vs. predicted total reward.

TPU notes (design deltas from the reference, which are improvements not gaps):
  - the posterior is conditioned per real step exactly as in training
    (``algorithms/planet.py`` episode loop); the reference visualizer skips
    ``update_posterior`` so its agent plans from a stale latent.
  - the open-loop replay snapshots the tracked posterior at ``start_step`` so the
    prediction branch starts from the same information state the agent had.
  - prior stepping + decoding run as jitted programs batched over the whole
    lookahead where possible (decode is batched over all frames at once).
"""
from __future__ import annotations

import argparse
import pathlib
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from mbrl_tpu.config import Config, complete_agent_cfg, instantiate
from mbrl_tpu.diagnostics.common import load_run_config
from mbrl_tpu.envs.termination_fns import no_termination
from mbrl_tpu.models import ModelEnv
from mbrl_tpu.planning import create_trajectory_optim_agent_for_model
from mbrl_tpu.util.env import create_handler


class PlanetVisualizer:
    def __init__(
        self,
        start_step: int,
        lookahead: int,
        model_dir: str,
        seed: int = 0,
        num_iterations: int = 10,
        population_size: int = 1000,
        planning_horizon: int = 12,
        env=None,
    ):
        self.start_step = start_step
        self.lookahead = lookahead
        self.seed = seed
        self.model_dir = pathlib.Path(model_dir)
        self.vis_dir = self.model_dir / "diagnostics"
        self.vis_dir.mkdir(parents=True, exist_ok=True)

        self.cfg = load_run_config(model_dir)
        if env is None:
            handler = create_handler(self.cfg)
            env, _, _ = handler.make_env(self.cfg)
        self.env = env

        self.cfg.dynamics_model["action_size"] = self.env.action_space.shape[0]
        self.planet = instantiate(self.cfg.dynamics_model)
        self.planet_state = self.planet.init(jax.random.PRNGKey(seed))
        self.planet_state = self.planet.load(self.planet_state, self.model_dir)
        self.model_env = ModelEnv(self.planet, no_termination, None)

        # latent-space CEM agent with the reference visualizer's planner settings
        # (planet_visualizer.py:78-98): CEM 10 iters x pop 1000, horizon 12,
        # replan_freq 1, mean-of-elites
        agent_cfg = complete_agent_cfg(
            self.env,
            Config({
                "_target_": "mbrl_tpu.planning.TrajectoryOptimizerAgent",
                "action_lb": "???",
                "action_ub": "???",
                "planning_horizon": planning_horizon,
                "optimizer": {
                    "_target_": "mbrl_tpu.planning.CEMOptimizer",
                    "num_iterations": num_iterations,
                    "elite_ratio": 0.1,
                    "population_size": population_size,
                    "alpha": 0.1,
                    "lower_bound": "???",
                    "upper_bound": "???",
                    "return_mean_elites": True,
                },
                "replan_freq": 1,
                "keep_last_solution": False,
                "verbose": True,
            }),
        )
        self.agent = instantiate(agent_cfg, seed=seed + 1)
        self.agent = create_trajectory_optim_agent_for_model(
            self.model_env, self.agent
        )

    def run(self) -> None:
        key = jax.random.PRNGKey(self.seed)
        true_obs: list = []
        actions: list = []
        true_total_reward = 0.0
        snapshot_state = None

        obs, _ = self.env.reset(seed=self.seed)
        self.agent.reset()
        state = self.planet.reset_posterior(self.planet_state)
        action = None
        for step in range(self.start_step + self.lookahead):
            key, k_post = jax.random.split(key)
            state = self.planet.update_posterior(state, obs, action=action, key=k_post)
            self.agent.set_eval_state(state)
            if step == self.start_step:
                snapshot_state = state
            action = np.clip(
                np.asarray(self.agent.act(obs)), -1.0, 1.0
            ).astype(self.env.action_space.dtype)
            next_obs, reward, terminated, truncated, _ = self.env.step(action)
            if step >= self.start_step:
                true_obs.append(np.asarray(obs))
                actions.append(action)
                true_total_reward += float(reward)
            obs = next_obs
            if terminated or truncated:
                break
        if snapshot_state is None:
            snapshot_state = state

        # open-loop prior replay from the start_step posterior (batch of 1)
        model_state = {
            "latent": snapshot_state["posterior"]["latent"],
            "belief": snapshot_state["posterior"]["belief"],
        }
        latents = [model_state["latent"]]
        beliefs = [model_state["belief"]]
        pred_total_reward = 0.0
        for i, a in enumerate(actions):
            key, k_step = jax.random.split(key)
            act = jnp.asarray(a, jnp.float32).reshape(1, -1)
            _, reward, model_state = self.planet.sample(
                snapshot_state, act, model_state, k_step
            )
            pred_total_reward += float(np.asarray(reward).reshape(-1)[0])
            latents.append(model_state["latent"])
            beliefs.append(model_state["belief"])

        # decode all imagined frames in one batched program
        pred_imgs = self.planet.render(
            snapshot_state, jnp.concatenate(latents), jnp.concatenate(beliefs)
        )

        print(
            f"True total reward: {true_total_reward}. "
            f"Predicted total reward: {pred_total_reward}"
        )

        frames = []
        for idx in range(min(self.lookahead, len(true_obs))):
            true_img = true_obs[idx]
            if true_img.ndim == 3 and true_img.shape[0] in (1, 3):  # CHW -> HWC
                true_img = true_img.transpose(1, 2, 0)
            true_img = true_img.astype(np.uint8)
            pred_img = pred_imgs[idx]
            if pred_img.shape != true_img.shape:
                # a decoder whose deconv stack doesn't land exactly on the env
                # frame size (possible with custom decoder_config) — crop/pad to
                # the true frame so the side-by-side still renders
                canvas = np.zeros_like(true_img)
                h = min(pred_img.shape[0], true_img.shape[0])
                w = min(pred_img.shape[1], true_img.shape[1])
                c = min(pred_img.shape[2], true_img.shape[2])
                canvas[:h, :w, :c] = pred_img[:h, :w, :c]
                pred_img = canvas
            frames.append(np.concatenate([pred_img, true_img], axis=1))

        out = (
            self.vis_dir
            / f"visualization_{self.start_step}_{self.lookahead}_{self.seed}.gif"
        )
        try:
            import imageio

            imageio.mimsave(str(out), frames, fps=10)
        except Exception:
            np.savez_compressed(str(out) + ".npz", frames=np.stack(frames))
        print(f"Saved visualization to {out}")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--model_dir",
        type=str,
        required=True,
        help="The directory where the PlaNet run was saved.",
    )
    parser.add_argument("--lookahead", type=int, default=50)
    parser.add_argument("--start_step", type=int, default=0)
    parser.add_argument("--seed", type=int, default=1234)
    args = parser.parse_args()
    PlanetVisualizer(
        args.start_step, args.lookahead, args.model_dir, seed=args.seed
    ).run()
