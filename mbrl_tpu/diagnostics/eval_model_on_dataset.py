"""DatasetEvaluator: ground-truth-vs-prediction scatter plots per output dimension.

Capability parity with the reference ``mbrl/diagnostics/eval_model_on_dataset.py``
(DatasetEvaluator:17-125): loads a saved model + replay buffer from a results dir,
runs the model over the whole dataset, and saves one scatter plot (truth vs each
ensemble member's prediction) per output dimension.
"""
from __future__ import annotations

import argparse
import pathlib

import jax.numpy as jnp
import numpy as np

from mbrl_tpu.diagnostics.common import load_experiment
from mbrl_tpu.util.replay_buffer import TransitionIterator


class DatasetEvaluator:
    def __init__(self, model_dir: str, dataset_dir: str, output_dir: str):
        self.model_path = pathlib.Path(model_dir)
        self.output_path = pathlib.Path(output_dir)
        self.output_path.mkdir(parents=True, exist_ok=True)

        cfg, env, self.dynamics_model, self.model_state, _, *_ = load_experiment(
            model_dir, load_buffer=False
        )
        self.cfg = cfg
        from mbrl_tpu.util import common as util_common

        self.replay_buffer = util_common.create_replay_buffer(
            cfg, env.observation_space.shape, env.action_space.shape,
            load_dir=dataset_dir,
        )

    def plot_dataset_results(self, dataset: TransitionIterator) -> None:
        import matplotlib.pyplot as plt

        all_means = []
        all_targets = []
        for batch in dataset:
            model_in, target = self.dynamics_model.process_batch(
                self.model_state, batch.as_jnp()
            )
            mean, _ = self.dynamics_model.model.forward(
                self.model_state["params"], model_in
            )
            all_means.append(np.asarray(mean))  # (E, B, out)
            all_targets.append(np.asarray(target))
        means = np.concatenate(all_means, axis=1)
        targets = np.concatenate(all_targets, axis=0)

        num_dims = targets.shape[-1]
        for dim in range(num_dims):
            sort_idx = np.argsort(targets[:, dim])
            truth = targets[sort_idx, dim]
            fig, ax = plt.subplots(figsize=(8, 6))
            ax.plot(truth, truth, "k--", linewidth=1, label="truth")
            for e in range(means.shape[0]):
                ax.plot(
                    truth, means[e, sort_idx, dim], ".", markersize=2,
                    alpha=0.5, label=f"member {e}",
                )
            ax.set_title(f"Output dimension {dim}")
            ax.legend(markerscale=4, fontsize=7)
            fig.savefig(self.output_path / f"pred_dim{dim}.png", dpi=120)
            plt.close(fig)

    def run(self) -> None:
        batch_size = 32
        dataset, _ = __import__(
            "mbrl_tpu.util.common", fromlist=["get_basic_buffer_iterators"]
        ).get_basic_buffer_iterators(
            self.replay_buffer, batch_size, 0, ensemble_size=1, shuffle_each_epoch=False
        )
        dataset.toggle_bootstrap()
        self.plot_dataset_results(dataset)


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--model_dir", type=str, required=True)
    parser.add_argument("--dataset_dir", type=str, default=None)
    parser.add_argument("--results_dir", type=str, default=None)
    args = parser.parse_args()
    evaluator = DatasetEvaluator(
        args.model_dir,
        args.dataset_dir or args.model_dir,
        args.results_dir or (args.model_dir + "/diagnostics"),
    )
    evaluator.run()
