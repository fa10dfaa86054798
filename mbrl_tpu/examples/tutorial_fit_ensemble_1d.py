"""Tutorial: fit a GaussianMLP ensemble to a noisy 1-D function.

Script-form equivalent of the reference's ``notebooks/fit_gaussian_mlp_ensemble_1d.ipynb``:
train a 5-member probabilistic ensemble on y = sin(x) with input-dependent noise and
separate the epistemic uncertainty (variance of member means, shrinks with data) from
the aleatoric uncertainty (predicted variance, tracks the injected noise level).

Run: ``python -m mbrl_tpu.examples.tutorial_fit_ensemble_1d [--epochs 500]``
"""
from __future__ import annotations

import argparse

import jax
import numpy as np

from mbrl_tpu.models import GaussianMLP, ModelTrainer, TransitionRewardModel
from mbrl_tpu.util.replay_buffer import ReplayBuffer
from mbrl_tpu.util.common import get_basic_buffer_iterators


def make_data(rng: np.random.Generator, train_size: int = 2000, val_size: int = 200):
    """sin(x) on [-12, 12]; half the samples with sigma=0.05 noise on x<0, half with
    sigma=0.20 on x>0 (the notebook's heteroscedastic setup)."""

    def sample(n, lo, hi, sigma):
        x = rng.uniform(lo, hi, size=n)
        y = np.sin(x) + sigma * rng.standard_normal(n)
        return x, y

    x1, y1 = sample(train_size, -12.0, 0.0, 0.05)
    x2, y2 = sample(train_size, 0.0, 12.0, 0.20)
    xv1, yv1 = sample(val_size, -12.0, 0.0, 0.05)
    xv2, yv2 = sample(val_size, 0.0, 12.0, 0.20)
    return (
        np.concatenate([x1, x2]),
        np.concatenate([y1, y2]),
        np.concatenate([xv1, xv2]),
        np.concatenate([yv1, yv2]),
    )


def main(num_epochs: int = 500, seed: int = 0, plot: bool = False) -> float:
    rng = np.random.default_rng(seed)
    x_train, y_train, x_val, y_val = make_data(rng)

    # The model is trained as a "dynamics" model obs->next_obs with a 1-D obs and
    # 0-D action: store (x, y) pairs in a replay buffer with target_is_delta=False.
    buffer = ReplayBuffer(
        len(x_train) + len(x_val), obs_shape=(1,), action_shape=(0,), rng=rng
    )
    for x, y in zip(x_train, y_train):
        buffer.add(np.array([x]), np.zeros(0), np.array([y]), 0.0, False, False)
    for x, y in zip(x_val, y_val):
        buffer.add(np.array([x]), np.zeros(0), np.array([y]), 0.0, False, False)

    num_members = 5
    model = GaussianMLP(
        in_size=1,
        out_size=1,
        num_layers=3,
        ensemble_size=num_members,
        hid_size=64,
        activation="silu",
    )
    wrapper = TransitionRewardModel(
        model, target_is_delta=False, normalize=True, learned_rewards=False
    )
    state = wrapper.init(jax.random.PRNGKey(seed))
    state = wrapper.update_normalizer(state, buffer.get_all())

    train_iter, val_iter = get_basic_buffer_iterators(
        buffer,
        batch_size=256,
        val_ratio=len(x_val) / (len(x_train) + len(x_val)),
        ensemble_size=num_members,
        shuffle_each_epoch=True,
    )
    trainer = ModelTrainer(wrapper, optim_lr=1e-3, weight_decay=5e-5)
    state, train_losses, val_scores = trainer.train(
        state, train_iter, val_iter, num_epochs=num_epochs, patience=100
    )
    print(
        f"final train loss {train_losses[-1]:.4f}, "
        f"best val score {np.asarray(val_scores).min():.5f}"
    )

    # predict over the full range; epistemic = var of member means, aleatoric =
    # mean predicted variance
    import jax.numpy as jnp
    from mbrl_tpu.ops.normalizer import normalize

    x_all = np.linspace(-12, 12, 1000, dtype=np.float32)[:, None]
    x_norm = normalize(state["normalizer"], jnp.asarray(x_all))
    mean, logvar = model.forward(state["params"], x_norm)
    mean = np.asarray(mean)[..., 0]
    var_epistemic = mean.var(axis=0)
    var_aleatoric = np.exp(np.asarray(logvar))[..., 0].mean(axis=0)
    pred = mean.mean(axis=0)

    rmse = float(np.sqrt(np.mean((pred - np.sin(x_all[:, 0])) ** 2)))
    left = var_aleatoric[x_all[:, 0] < 0].mean()
    right = var_aleatoric[x_all[:, 0] > 0].mean()
    print(
        f"RMSE vs sin(x): {rmse:.4f} | aleatoric var left {left:.4f} "
        f"vs right {right:.4f} (injected 0.0025 vs 0.04)"
    )

    if plot:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        std = np.sqrt(var_epistemic + var_aleatoric)
        plt.figure(figsize=(16, 8))
        plt.plot(x_all[:, 0], np.sin(x_all[:, 0]), "k", label="sin(x)")
        plt.plot(x_all[:, 0], pred, "r", label="ensemble mean")
        plt.fill_between(
            x_all[:, 0], pred - 2 * std, pred + 2 * std, alpha=0.2, label="±2 std"
        )
        plt.scatter(x_train[::20], y_train[::20], s=4, alpha=0.3, label="train data")
        plt.legend()
        plt.savefig("fit_ensemble_1d.png", bbox_inches="tight")
        print("saved fit_ensemble_1d.png")

    return rmse


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--epochs", type=int, default=500)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--plot", action="store_true")
    args = parser.parse_args()
    main(args.epochs, args.seed, plot=args.plot)
