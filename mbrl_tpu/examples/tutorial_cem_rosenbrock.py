"""Tutorial: the CEM optimizer on the (negated) Rosenbrock function.

Script-form equivalent of the reference's ``notebooks/cem_rosenbrock_ex.ipynb``:
run ``CEMOptimizer`` standalone on an arbitrary objective (no model, no env) and
plot per-iteration population statistics. This is BASELINE.md parity config #2.

Run: ``python -m mbrl_tpu.examples.tutorial_cem_rosenbrock [--iterations 100]``
"""
from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from mbrl_tpu.planning import CEMOptimizer


def neg_rosenbrock(x_array: jax.Array, a: float = 1.0, b: float = 100.0) -> jax.Array:
    """Negated Rosenbrock on pairs of coordinates; maximum 0 at (1, 1, ...).

    ``x_array``: population shaped (P, H, D) with H*D even; returns (P,) values.
    """
    flat = x_array.reshape(x_array.shape[0], -1)
    x = flat[:, 0::2]
    y = flat[:, 1::2]
    return -(jnp.square(a - x) + b * jnp.square(y - jnp.square(x))).sum(axis=-1)


def main(
    iterations: int = 100,
    population_size: int = 500,
    elite_ratio: float = 0.1,
    seed: int = 0,
    plot: bool = False,
) -> float:
    lb = [[-2.0, -2.0]]
    ub = [[2.0, 2.0]]
    opt = CEMOptimizer(
        num_iterations=iterations,
        elite_ratio=elite_ratio,
        population_size=population_size,
        lower_bound=lb,
        upper_bound=ub,
        alpha=0.1,
    )

    # per-iteration population stats via the optimizer callback
    max_values: list = []
    mean_values: list = []

    def callback(population, values, iteration):
        max_values.append(float(np.asarray(values).max()))
        mean_values.append(float(np.asarray(values).mean()))

    x0 = jnp.zeros((1, 2))
    best, _ = opt.optimize(
        neg_rosenbrock, x0, jax.random.PRNGKey(seed), callback=callback
    )
    best = np.asarray(best).reshape(-1)
    best_value = float(neg_rosenbrock(jnp.asarray(best).reshape(1, 1, 2))[0])
    print(f"best x = {best}, objective = {best_value:.5f} (optimum 0 at [1, 1])")

    if plot:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        plt.figure(figsize=(12, 8))
        plt.plot(max_values, label="Current iter. max")
        plt.plot(mean_values, label="Current iter. mean")
        plt.axhline(best_value, color="k", ls="-.", label="Historic max")
        plt.axhline(0.0, color="r", ls="--", label="Optimal value")
        plt.xlabel("CEM iteration")
        plt.ylabel("objective")
        plt.legend()
        plt.savefig("cem_rosenbrock.png", bbox_inches="tight")
        print("saved cem_rosenbrock.png")

    return best_value


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--iterations", type=int, default=100)
    parser.add_argument("--population_size", type=int, default=500)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--plot", action="store_true")
    args = parser.parse_args()
    main(args.iterations, args.population_size, seed=args.seed, plot=args.plot)
