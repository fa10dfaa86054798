"""Benchmark: imagined model-rollout throughput (the PETS planning hot loop).

Measures transitions/s through the full ModelEnv rollout path — normalize, 7-member
ensemble forward, propagation gather, Gaussian sample, reward+termination — on
HalfCheetah-sized shapes (population 400 x 20 particles x horizon 30, matching
conf/overrides/pets_halfcheetah.yaml: CEM pop 400, num_particles 20, horizon 30).

Baseline is the same computation implemented with torch on CPU (the reference is a
CPU/GPU PyTorch library; this container has CPU torch). Prints ONE JSON line.
"""
from __future__ import annotations

import json
import time

import numpy as np

POPULATION = 400
PARTICLES = 20
HORIZON = 30
OBS_DIM = 17
ACT_DIM = 6
ENSEMBLE = 7
HID = 200
LAYERS = 4
BATCH = POPULATION * PARTICLES
TRANSITIONS_PER_PLAN = BATCH * HORIZON


def bench_jax() -> dict:
    import jax
    import jax.numpy as jnp

    from mbrl_tpu.models import GaussianMLP, ModelEnv, TransitionRewardModel

    model = GaussianMLP(
        in_size=OBS_DIM + ACT_DIM,
        out_size=OBS_DIM + 1,
        num_layers=LAYERS,
        ensemble_size=ENSEMBLE,
        hid_size=HID,
        activation="silu",
        propagation_method="random_model",
    )
    wrapper = TransitionRewardModel(
        model, target_is_delta=True, normalize=True, learned_rewards=True,
        num_elites=5,
    )
    state = wrapper.init(jax.random.PRNGKey(0))
    # 5-elite subsetting as in conf/overrides/pets_halfcheetah.yaml (num_elites: 5);
    # also enables the equal-shard propagation fast path (8000 % 5 == 0)
    state = wrapper.set_elite(state, [0, 1, 2, 3, 4])

    def term_fn(act, next_obs):
        return jnp.zeros((next_obs.shape[0], 1), dtype=bool)

    env = ModelEnv(wrapper, term_fn)

    seqs = jnp.zeros((POPULATION, HORIZON, ACT_DIM), jnp.float32)
    obs0 = jnp.zeros((OBS_DIM,), jnp.float32)
    key = jax.random.PRNGKey(1)

    # compile (can take minutes through a remote-compile tunnel)
    float(
        env.evaluate_action_sequences(
            state, seqs, obs0, key, num_particles=PARTICLES
        ).sum()
    )

    # timing with host materialization each iteration: async-dispatch backends can
    # otherwise report enqueue time instead of execution time
    n_plans = 20
    start = time.perf_counter()
    for i in range(n_plans):
        key = jax.random.fold_in(key, i)
        vals = env.evaluate_action_sequences(
            state, seqs, obs0, key, num_particles=PARTICLES
        )
        float(vals.sum())
    elapsed = time.perf_counter() - start
    steps_per_s = n_plans * TRANSITIONS_PER_PLAN / elapsed
    return {"steps_per_s": steps_per_s, "plans_per_s": n_plans / elapsed}


def bench_torch_cpu() -> float:
    """Reference-equivalent rollout on CPU torch: ensemble bmm forward per horizon
    step with Gaussian sampling and random-member propagation."""
    import torch

    torch.manual_seed(0)
    ws = [torch.randn(ENSEMBLE, OBS_DIM + ACT_DIM, HID) * 0.05]
    bs = [torch.zeros(ENSEMBLE, 1, HID)]
    for _ in range(LAYERS - 1):
        ws.append(torch.randn(ENSEMBLE, HID, HID) * 0.05)
        bs.append(torch.zeros(ENSEMBLE, 1, HID))
    w_out = torch.randn(ENSEMBLE, HID, 2 * (OBS_DIM + 1)) * 0.05
    b_out = torch.zeros(ENSEMBLE, 1, 2 * (OBS_DIM + 1))

    obs = torch.zeros(BATCH, OBS_DIM)
    n_plans = 2
    with torch.no_grad():
        start = time.perf_counter()
        for _ in range(n_plans):
            for t in range(HORIZON):
                x = torch.cat([obs, torch.zeros(BATCH, ACT_DIM)], dim=1)
                h = x.unsqueeze(0).expand(ENSEMBLE, BATCH, OBS_DIM + ACT_DIM)
                for w, b in zip(ws, bs):
                    h = torch.nn.functional.silu(h.matmul(w) + b)
                out = h.matmul(w_out) + b_out
                mean, logvar = out.chunk(2, dim=-1)
                idx = torch.randint(ENSEMBLE, (BATCH,))
                mean = mean[idx, torch.arange(BATCH)]
                logvar = logvar[idx, torch.arange(BATCH)]
                sample = torch.normal(mean, torch.exp(0.5 * logvar))
                obs = sample[:, :-1]
        elapsed = time.perf_counter() - start
    return n_plans * TRANSITIONS_PER_PLAN / elapsed


def main() -> None:
    jax_res = bench_jax()
    torch_steps = bench_torch_cpu()
    result = {
        "metric": "imagined_rollout_steps_per_s",
        "value": round(jax_res["steps_per_s"]),
        "unit": "transitions/s",
        "vs_baseline": round(jax_res["steps_per_s"] / torch_steps, 2),
        "extra": {
            "plans_per_s": round(jax_res["plans_per_s"], 3),
            "torch_cpu_baseline_steps_per_s": round(torch_steps),
            "config": f"pop{POPULATION}x{PARTICLES}p_h{HORIZON}_E{ENSEMBLE}",
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
