"""Decompose the imagined-rollout step time on the real chip (VERDICT r2 #3:
"11.5% MFU with no roofline argument" / "make the Pallas kernel win or retire
it"). Measures amortized transitions/s for controlled variants:

  A. einsum path, stochastic (threefry sampling)   — the shipping default
  B. einsum path, deterministic (no sampling)      — isolates sampling cost
  C. einsum path, stochastic, rbg PRNG keys        — cheap-sampling candidate
  D. pallas fused kernel, f32 weights              — round-2 negative result
  E. pallas fused kernel, bf16 weights             — halved weight DMA
  F. einsum path, bf16 compute                     — MXU-rate reference

Each variant runs K=32 plans scanned in ONE program (tunnel-amortized).
"""
import os
import sys
import json
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from bench import (
    POPULATION, PARTICLES, HORIZON, OBS_DIM, ACT_DIM, ENSEMBLE, HID, LAYERS,
    TRANSITIONS_PER_PLAN,
)
from mbrl_tpu.models import GaussianMLP, ModelEnv, TransitionRewardModel

K = 32


def build(use_pallas=False, deterministic=False, compute_dtype="float32"):
    model = GaussianMLP(
        in_size=OBS_DIM + ACT_DIM, out_size=OBS_DIM + 1, num_layers=LAYERS,
        ensemble_size=ENSEMBLE, hid_size=HID, activation="silu",
        propagation_method="random_model", rollout_shuffle="rotate",
        use_pallas=use_pallas, deterministic=deterministic,
        compute_dtype=compute_dtype,
    )
    wrapper = TransitionRewardModel(
        model, target_is_delta=True, normalize=True, learned_rewards=True,
        num_elites=5,
    )
    state = wrapper.init(jax.random.PRNGKey(0))
    state = wrapper.set_elite(state, [0, 1, 2, 3, 4])

    def term_fn(act, next_obs):
        return jnp.zeros((next_obs.shape[0], 1), dtype=bool)

    env = ModelEnv(wrapper, term_fn)
    seqs = jnp.zeros((POPULATION, HORIZON, ACT_DIM), jnp.float32)
    obs0 = jnp.zeros((OBS_DIM,), jnp.float32)
    return env, state, seqs, obs0


def measure(name, env, state, seqs, obs0, key):
    @jax.jit
    def many_plans(state, keys):
        def one(carry, k):
            v = env._evaluate_impl(state, seqs, obs0, k, num_particles=PARTICLES)
            return carry + v.sum(), None

        total, _ = jax.lax.scan(one, 0.0, keys)
        return total

    keys = jax.random.split(key, K)
    t0 = time.perf_counter()
    float(many_plans(state, keys))  # compile
    compile_s = time.perf_counter() - t0
    times = []
    for i in range(3):
        ks = jax.random.split(jax.random.fold_in(key, i), K)
        start = time.perf_counter()
        float(many_plans(state, ks))
        times.append(time.perf_counter() - start)
    rate = K * TRANSITIONS_PER_PLAN / min(times)
    print(json.dumps({"variant": name, "steps_per_s": round(rate),
                      "compile_s": round(compile_s, 1)}), flush=True)
    return rate


def main():
    which = set(sys.argv[1:]) or {"A", "B", "C", "D", "E", "F"}
    key = jax.random.PRNGKey(1)
    if "A" in which:
        measure("A_einsum_threefry", *build(), key)
    if "B" in which:
        measure("B_einsum_nosample", *build(deterministic=True), key)
    if "C" in which:
        env, state, seqs, obs0 = build()
        rbg_key = jax.random.key(1, impl="rbg")
        measure("C_einsum_rbg", env, state, seqs, obs0, rbg_key)
    if "D" in which:
        measure("D_pallas_f32", *build(use_pallas=True), key)
    if "E" in which:
        measure(
            "E_pallas_bf16", *build(use_pallas=True, compute_dtype="bfloat16"), key
        )
    if "F" in which:
        measure("F_einsum_bf16", *build(compute_dtype="bfloat16"), key)


if __name__ == "__main__":
    main()
