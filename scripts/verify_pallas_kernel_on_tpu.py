"""On-chip verification of the fused ensemble-MLP + Gaussian-sampling kernel
(mbrl_tpu/ops/pallas_kernels.py:fused_ensemble_mlp_gaussian).

Checks, on real TPU hardware (the interpret-mode tests in tests/test_pallas.py
cover the mean path; the hardware PRNG needs the chip):
  1. mean path (sample=False) matches the einsum reference;
  2. sampled draws are N(mean, exp(logvar)) elementwise (moment test);
  3. samples are uncorrelated across members, tiles, and steps (seed words).

Usage: python scripts/verify_pallas_kernel_on_tpu.py
"""
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from mbrl_tpu.ops.pallas_kernels import fused_ensemble_mlp_gaussian  # noqa: E402


def main() -> None:
    assert jax.devices()[0].platform == "tpu", "needs a TPU"
    E, S, IN, HID, OUT = 5, 1600, 23, 200, 18
    ks = jax.random.split(jax.random.PRNGKey(0), 12)
    ws = (
        0.1 * jax.random.normal(ks[0], (E, IN, HID)),
        0.1 * jax.random.normal(ks[1], (E, HID, HID)),
        0.1 * jax.random.normal(ks[2], (E, HID, HID)),
    )
    bs = (
        0.1 * jax.random.normal(ks[3], (E, 1, HID)),
        0.1 * jax.random.normal(ks[4], (E, 1, HID)),
        0.1 * jax.random.normal(ks[5], (E, 1, HID)),
    )
    hw = 0.1 * jax.random.normal(ks[6], (E, HID, 2 * OUT))
    hb = 0.1 * jax.random.normal(ks[7], (E, 1, 2 * OUT))
    maxlv, minlv = 0.5 * jnp.ones((1, OUT)), -10.0 * jnp.ones((1, OUT))
    x = jax.random.normal(ks[8], (E, S, IN))

    h = x
    for w, b in zip(ws, bs):
        h = jax.nn.silu(jnp.einsum("ebi,eio->ebo", h, w) + b)
    out = jnp.einsum("ebi,eio->ebo", h, hw) + hb
    mean_r = out[..., :OUT]
    logvar = out[..., OUT:]
    logvar = maxlv - jax.nn.softplus(maxlv - logvar)
    logvar = minlv + jax.nn.softplus(logvar - minlv)
    std_r = np.exp(0.5 * np.asarray(logvar))

    seed0 = jnp.array([1234, 5678], jnp.int32)
    mean_k = fused_ensemble_mlp_gaussian(
        seed0, x, ws, bs, hw, hb, maxlv, minlv, out_size=OUT, tile=800,
        sample=False,
    )
    err = float(jnp.max(jnp.abs(mean_k - mean_r)))
    print(f"mean path max err: {err:.2e}")
    # the einsum reference itself runs at default TPU matmul precision, so the
    # two paths differ by MXU accumulation order / input rounding (~1e-4 rel)
    assert err < 5e-3, err

    N = 200
    seeds = jax.lax.bitcast_convert_type(
        jax.random.bits(jax.random.PRNGKey(7), (N, 2), dtype=jnp.uint32), jnp.int32
    )
    samples = np.stack(
        [
            np.asarray(
                fused_ensemble_mlp_gaussian(
                    seeds[i], x, ws, bs, hw, hb, maxlv, minlv, out_size=OUT,
                    tile=800, sample=True,
                )
            )
            for i in range(N)
        ]
    )
    bias = float(np.abs((samples.mean(0) - np.asarray(mean_r)) / std_r).mean())
    ratio = samples.std(0) / std_r
    print(f"normalized mean bias: {bias:.4f} (expect ~{1/np.sqrt(N):.3f})")
    print(f"std ratio: {ratio.mean():.4f} +/- {ratio.std():.4f} (expect ~1)")
    assert bias < 3.0 / np.sqrt(N)
    assert abs(float(ratio.mean()) - 1.0) < 0.05

    corr_member = np.corrcoef(samples[:, 0, 0, 0], samples[:, 1, 0, 0])[0, 1]
    corr_tile = np.corrcoef(samples[:, 0, 0, 0], samples[:, 0, 800, 0])[0, 1]
    corr_step = np.corrcoef(samples[:-1, 0, 0, 0], samples[1:, 0, 0, 0])[0, 1]
    print(
        f"cross-member corr {corr_member:+.3f}, cross-tile {corr_tile:+.3f}, "
        f"cross-step {corr_step:+.3f} (all expect ~0)"
    )
    for c in (corr_member, corr_tile, corr_step):
        assert abs(c) < 0.25
    print("OK")


if __name__ == "__main__":
    main()
