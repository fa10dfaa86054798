from .math import (
    gaussian_nll,
    powerlaw_psd_gaussian,
    propagate,
    propagate_expectation,
    propagate_fixed_model,
    propagate_from_indices,
    propagate_random_model,
    quantize_obs,
    truncated_linear,
    truncated_normal,
    truncated_normal_init,
)
from .normalizer import NormalizerState, denormalize, init_normalizer, normalize, update_stats

__all__ = [
    "gaussian_nll",
    "powerlaw_psd_gaussian",
    "propagate",
    "propagate_expectation",
    "propagate_fixed_model",
    "propagate_from_indices",
    "propagate_random_model",
    "quantize_obs",
    "truncated_linear",
    "truncated_normal",
    "truncated_normal_init",
    "NormalizerState",
    "init_normalizer",
    "normalize",
    "denormalize",
    "update_stats",
]
