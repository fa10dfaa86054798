"""Functional conv encoder/decoder for pixel observation models.

Capability parity with the reference ``mbrl/models/util.py`` (Conv2dEncoder:101-157
— conv stack + linear head, identity when sizes match; Conv2dDecoder:162-212 —
linear + deconv stack, no activation on the last layer). Implemented as pure
init/apply functions over NCHW arrays with `lax.conv_general_dilated` /
`lax.conv_transpose` (VALID padding matches torch's default padding=0).
"""
from __future__ import annotations

import math
from typing import Any, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_DN = ("NCHW", "OIHW", "NCHW")


def _xavier_uniform(key, shape, fan_in, fan_out):
    bound = math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, minval=-bound, maxval=bound)


def _conv_init(key, in_ch, out_ch, k):
    fan_in = in_ch * k * k
    fan_out = out_ch * k * k
    return {
        "w": _xavier_uniform(key, (out_ch, in_ch, k, k), fan_in, fan_out),
        "b": jnp.zeros((out_ch,)),
    }


def _linear_init(key, in_f, out_f):
    return {
        "w": _xavier_uniform(key, (in_f, out_f), in_f, out_f),
        "b": jnp.zeros((out_f,)),
    }


def conv_output_shape(image_shape: Tuple[int, int], layers_config) -> Tuple[int, int, int]:
    h, w = image_shape
    out_ch = layers_config[0][0]
    for in_ch, out_ch, k, s in layers_config:
        h = (h - k) // s + 1
        w = (w - k) // s + 1
    return out_ch, h, w


class Conv2dEncoder:
    """Conv stack + linear head (identity when flattened size == encoding_size)."""

    def __init__(
        self,
        layers_config: Sequence[Tuple[int, int, int, int]],
        image_shape: Tuple[int, int],
        encoding_size: int,
        activation=jax.nn.relu,
    ):
        self.layers_config = [tuple(c) for c in layers_config]
        self.image_shape = tuple(image_shape)
        self.encoding_size = encoding_size
        self.activation = activation
        c, h, w = conv_output_shape(self.image_shape, self.layers_config)
        self.cnn_out_size = c * h * w
        self.identity_head = self.cnn_out_size == encoding_size

    def init(self, key) -> Dict[str, Any]:
        keys = jax.random.split(key, len(self.layers_config) + 1)
        convs = [
            _conv_init(keys[i], in_ch, out_ch, k)
            for i, (in_ch, out_ch, k, s) in enumerate(self.layers_config)
        ]
        params: Dict[str, Any] = {"convs": convs}
        if not self.identity_head:
            params["fc"] = _linear_init(keys[-1], self.cnn_out_size, self.encoding_size)
        return params

    def apply(self, params, obs: jax.Array) -> jax.Array:
        """obs: (B, C, H, W) -> (B, encoding_size)."""
        h = obs
        for layer, (_, _, k, s) in zip(params["convs"], self.layers_config):
            h = jax.lax.conv_general_dilated(
                h, layer["w"], (s, s), "VALID", dimension_numbers=_DN
            )
            h = self.activation(h + layer["b"][None, :, None, None])
        h = h.reshape(h.shape[0], -1)
        if not self.identity_head:
            h = h @ params["fc"]["w"] + params["fc"]["b"]
        return h


class Conv2dDecoder:
    """Linear layer + deconv stack; activation on all but the last deconv."""

    def __init__(
        self,
        encoding_size: int,
        deconv_input_shape: Tuple[int, int, int],
        layers_config: Sequence[Tuple[int, int, int, int]],
        activation=jax.nn.relu,
    ):
        self.encoding_size = encoding_size
        self.deconv_input_shape = tuple(deconv_input_shape)
        self.layers_config = [tuple(c) for c in layers_config]
        self.activation = activation

    def init(self, key) -> Dict[str, Any]:
        keys = jax.random.split(key, len(self.layers_config) + 1)
        fc = _linear_init(keys[-1], self.encoding_size, int(np.prod(self.deconv_input_shape)))
        # torch ConvTranspose2d weight layout: (in_ch, out_ch, kH, kW); with
        # transpose_kernel=True + OIHW spec, jax reads input channels from the O slot
        deconvs = []
        for i, (in_ch, out_ch, k, s) in enumerate(self.layers_config):
            fan_in = in_ch * k * k
            fan_out = out_ch * k * k
            deconvs.append(
                {
                    "w": _xavier_uniform(keys[i], (in_ch, out_ch, k, k), fan_in, fan_out),
                    "b": jnp.zeros((out_ch,)),
                }
            )
        return {"fc": fc, "deconvs": deconvs}

    def apply(self, params, x: jax.Array) -> jax.Array:
        """x: (B, encoding_size) -> (B, C_out, H, W)."""
        h = x @ params["fc"]["w"] + params["fc"]["b"]
        h = h.reshape(-1, *self.deconv_input_shape)
        n = len(self.layers_config)
        for i, (layer, (in_ch, out_ch, k, s)) in enumerate(
            zip(params["deconvs"], self.layers_config)
        ):
            # torch ConvTranspose2d(in, out, k, stride=s): out_hw = (in_hw-1)*s + k.
            # lax.conv_transpose with VALID padding matches; kernel is OIHW with
            # O=in, I=out under transpose semantics, so flip to torch layout.
            h = jax.lax.conv_transpose(
                h,
                layer["w"],
                (s, s),
                "VALID",
                dimension_numbers=_DN,
                transpose_kernel=True,
            )
            h = h + layer["b"][None, :, None, None]
            if i < n - 1:
                h = self.activation(h)
        return h
